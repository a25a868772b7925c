package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Scale-design audit: prints, for every registered query, the plan
  * features that are red flags at 100 TB — single-partition exchanges,
  * cartesian products, broadcast nested-loop joins — so regressions
  * are visible at a glance (`runMain graft.PlanAudit [sfDir]`).
  * Known-justified hits as of round 3: q02/q51 SinglePartition =
  * scalar/single-row final aggregates (partials are map-side; the
  * exchange moves #partitions rows); q22/q32/q56 BNLJ = scan × small
  * broadcast under a non-equi condition (query set / seed set /
  * deduped dimension); q24 BNLJ = the exact all-pairs correctness
  * baseline whose scale path is the LSH variant; q64 SinglePartition +
  * BNLJ = the 64-row dim-min/max final aggregate and its one-row
  * broadcast cross join back onto the corpus; q66 BNLJ = the nClusters-
  * row seed table broadcast-crossed with the query set for probe
  * ranking; q78/q80/q82/q86 SinglePartition + BNLJ = one-row summary
  * aggregates (256 HLL registers / total token count / sketch sums /
  * corpus bigram total) cross-joined back as broadcast scalars; q83
  * SinglePartition = the cumulative walk over the ≤64-row histogram,
  * not the data; q87 BNLJ = the broadcast query set under the
  * label-inequality condition (the q22/q56 class); q91 BNLJ = the
  * groups × 256-bucket register skeleton (constant-size cross join).
  * Anything new deserves a look at the query.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = LocalSessions.create(logLevel = "ERROR")
    val flags = Seq("SinglePartition", "CartesianProduct", "BroadcastNestedLoopJoin")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        val hits = flags.filter(p.contains)
        println(f"[audit] $name%-22s ${if (hits.isEmpty) "clean" else hits.mkString(", ")}")
      } catch {
        case e: Throwable => println(f"[audit] $name%-22s ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
