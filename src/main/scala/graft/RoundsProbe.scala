package graft

import org.apache.spark.sql.functions._
import graft.ext.{KMeansInt, ProductQuantize, Quantize}

/** Dev diagnostic: print the Lloyd fixed-point depth of every trained
  * (sub)space at a given sf — the number [[KMeansInt.MaxRounds]] must
  * dominate with margin. Usage: runMain graft.RoundsProbe <sfDir> */
object RoundsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = LocalSessions.create(logLevel = "ERROR")
    val codes = Quantize.sq8Codes(Tables.load(spark, dir, "embeddings"), "vec_id", "embedding")
      .localCheckpoint(true)
    val full = KMeansInt.fitConvergedAssign(codes, k = 8, maxRounds = KMeansInt.MaxRounds)
    println(s"[rounds] full-dim k=8: ${full.rounds}")
    (0 until ProductQuantize.NumSub).foreach { m =>
      val sub = codes.select(col("id"),
        slice(col("codes"), m * ProductQuantize.SubDim + 1, ProductQuantize.SubDim).as("codes"))
      val fit = KMeansInt.fitConvergedAssign(sub, k = ProductQuantize.K,
        maxRounds = KMeansInt.MaxRounds)
      println(s"[rounds] pq sub=$m: ${fit.rounds}")
    }
    // IVF-PQ residual subspaces (coarse = the full-dim fit above,
    // shifted-residual construction mirroring ivfPqIndex)
    val carr = full.centroids.groupBy(col("cluster").as("coarse"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
        s => s("m")).as("marr"))
    val resid = codes
      .join(full.assignment.select(col("id"), col("cluster").as("coarse")), "id")
      .join(broadcast(carr), "coarse")
      .select(col("id"),
        zip_with(col("codes"), col("marr"),
          (c, m) => c - m + lit(ProductQuantize.ResidShift)).as("codes"))
      .localCheckpoint(true)
    (0 until ProductQuantize.NumSub).foreach { m =>
      val sub = resid.select(col("id"),
        slice(col("codes"), m * ProductQuantize.SubDim + 1, ProductQuantize.SubDim).as("codes"))
      val fit = KMeansInt.fitConvergedAssign(sub, k = ProductQuantize.K,
        maxRounds = KMeansInt.MaxRounds)
      println(s"[rounds] resid sub=$m: ${fit.rounds}")
    }
    spark.stop()
  }
}
