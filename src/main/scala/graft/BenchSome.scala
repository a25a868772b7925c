package graft

/** Dev aid: time a subset of queries with repetitions in ONE warm JVM —
  * `runMain graft.BenchSome <sfDir> <reps> <q1> <q2> ...` — because
  * one-shot `ExplainTmp` timings are dominated by cold-JVM JIT/codegen
  * noise. Prints per-rep seconds so warmup vs steady-state is visible. */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = LocalSessions.create(logLevel = "ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey").limit(1).count()
    for (name <- names) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHSOME $name%-24s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
