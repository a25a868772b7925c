package graft
/** Dev helper: Verify restricted to the named queries (fast iteration
  * on new operators — tools/check_oracle.py only checks result dirs
  * that exist). Usage: runMain graft.VerifySome <sfDir> <outDir> <q...> */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = LocalSessions.create()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(f"[verifysome] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Verify.writeOracleJson(outDir, Some(names.toSet))
    spark.stop()
  }
}
