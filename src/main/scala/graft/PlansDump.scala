package graft

/** Dev aid (optimization rounds): dump `explain("formatted")` for the
  * named queries into `<outDir>/<name>_<suffix>.txt` in ONE JVM —
  * `runMain graft.PlansDump <sfDir> <outDir> <suffix> <q1> <q2> ...`.
  * Plan construction may execute the eager session caches (the
  * [[PlanAudit.scalarLint]] caveat), so dump order follows the bench's
  * alphabetical order for comparable cache attribution. */
object PlansDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3).toSeq.sorted
    val spark = LocalSessions.create(logLevel = "ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val p = SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), p)
      println(s"[plansdump] $name -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
