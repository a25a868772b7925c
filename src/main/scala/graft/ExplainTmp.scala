package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-inspection main (dev aid). */
object ExplainTmp {
  def main(args: Array[String]): Unit = {
    val spark = LocalSessions.create(logLevel = "ERROR")
    val name = args.headOption.getOrElse("q21_simhash")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    // time construction too (eager checkpoints/iterative queries run
    // work at build time), but explain BEFORE executing so the plan is
    // visible even when execution fails or hangs
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    df.explain("formatted")
    val t1 = System.nanoTime()
    val rows = df.count()
    val tRun = (System.nanoTime() - t1) / 1e9
    println(s"rows=$rows build=${tBuild}s run=${tRun}s")
    spark.stop()
  }
}
