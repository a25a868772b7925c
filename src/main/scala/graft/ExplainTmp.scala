package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-inspection main (dev aid). */
object ExplainTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("q21_simhash")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    // time construction too: some queries run eager work (checkpoints,
    // iterative algorithms) while building the plan — bench counts it
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    val rows = df.count()
    val total = (System.nanoTime() - t0) / 1e9
    df.explain("formatted")
    println(s"rows=$rows in ${total}s (incl. plan construction)")
    spark.stop()
  }
}
