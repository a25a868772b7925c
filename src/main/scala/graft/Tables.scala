package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog façade over the driver's parquet tables (TESTDATA.md).
  *
  * The reference engine holds exactly one in-memory table at a time
  * (`/root/reference/main.py:63-65,106-111`); our engine is a multi-table
  * catalog over columnar files — every load is a lazy
  * `FileSourceScanExec` with pushdown/pruning, so at 100 TB a query
  * touches only the columns+row-groups it needs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read it as raw nanos and derive epoch columns in
      // [[loadEvents]]. Runtime-settable legacy conf.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts` as raw nanos (long) plus derived `sec`/`us` epoch
    * columns — integer floor-division, matching DuckDB's TIMESTAMP_NS →
    * epoch()/epoch_us() truncation. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    load(spark, dir, "events")
      .withColumn("sec", expr("CAST(ts DIV 1000000000 AS BIGINT)"))
      .withColumn("us", expr("CAST(ts DIV 1000 AS BIGINT)"))
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
