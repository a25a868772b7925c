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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
