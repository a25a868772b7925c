package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins (SURVEY.md scale checklist: "bucketing for
  * co-located joins"). Writing both fact tables bucketed and sorted by
  * the join key lets Spark plan the join with NO Exchange on either
  * side — at 100 TB that's the difference between re-shuffling petabyte
  * facts on every query and a pure merge read. The shuffle is paid once
  * at layout time, amortized over every downstream join.
  */
object Bucketing {

  /** Persist `df` bucketed+sorted by `keyCol` as a catalog table. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — planned without
    * an Exchange when bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keyLeft: String, keyRight: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(keyLeft) === r(keyRight))
  }
}
