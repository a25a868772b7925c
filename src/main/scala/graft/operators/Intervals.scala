package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union (gaps-and-islands) — merge each key's overlapping
  * [start, end] intervals into maximal islands: an interval starts a
  * new island iff its start exceeds the running max end of everything
  * before it (so contained and touching intervals merge). The
  * utilization / covered-time primitive, distinct from gap
  * sessionization (which splits on inter-EVENT silence, not interval
  * overlap).
  *
  * Scale shape: both windows and the island aggregation partition by
  * the key — no global stage at any key count; all arithmetic is on
  * caller-provided integers (exact, engine-portable).
  */
object Intervals {

  /** One row per (key, island): (key…, island, i_start, i_end,
    * n_events). `ord` must make the per-key order total (include a
    * unique tie-breaker). */
  def islands(df: DataFrame, key: Column, ord: Seq[Column],
      start: Column, end: Column): DataFrame = {
    val wo = Window.partitionBy(key).orderBy(ord: _*)
    df.withColumn("_s", start).withColumn("_e", end)
      .withColumn("_pm",
        max(col("_e")).over(wo.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_ni",
        when(col("_pm").isNull || col("_s") > col("_pm"), 1L).otherwise(0L))
      .withColumn("island", sum(col("_ni")).over(wo))
      .groupBy(key.as("key"), col("island"))
      .agg(min(col("_s")).as("i_start"), max(col("_e")).as("i_end"),
        count(lit(1)).as("n_events"))
  }
}
