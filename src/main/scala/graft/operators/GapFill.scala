package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling over per-key daily aggregates: densify every
  * key's observed [first, last] day span, zero-count the silent days,
  * keep a running event total, and carry the last observed daily value
  * forward (imputation) — the batch core of q109 and the parity target
  * of [[graft.streaming.Streaming.gapFillStream]].
  *
  * The carry-forward uses the portable two-window trick (count of
  * non-nulls so far defines a group; the group's single non-null is its
  * max) instead of IGNORE NULLS, which not every engine supports.
  *
  * Scale shape: the grid derives from the per-(key, day) AGGREGATE
  * (orders of magnitude smaller than raw events), exploded by
  * `sequence` — never a calendar cross join; every window partitions by
  * key — no global ordering anywhere.
  */
object GapFill {

  /** `daily` must be (user_id, day, n, dv) — one row per OBSERVED
    * (key, day) with its event count and daily value. Returns
    * (user_id, day, n_events, cum_events, carried_v) densified over
    * each key's [min day, max day]. */
  def dailyGapFill(daily: DataFrame): DataFrame = {
    val d = daily.localCheckpoint(false) // feeds the span agg AND the grid join
    val grid = d.groupBy(col("user_id"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("user_id"), explode(sequence(col("mn"), col("mx"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(d, Seq("user_id", "day"), "left")
      .withColumn("grp", count(col("dv")).over(w))
      .withColumn("n0", coalesce(col("n"), lit(0L)))
      .withColumn("cum_events", sum(col("n0")).over(w))
      .withColumn("carried_v",
        max(col("dv")).over(Window.partitionBy(col("user_id"), col("grp"))))
      .select(col("user_id"), col("day"), col("n0").as("n_events"),
        col("cum_events"), col("carried_v"))
  }
}
