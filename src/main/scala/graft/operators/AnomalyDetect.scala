package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key sliding-window anomaly scoring — the streaming-monitoring
  * shape (metric drift, fraud spikes) expressed as a keyed window
  * frame: each event is z-scored against the exact moments of its own
  * key's previous `lookback` events. No global state, no sort beyond
  * the per-key window shuffle — at 100 TB this scales exactly like any
  * keyed window (and has a 1:1 Structured Streaming twin via
  * flatMapGroupsWithState carrying the ring buffer).
  *
  * Exactness discipline (ColOps): the trailing sum and sum-of-squares
  * accumulate in DECIMAL inside the frame (order-independent, engine-
  * exact); the z-score is one mirrored double expression over those
  * exact moments, so an external engine replays it bit-for-bit.
  */
object AnomalyDetect {

  /** Adds n_prev / z columns; rows with fewer than `minPrev` trailing
    * events (or a zero-variance window) get z = null.
    *
    * @param orderCols total order within a key (include a unique
    *                  tie-breaker)
    * @param lookback  trailing frame size in events
    */
  def slidingZScore(
      df: DataFrame, keyCol: Column, orderCols: Seq[Column],
      valueCol: Column, lookback: Int, minPrev: Int): DataFrame = {
    val frame = Window.partitionBy(keyCol).orderBy(orderCols: _*)
      .rowsBetween(-lookback, -1)
    val x = ColOps.dec(valueCol)
    val xd = x.cast("double")
    val n = count(x).over(frame).cast("long")
    val s = sum(x).over(frame).cast("double")
    val ss = sum(x * x).over(frame).cast("double")
    val nD = n.cast("double")
    val mean = s / nD
    val varPop = (ss - s * s / nD) / (nD - 1.0)
    val z = when(n >= minPrev && varPop > 0.0,
      round((xd - mean) / sqrt(varPop), 6))
    df.withColumn("n_prev", n).withColumn("z", z)
  }
}
