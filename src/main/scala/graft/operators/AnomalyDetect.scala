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

  /** Robust per-group outlier report — EXACT integer median + MAD
    * (median absolute deviation) per key, the robust twin of the
    * mean/stddev z-score: one extreme value cannot drag the reference
    * the way it drags a mean, so the gate survives the very outliers
    * it hunts. Medians are rank-exact via the grouped cumulative-
    * histogram discipline (per-(key, value) counts — bounded by
    * distinct integer values, not rows; the lower-median threshold
    * cum·2 ≥ n — nothing row-sized sorts), applied twice: once for the
    * median, once over |x − median| for the MAD. A row is an outlier
    * when |x − med| > `k`·MAD (all-integer comparison). Output per
    * key: n, med, mad, n_outliers, max_dev.
    *
    * `e` must carry (key, cents). */
  def robustOutliers(e: DataFrame, k: Int = 5): DataFrame = {
    def lowerMedian(vals: DataFrame, outName: String): DataFrame = {
      val hist = vals.groupBy(col("key"), col("v")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("key")).orderBy(col("v"))
      val cum = hist.withColumn("cumn", sum(col("n")).over(w))
      val tot = hist.groupBy(col("key")).agg(sum(col("n")).as("tot"))
      cum.join(tot, Seq("key"))
        .groupBy(col("key"))
        .agg(min(when(col("cumn") * 2 >= col("tot"), col("v"))).as(outName))
    }
    val rows = e.select(col("key"), col("cents"))
    val med = lowerMedian(rows.select(col("key"), col("cents").as("v")), "med")
    val dev = rows.join(broadcast(med), Seq("key"))
      .withColumn("d", abs(col("cents") - col("med")))
    val mad = lowerMedian(dev.select(col("key"), col("d").as("v")), "mad")
    dev.join(broadcast(mad), Seq("key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med_cents"),
        first(col("mad")).as("mad_cents"),
        count(when(col("d") > col("mad") * k, 1)).as("n_outliers"),
        max(col("d")).as("max_dev"))
  }

  /** One-sided integer CUSUM change-point detection (Page 1954) — the
    * SEQUENTIAL anomaly member beside [[slidingZScore]]: per key, the
    * statistic S_i = max(0, S_{i-1} + x_i − target − slack) over the
    * (us, event_id)-ordered sequence, alarming and RESTARTING when S
    * crosses the threshold. Detects sustained small shifts a per-point
    * z-score never flags. Per-key reference values derive from the
    * key's own exact integer mean (target = Σ div n; slack =
    * target div 20; threshold = 2·target) — all integer, replayable.
    *
    * `e` must carry (user_id, us, event_id, cents). Scale shape: ONE
    * aggregation per key builds (n, Σ, ordered seq) with map-side
    * partials; the fold is a row-local `aggregate` over that key's
    * bounded event list. Keys with unbounded history belong to the
    * streaming form (mapGroupsWithState) — the batch contract is
    * bounded per-key cardinality, like any per-key collect. */
  def cusum(e: DataFrame): DataFrame =
    cusumWithTargets(e,
      e.groupBy(col("user_id")).agg(expr("sum(cents) DIV count(1)").as("target")))

  /** [[cusum]] against EXTERNALLY-trained per-key targets (user_id,
    * target) — the deployment split: targets come from a historical
    * window, the fold runs over fresh data (and is what the streaming
    * twin [[graft.streaming.Streaming.cusumAlarmStream]] replays
    * incrementally). Slack and threshold derive from the target by the
    * same fixed rules as the self-trained form. */
  def cusumWithTargets(e: DataFrame, targets: DataFrame): DataFrame =
    e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col("us"), col("event_id"), col("cents"))))
          .as("seq"))
      .join(targets.select(col("user_id"), col("target")), Seq("user_id"))
      .withColumn("slack", expr("target DIV 20"))
      .withColumn("thresh", expr("target * 2"))
      .withColumn("st", expr("""
        aggregate(seq,
          named_struct('s', 0L, 'maxs', 0L, 'nal', 0L, 'fid', CAST(NULL AS BIGINT)),
          (acc, x) -> named_struct(
            's', IF(greatest(0L, acc.s + x.cents - target - slack) > thresh, 0L,
                    greatest(0L, acc.s + x.cents - target - slack)),
            'maxs', greatest(acc.maxs, greatest(0L, acc.s + x.cents - target - slack)),
            'nal', acc.nal +
              IF(greatest(0L, acc.s + x.cents - target - slack) > thresh, 1L, 0L),
            'fid', coalesce(acc.fid,
              IF(greatest(0L, acc.s + x.cents - target - slack) > thresh,
                 x.event_id, CAST(NULL AS BIGINT)))))"""))
      .select(col("user_id"), col("n_events"), col("target").as("target_cents"),
        col("st.nal").as("n_alarms"), col("st.fid").as("first_alarm_event_id"),
        col("st.maxs").as("max_s"))
}
