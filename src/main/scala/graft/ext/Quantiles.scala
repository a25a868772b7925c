package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed order statistics via one-level histogram
  * refinement — the classic two-pass quantile algorithm (Munro-Paterson
  * lineage): pass 1 builds a `buckets`-bin equal-width histogram of the
  * integer value domain (constant-size state, map-side combined — the
  * same shape as the HLL/CMS sketches); the cumulative walk over the
  * ≤`buckets`-row histogram locates, for each requested rank, the ONE
  * bin containing it; pass 2 ranks only inside the hit bins (≈ n/buckets
  * rows each — three orders of magnitude below a global sort at the
  * default 1024) and reads off the exact k-th smallest value.
  *
  * Nothing corpus-sized ever sorts globally and the histogram state is
  * constant regardless of row count, so this is the 100 TB form of
  * "give me p1/p50/p99 exactly" — the quantile member of the sketch
  * family (HLL distinct, CMS frequency, KMV overlap, Misra-Gries heavy
  * hitters) with the stronger guarantee the integer domain affords:
  * the answer is EXACT, the histogram only narrows where to look.
  * (At extreme scale the refinement recurses — the per-bin slice is
  * itself histogrammed; one level is the right depth for the gate and
  * the recursion does not change the plan shape.)
  *
  * All-integer arithmetic, oracle-replayable: width = (max−min) DIV
  * buckets + 1 (≥ 1, so bins cover the range), bin = (v−min) DIV width,
  * target rank k = ⌈q·n⌉ = (q_bp·n + 9999) DIV 10000, and the k-th
  * smallest value is rank k − (rows below the bin) within the bin —
  * row_number ties among equal values are unobservable because only
  * the VALUE ships.
  */
object Quantiles {

  val DefaultBuckets = 1024

  /** Exact k-th-smallest values for quantiles `qBp` (basis points) of
    * `valueCol` (cast to long; nulls excluded). Output per quantile:
    * (q_bp, k, bucket, est_lo, est_hi, exact) where [est_lo, est_hi]
    * are the located bin's bounds — the "sketch estimate" the exact
    * refinement tightens to a point. */
  def exactQuantiles(
      df: DataFrame, valueCol: Column, qBp: Seq[Int],
      buckets: Int = DefaultBuckets): DataFrame = {
    require(qBp.nonEmpty && qBp.forall(q => q >= 1 && q <= 10000),
      "quantiles are basis points in [1, 10000]")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(valueCol.cast("long").as("v")).filter(col("v").isNotNull)
    // 1-row domain stats; feeds the bucketing projection AND the rank
    // targets — eager so the scan behind it runs once
    val stats = v.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(lit(1)).as("n")).localCheckpoint(true)
    val bucketOf = expr(s"(v - mn) DIV ((mx - mn) DIV $buckets + 1)")
    val vb = v.crossJoin(broadcast(stats)).select(col("v"), bucketOf.as("b"))
    val hist = vb.groupBy(col("b")).agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true) // ≤ buckets rows; probed twice below
    val spec = qBp.map(_.toLong).toDF("q_bp")
      .crossJoin(broadcast(stats))
      .select(col("q_bp"), expr("(q_bp * n + 9999) DIV 10000").as("k"),
        col("mn"), expr(s"(mx - mn) DIV $buckets + 1").as("w"))
    // the bin containing rank k: min b with cum ≥ k; rows strictly
    // below it: max cum over bins < kb (bins are SPARSE — empty bins
    // are absent — so "the previous row", not "b−1")
    val located = spec
      .join(broadcast(cum), col("cum") >= col("k"))
      .groupBy(col("q_bp"), col("k"), col("mn"), col("w"))
      .agg(min(col("b")).as("kb"))
    val withBelow = located
      .join(broadcast(cum).select(col("b").as("pb"), col("cum").as("pcum")),
        col("pb") < col("kb"), "left")
      .groupBy(col("q_bp"), col("k"), col("mn"), col("w"), col("kb"))
      .agg(coalesce(max(col("pcum")), lit(0L)).as("count_below"))
      .localCheckpoint(true) // |qBp| rows; joined against the refinement scan
    val wq = Window.partitionBy(col("q_bp")).orderBy(col("v"))
    vb.join(broadcast(withBelow), col("b") === col("kb"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") === col("k") - col("count_below"))
      .select(col("q_bp"), col("k"), col("kb").as("bucket"),
        (col("mn") + col("kb") * col("w")).as("est_lo"),
        (col("mn") + (col("kb") + lit(1L)) * col("w") - lit(1L)).as("est_hi"),
        col("v").as("exact"))
  }
}
