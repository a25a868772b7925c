package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Power-of-two (bit-length) histogram — a DDSketch-style
  * relative-error quantile sketch restricted to integer arithmetic:
  * bucket b holds values in [2^(b−1), 2^b), so any quantile read from
  * the histogram is correct within a factor of 2 (log-scaled buckets =
  * bounded RELATIVE error, what latency/price distributions need).
  * The whole sketch is ≤ 64 counters: mergeable by addition, built by
  * one constant-width aggregation — the fixed-size summary that
  * replaces exact rank arithmetic (q54) when 100 TB won't fit a
  * per-group sort.
  *
  * Engine-exact by construction: bucket = length(bin(v)) (identical
  * string semantics in Spark and DuckDB), counts and the cumulative
  * rank walk are integers. The quantile flag marks the first bucket
  * whose cumulative count reaches ceil(q·n).
  */
object PowerHistogram {

  /** Histogram of a positive integer column: one row per occupied
    * bucket with [lo, hi] value bounds, count, cumulative count, and
    * flags for the p50/p95 buckets. The ranking window runs on the
    * ≤64-row histogram, not the data (its SinglePartition is
    * intentional and justified). */
  def bitLenHistogram(df: DataFrame, value: Column): DataFrame = {
    val hist = df
      .select(length(bin(value)).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("n")).over(w).cast("long"))
      .withColumn("total", sum(col("n")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).cast("long"))
      .select(col("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket - 1 AS INT))").as("lo"),
        (expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))") - 1L).as("hi"),
        col("n"), col("cum"),
        (col("cum") - col("n") < expr("(total * 50 + 99) DIV 100")
          && expr("(total * 50 + 99) DIV 100") <= col("cum")).cast("int").as("is_p50"),
        (col("cum") - col("n") < expr("(total * 95 + 99) DIV 100")
          && expr("(total * 95 + 99) DIV 100") <= col("cum")).cast("int").as("is_p95"))
  }

  /** Per-GROUP bit-length histograms: the grouped twin of
    * [[bitLenHistogram]] (as [[graft.ext.Hll.groupRegisters]] is to the
    * global sketch) — ≤64 counters per group, mergeable by addition,
    * cumulative walk and quantile flags windowed WITHIN each group, so
    * no single-partition stage exists at any group count. */
  def groupedBitLenHistogram(df: DataFrame, grp: Column, value: Column): DataFrame = {
    val hist = df
      .select(grp.as("grp"), length(bin(value)).cast("long").as("bucket"))
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("n")).over(w).cast("long"))
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(col("grp"))).cast("long"))
      .select(col("grp"), col("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket - 1 AS INT))").as("lo"),
        (expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))") - 1L).as("hi"),
        col("n"), col("cum"),
        (col("cum") - col("n") < expr("(total * 50 + 99) DIV 100")
          && expr("(total * 50 + 99) DIV 100") <= col("cum")).cast("int").as("is_p50"),
        (col("cum") - col("n") < expr("(total * 95 + 99) DIV 100")
          && expr("(total * 95 + 99) DIV 100") <= col("cum")).cast("int").as("is_p95"))
  }
}
