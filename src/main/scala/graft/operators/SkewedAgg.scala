package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed keys (SURVEY.md scale
  * checklist). A hot key that would melt one reducer is split across
  * `saltBuckets` partial groups, partially aggregated, then re-combined
  * — correct for any decomposable aggregate (sum/count/min/max).
  *
  * AQE's skew handling covers sort-merge JOINS, not aggregations; for
  * aggregation skew, salting remains the tool. Results are identical to
  * the direct groupBy (the oracle checks q28 against a plain GROUP BY).
  */
object SkewedAgg {

  /** Skewed JOIN: replicate the small side once per salt bucket and
    * salt the big side deterministically, so a hot key's rows spread
    * over `saltBuckets` reducers instead of melting one. Results are
    * identical to the plain join (each big-side row meets exactly one
    * replica of its key's small-side row). Use when AQE's skew-join
    * handling doesn't apply (e.g. broadcast is too big, or the skew is
    * in a non-SMJ plan). */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keyCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** countAndSum per key, salted. `valueCol` should already be exact
    * (decimal) if cross-engine parity matters. */
  def saltedCountSum(
      df: DataFrame, keyCol: String, valueCol: Column,
      saltBuckets: Int = 16): DataFrame = {
    // salt must be deterministic per row content: a nondeterministic
    // expression (monotonically_increasing_id etc.) as a shuffle key can
    // duplicate/lose rows when a stage retry recomputes with different
    // values. Hashing the key + value spreads hot keys with distinct
    // values; identical (key,value) rows co-bucket, which is still
    // correct (just less spread for fully-degenerate duplicates).
    val salted = df
      .withColumn("__salt", pmod(hash(col(keyCol), valueCol), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
    salted.groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))
  }
}
