package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Single-pass data profiling — the schema-report side of the
  * reference's upload step (`/root/reference/main.py:99-104` returns
  * rows/columns on ingest) grown into a real quality/profile operator
  * for pipeline-health checks over large tables.
  *
  * One `agg` computes every column's stats in a single scan (Catalyst
  * plans multi-distinct via Expand, still one pass over the files);
  * the per-column rows are then unfolded from the single result row —
  * driver-size data, no second scan. At 100 TB swap `countDistinct`
  * for `approx_count_distinct` (HLL, no Expand multiplier); exact
  * distinct is used here because results are oracle-verified.
  */
object Profiler {

  /** Profile `cols` of `df`: one output row per column with
    * (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    * min_str, max_str) — numeric min/max as double, string min/max as
    * string, the other pair null. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // validate up front: unknown names fail here with the full field
    // list rather than as a confusing unresolved-column analysis error
    val known = df.schema.fieldNames.toSet
    val missing = cols.filterNot(known)
    require(missing.isEmpty,
      s"Profiler.profile: no such column(s) ${missing.mkString(", ")} — " +
        s"available: ${df.schema.fieldNames.mkString(", ")}")
    def isNum(c: String) = df.schema(c).dataType.isInstanceOf[NumericType]
    // input columns are referenced backtick-quoted (names containing
    // dots profile correctly); generated aggregate aliases are
    // index-based (`__p<i>_*`) so they cannot collide with each other
    // regardless of the profiled column names (the agg output carries
    // only these aliases, so input-name collisions are impossible too)
    def in(c: String): Column = col(s"`$c`")
    val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(in(c)).as(s"__p${i}_nn"),
        countDistinct(in(c)).as(s"__p${i}_nd"),
        (if (isNum(c)) min(in(c)).cast("double") else lit(null).cast("double")).as(s"__p${i}_minn"),
        (if (isNum(c)) max(in(c)).cast("double") else lit(null).cast("double")).as(s"__p${i}_maxn"),
        (if (isNum(c)) lit(null).cast("string") else min(in(c)).cast("string")).as(s"__p${i}_mins"),
        (if (isNum(c)) lit(null).cast("string") else max(in(c)).cast("string")).as(s"__p${i}_maxs"))
    }
    val one = df.agg(count(lit(1)).as("__p_total"), aggs: _*)
    one.select(explode(array(cols.zipWithIndex.map { case (c, i) => struct(
        lit(c).as("col_name"),
        col("__p_total").as("n_rows"),
        (col("__p_total") - col(s"__p${i}_nn")).as("n_nulls"),
        col(s"__p${i}_nd").as("n_distinct"),
        col(s"__p${i}_minn").as("min_num"),
        col(s"__p${i}_maxn").as("max_num"),
        col(s"__p${i}_mins").as("min_str"),
        col(s"__p${i}_maxs").as("max_str")) }: _*)).as("p"))
      .select("p.*")
  }
}
