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
    def isNum(c: String) = df.schema(c).dataType.isInstanceOf[NumericType]
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        (if (isNum(c)) min(col(c)).cast("double") else lit(null).cast("double")).as(s"${c}__minn"),
        (if (isNum(c)) max(col(c)).cast("double") else lit(null).cast("double")).as(s"${c}__maxn"),
        (if (isNum(c)) lit(null).cast("string") else min(col(c)).cast("string")).as(s"${c}__mins"),
        (if (isNum(c)) lit(null).cast("string") else max(col(c)).cast("string")).as(s"${c}__maxs"))
    }
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__minn").as("min_num"),
        col(s"${c}__maxn").as("max_num"),
        col(s"${c}__mins").as("min_str"),
        col(s"${c}__maxs").as("max_str"))): _*)).as("p"))
      .select("p.*")
  }
}
