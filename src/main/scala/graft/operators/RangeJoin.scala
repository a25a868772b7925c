package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — points matched to [start, end) intervals —
  * composed from built-ins (SURVEY.md §7.3 preference (a)).
  *
  * The naive plan is a non-equi join = nested loop. This bucketizes
  * time: intervals explode onto every `bucketWidth` bucket they touch,
  * points hash to one bucket, and the join becomes an equi-join on
  * (keys..., bucket) followed by the exact range predicate. Each
  * (point, interval) match occurs in exactly the point's bucket, so no
  * dedup is needed. At 100 TB: shuffle cost is linear in points +
  * interval-spans/bucketWidth; pick bucketWidth near the typical
  * interval length so intervals explode to O(1) buckets each.
  */
object RangeJoin {

  /** Join `points` (numeric `pointCol`) to `intervals` rows whose
    * [startCol, endCol) contains the point, matching `keyCols` exactly.
    * Columns from both sides survive (interval cols win name clashes —
    * callers alias beforehand). */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      keyCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    // empty/inverted intervals would make sequence() count DOWN and
    // explode one row per bucket between the endpoints — drop them
    // (they can match nothing anyway)
    val iv = intervals.filter(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(floor(col(startCol) / bucketWidth),
          floor((col(endCol) - 1) / bucketWidth))))
    p.join(iv, keyCols :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
