package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional layout op behind
  * data skipping on more than one column. Sorting 100 TB by `a` makes
  * min/max pruning on `a` perfect and on `b` useless; sorting by the
  * bit-interleaved z-value makes every stored range narrow in BOTH
  * dimensions, so a predicate on either column prunes ~sqrt of the
  * files instead of none (the layout trick popularized by lakehouse
  * table formats, buildable from pure Spark primitives).
  *
  * The interleave is a 16-step fold of shift/and/or column expressions
  * — whole-stage-codegen'd straight-line long arithmetic, no UDF.
  */
object ZOrder {

  /** Bit-interleave the low 16 bits of two non-negative longs:
    * bit b of `x` lands at position 2b, bit b of `y` at 2b+1.
    * Monotone locality: close (x, y) pairs get close z-values. */
  def interleave16(x: Column, y: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }

  /** Cluster `df` for 2-D skipping: add the z-value and range-partition
    * on it (each output partition covers a compact z-range, hence a
    * small rectangle in (x, y) space — the property [[graft.sources
    * .DataSkipping]] manifests exploit). Write the result partitioned
    * as-is; the sort is within partitions only. */
  def cluster(df: DataFrame, xCol: String, yCol: String, numPartitions: Int): DataFrame =
    df.withColumn("z", interleave16(col(xCol), col(yCol)))
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))
}
