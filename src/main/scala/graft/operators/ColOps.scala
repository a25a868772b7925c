package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level helpers shared by all queries.
  *
  * Exact-arithmetic discipline: the driver hash-compares our results
  * against DuckDB, and `sum(double)` is order-dependent (Spark's partial
  * aggregation adds in a different order than DuckDB's single-threaded
  * scan). So every money/quantity aggregate goes through fixed-point
  * decimal — exact and order-independent in both engines — and only the
  * final scalar is cast back to double. Keep operand precision small
  * (12) so products stay ≤ 38 digits and Spark never rounds
  * (`DecimalPrecision` only loses scale past precision 38).
  */
object ColOps {

  /** Cast a double column to exact fixed-point for order-independent sums. */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(12, scale))

  /** Exact decimal sum surfaced as double (single deterministic conversion). */
  def dsum(c: Column): Column = sum(c).cast("double")

  /** Exact mean: decimal sum, one double division at the end. */
  def dmean(c: Column): Column = sum(c).cast("double") / count(lit(1))
}
