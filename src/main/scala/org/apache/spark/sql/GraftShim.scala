package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.types.{LongType, StructType}

/** Internal-row bridge for graft's scalable dense row index.
  *
  * `Dataset.rdd` deserializes every `InternalRow` into an external `Row`
  * and `createDataFrame` re-encodes it — two full columnar↔object
  * conversions that also break whole-stage codegen around the boundary.
  * Appending the zipWithIndex counter directly onto the `InternalRow`
  * stream (`queryExecution.toRdd`) keeps the data in Tungsten format;
  * the downstream `RDDScanExec` re-projects to `UnsafeRow` lazily, one
  * row at a time, so the reused `JoinedRow` wrapper is safe.
  *
  * Lives in `org.apache.spark.sql` only to reach the `private[sql]`
  * `internalCreateDataFrame`; uses public-contract internals
  * (`toRdd`, `JoinedRow`) that Spark's own exec nodes use the same way.
  */
object GraftShim {

  /** Wrap a Catalyst expression as a Column (Spark 4 keeps the direct
    * constructor `private[sql]`; the function-registry route requires a
    * session at hand, which pure Column helpers don't have). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Inverse bridge: the (possibly unresolved) expression behind a Column. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Append a 0-based dense long index column reflecting the current
    * partition order (partition i's rows precede partition i+1's).
    * One extra count job (zipWithIndex) whose shuffle dependencies are
    * shared with the main action, so upstream stages are not re-run. */
  def zipWithRowIndex(df: DataFrame, name: String): DataFrame = {
    val out = StructType(df.schema.fields).add(name, LongType, nullable = false)
    val rdd = df.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val joined = new JoinedRow
      val idxRow = new GenericInternalRow(1)
      it.map { case (row, idx) =>
        idxRow.update(0, idx)
        joined(row, idxRow): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    df.sparkSession.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, out)
  }
}
