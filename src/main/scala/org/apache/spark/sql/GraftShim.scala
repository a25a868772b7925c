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

  /** Append the INCLUSIVE running sum of long column `valueCol` in the
    * current partition order — the scalable replacement for a global
    * `sum over (order by …)` window, which funnels the whole table
    * through one partition. Two passes, zipWithIndex-style: a small job
    * collects one partial sum per partition (O(#partitions) driver
    * data), their exclusive scan broadcasts back as per-partition
    * offsets, and the main pass accumulates locally on the InternalRow
    * stream (no decode, codegen-adjacent). Null values count as 0. */
  def zipWithPrefixSum(df: DataFrame, valueCol: String, name: String): DataFrame = {
    val vIdx = df.schema.fieldIndex(valueCol)
    require(df.schema(vIdx).dataType == LongType,
      s"zipWithPrefixSum requires a BIGINT column, got ${df.schema(vIdx).dataType.sql}")
    val out = StructType(df.schema.fields).add(name, LongType, nullable = false)
    val rdd0 = df.queryExecution.toRdd
    val partialSums = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partialSums.scanLeft(0L)(_ + _)
    val offsetsBc = df.sparkSession.sparkContext.broadcast(offsets)
    val rdd = rdd0.mapPartitionsWithIndex { (pid, it) =>
      val joined = new JoinedRow
      val sumRow = new GenericInternalRow(1)
      var running = offsetsBc.value(pid)
      it.map { row =>
        if (!row.isNullAt(vIdx)) running += row.getLong(vIdx)
        sumRow.update(0, running)
        joined(row, sumRow): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    df.sparkSession.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, out)
  }

  /** Append the EXCLUSIVE running max of long column `valueCol` in the
    * current partition order — the value BEFORE this row,
    * Long.MinValue for the very first row — the scalable replacement
    * for `max over (order by … rows between unbounded preceding and 1
    * preceding)`. Same two-pass recipe as [[zipWithPrefixSum]]: one
    * partial max per partition to the driver, their exclusive scan
    * broadcast back as per-partition seeds. Null values are ignored. */
  def zipWithPrefixMax(df: DataFrame, valueCol: String, name: String): DataFrame = {
    val vIdx = df.schema.fieldIndex(valueCol)
    require(df.schema(vIdx).dataType == LongType,
      s"zipWithPrefixMax requires a BIGINT column, got ${df.schema(vIdx).dataType.sql}")
    val out = StructType(df.schema.fields).add(name, LongType, nullable = false)
    val rdd0 = df.queryExecution.toRdd
    val partialMax = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var m = Long.MinValue
      it.foreach(r => if (!r.isNullAt(vIdx)) m = math.max(m, r.getLong(vIdx)))
      Iterator((pid, m))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partialMax.scanLeft(Long.MinValue)(math.max)
    val offsetsBc = df.sparkSession.sparkContext.broadcast(offsets)
    val rdd = rdd0.mapPartitionsWithIndex { (pid, it) =>
      val joined = new JoinedRow
      val mRow = new GenericInternalRow(1)
      var running = offsetsBc.value(pid)
      it.map { row =>
        mRow.update(0, running)
        if (!row.isNullAt(vIdx)) running = math.max(running, row.getLong(vIdx))
        joined(row, mRow): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    df.sparkSession.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, out)
  }
}
