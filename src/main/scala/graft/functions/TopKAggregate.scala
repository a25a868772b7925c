package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Grouped top-k as a NATIVE bounded-state aggregate — the scale answer
  * to `row_number() OVER (PARTITION BY key ORDER BY ord) <= k`, which
  * shuffles and sorts EVERY row of every key. This aggregate keeps a
  * k-element bound per group on the map side, so the shuffle carries at
  * most k rows per (partition, group) and nothing is ever globally
  * sorted: at 100 TB that is the difference between a full-data sort
  * exchange and a constant-size sketch merge.
  *
  * The child must be a struct; rows are ranked by the struct's natural
  * (lexicographic, nulls-first) ordering, ASCENDING — put a descending
  * measure in negated form (or as a descending-friendly key) and
  * include a unique tie-breaker as the last field for deterministic
  * output. eval returns the sorted k-smallest structs; callers
  * `posexplode` to get (rank, row).
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[InternalRow]]
  with UnaryLike[Expression] {

  require(k >= 1, s"topk needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType
      if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
      TypeCheckResult.TypeCheckSuccess
    case s: StructType => TypeCheckResult.TypeCheckFailure(
      s"topk struct fields must be orderable, got ${s.sql}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk needs a STRUCT child, got ${other.sql}")
  }

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]
  private lazy val project = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): mutable.ArrayBuffer[InternalRow] =
    mutable.ArrayBuffer.empty

  /** Keep the buffer as an unsorted bag of ≤ 2k rows, compacting to the
    * k smallest when it doubles — amortized O(1) comparisons per row
    * without a heap's per-insert log k. */
  private def compact(buf: mutable.ArrayBuffer[InternalRow]): Unit =
    if (buf.length > k) {
      val kept = buf.sorted(ordering).take(k)
      buf.clear(); buf ++= kept
    }

  override def update(
      buf: mutable.ArrayBuffer[InternalRow], input: InternalRow): mutable.ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      buf += project(v.asInstanceOf[InternalRow]).copy()
      if (buf.length >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[InternalRow],
      other: mutable.ArrayBuffer[InternalRow]): mutable.ArrayBuffer[InternalRow] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.sorted(ordering).take(k).toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    compact(buf) // never ship more than k rows per partial
    out.writeInt(buf.length)
    buf.foreach { row =>
      val u = row.asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "topk"
}

object TopKFunctions {
  /** Bounded-state per-group top-k: array of the k smallest `ordStruct`
    * values (lexicographic struct order, nulls first). */
  def topK(ordStruct: Column, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      TopKAgg(org.apache.spark.sql.GraftShim.expression(ordStruct), k)
        .toAggregateExpression())
}
