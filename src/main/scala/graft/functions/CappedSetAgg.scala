package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct-collect with a HARD buffer cap: per group, gather the distinct
  * child values as a sorted array, but the moment a group exceeds `cap`
  * distinct values the buffer is dropped and the group evaluates to NULL.
  *
  * This is the bounded-state form of `sort_array(collect_set(...))` for
  * cap-then-expand patterns (co-occurrence pairing, adjacency builds):
  * plain collect_set's buffer grows with the group's distinct count —
  * exactly what a degenerate group (one order containing 10^7 parts, one
  * token appearing in every document) would blow up at 100 TB. Here the
  * buffer holds at most cap+1 elements by construction, on every partial
  * as well as after merges, and the downstream "drop oversized groups"
  * filter becomes a null check — same exact semantics (overflow ⇔
  * distinct count > cap, regardless of row order or merge shape), ONE
  * shuffle, no second gating pass over the input.
  *
  * Supported child types: int, long, string (the id shapes group-pair
  * builders use). Output sorts ascending — for strings by UTF8 binary
  * order, matching `sort_array`.
  */
case class CappedSetAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedSetAgg.Buf] {

  require(cap >= 1, s"cap must be >= 1: $cap")
  private def elemType: DataType = child.dataType

  // the child is unresolved at construction — type-check after analysis
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemType == IntegerType || elemType == LongType ||
        elemType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"capped_sorted_set supports int/bigint/string, got $elemType")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(elemType, containsNull = false)
  override def prettyName: String = "capped_sorted_set"

  override def createAggregationBuffer(): CappedSetAgg.Buf =
    new CappedSetAgg.Buf()

  override def update(buf: CappedSetAgg.Buf,
                      input: InternalRow): CappedSetAgg.Buf = {
    if (!buf.over) {
      val v = child.eval(input)
      if (v != null) {
        // UTF8String buffers are reused by the scan; copy out
        val stable = v match {
          case s: UTF8String => s.copy()
          case other => other
        }
        buf.set.add(stable)
        if (buf.set.size > cap) buf.overflow()
      }
    }
    buf
  }

  override def merge(b1: CappedSetAgg.Buf,
                     b2: CappedSetAgg.Buf): CappedSetAgg.Buf = {
    if (b2.over) b1.overflow()
    if (!b1.over) {
      b1.set ++= b2.set
      if (b1.set.size > cap) b1.overflow()
    }
    b1
  }

  override def eval(buf: CappedSetAgg.Buf): Any = {
    if (buf.over) null
    else {
      val arr: Array[Any] = elemType match {
        case IntegerType =>
          buf.set.toArray.map(_.asInstanceOf[Int]).sorted
            .map(_.asInstanceOf[Any])
        case LongType =>
          buf.set.toArray.map(_.asInstanceOf[Long]).sorted
            .map(_.asInstanceOf[Any])
        case StringType =>
          buf.set.toArray.map(_.asInstanceOf[UTF8String])
            .sortWith(_.compareTo(_) < 0).map(_.asInstanceOf[Any])
      }
      new GenericArrayData(arr)
    }
  }

  override def serialize(buf: CappedSetAgg.Buf): Array[Byte] = {
    if (buf.over) Array[Byte](1)
    else elemType match {
      case IntegerType =>
        val bb = ByteBuffer.allocate(1 + 4 + 4 * buf.set.size)
        bb.put(0: Byte).putInt(buf.set.size)
        buf.set.foreach(v => bb.putInt(v.asInstanceOf[Int]))
        bb.array()
      case LongType =>
        val bb = ByteBuffer.allocate(1 + 4 + 8 * buf.set.size)
        bb.put(0: Byte).putInt(buf.set.size)
        buf.set.foreach(v => bb.putLong(v.asInstanceOf[Long]))
        bb.array()
      case StringType =>
        val bs = buf.set.toArray.map(_.asInstanceOf[UTF8String].getBytes)
        val bb = ByteBuffer.allocate(1 + 4 + bs.map(4 + _.length).sum)
        bb.put(0: Byte).putInt(bs.length)
        bs.foreach { b => bb.putInt(b.length); bb.put(b) }
        bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): CappedSetAgg.Buf = {
    val buf = new CappedSetAgg.Buf()
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() != 0) buf.overflow()
    else {
      val n = bb.getInt
      var i = 0
      while (i < n) {
        elemType match {
          case IntegerType => buf.set.add(bb.getInt)
          case LongType => buf.set.add(bb.getLong)
          case StringType =>
            val b = new Array[Byte](bb.getInt)
            bb.get(b)
            buf.set.add(UTF8String.fromBytes(b))
        }
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedSetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedSetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CappedSetAgg {
  /** Overflow is sticky and frees the set — an overflowed group costs
    * O(1) memory for the rest of the aggregation. */
  final class Buf {
    var over: Boolean = false
    var set: mutable.HashSet[Any] = new mutable.HashSet[Any]()
    def overflow(): Unit = { over = true; set = new mutable.HashSet[Any]() }
  }

  /** Aggregate Column: sorted distinct array, or NULL if the group holds
    * more than `cap` distinct values. */
  def cappedSortedSet(c: Column, cap: Int): Column =
    ColumnBridge.column(
      CappedSetAgg(ColumnBridge.expression(c), cap).toAggregateExpression())
}
