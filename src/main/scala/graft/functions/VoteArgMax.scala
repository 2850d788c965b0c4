package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Deterministic argmax for label-vote aggregation: the label with the
  * most votes, ties to the SMALLEST label — `(votes DESC, label ASC)` as
  * one O(1)-state aggregate.
  *
  * Exists because the declarative spellings — `max(struct(n, -label))`
  * and `max_by(label, struct(n, -label))` — carry a STRUCT aggregation
  * buffer, which HashAggregate's mutable UnsafeRow cannot hold, so
  * Catalyst plans a SortAggregate: every vote row gets sorted on every
  * LPA round (measured as the dominant cost of Graph.labelPropagation).
  * A TypedImperativeAggregate runs in ObjectHashAggregate instead —
  * hash-grouped, 17-byte buffers, no sort. The (votes, label) ordering
  * key is unique per candidate label, so the result is order-independent
  * and merge-shape-independent: bit-identical on any engine, DuckDB
  * replay via arg_min(label, (-votes, label)) lexicographic compare.
  */
case class VoteArgMax(
    votes: Expression,
    label: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VoteArgMax.Buf] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (votes.dataType == LongType && label.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vote_argmax expects (bigint, bigint), got " +
          s"(${votes.dataType}, ${label.dataType})")

  override def children: Seq[Expression] = Seq(votes, label)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "vote_argmax"

  override def createAggregationBuffer(): VoteArgMax.Buf =
    new VoteArgMax.Buf()

  private def better(buf: VoteArgMax.Buf, n: Long, l: Long): Boolean =
    !buf.set || n > buf.n || (n == buf.n && l < buf.l)

  override def update(buf: VoteArgMax.Buf,
                      input: InternalRow): VoteArgMax.Buf = {
    val nv = votes.eval(input)
    val lv = label.eval(input)
    if (nv != null && lv != null) {
      val n = nv.asInstanceOf[Long]; val l = lv.asInstanceOf[Long]
      if (better(buf, n, l)) { buf.set = true; buf.n = n; buf.l = l }
    }
    buf
  }

  override def merge(b1: VoteArgMax.Buf,
                     b2: VoteArgMax.Buf): VoteArgMax.Buf = {
    if (b2.set && better(b1, b2.n, b2.l)) {
      b1.set = true; b1.n = b2.n; b1.l = b2.l
    }
    b1
  }

  override def eval(buf: VoteArgMax.Buf): Any =
    if (buf.set) buf.l else null

  override def serialize(buf: VoteArgMax.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(17)
    bb.put(if (buf.set) 1: Byte else 0: Byte).putLong(buf.n).putLong(buf.l)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VoteArgMax.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VoteArgMax.Buf()
    buf.set = bb.get() != 0
    buf.n = bb.getLong; buf.l = bb.getLong
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VoteArgMax =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VoteArgMax =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(votes = newChildren(0), label = newChildren(1))
}

object VoteArgMax {
  final class Buf {
    var set: Boolean = false
    var n: Long = 0L
    var l: Long = 0L
  }

  /** Aggregate Column: label with the most votes, ties to smallest. */
  def voteArgMax(votes: Column, label: Column): Column =
    ColumnBridge.column(
      VoteArgMax(ColumnBridge.expression(votes),
        ColumnBridge.expression(label)).toAggregateExpression())
}
