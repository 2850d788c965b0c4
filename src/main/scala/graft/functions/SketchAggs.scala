package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * One-pass sketch aggregates for fuzzy dedup.
 *
 * The pure-SQL formulations (64 separate `min(...)` / conditional-`sum`
 * aggregate expressions per group) work, but each group-by row then carries
 * 64 aggregation buffers through the hash aggregate. These
 * TypedImperativeAggregates keep ONE primitive-array buffer per group and
 * merge partials with an elementwise loop — the shape you want when the
 * group count is 10^9 at 100 TB.
 */

/** MinHash signature: per group, elementwise min over numPerm independent
  * 64-bit "permutations" of the base hash.
  *
  * Each permutation is a splitmix64-style finalizer applied to
  * (h + seed + i * GoldenGamma) — a BIJECTION on the 64-bit space, so the
  * argmin is a uniformly random element of the shingle set per permutation.
  * (The classic (a*x + b) mod p family silently degrades when a*x stays
  * within ~2p: the map is then near-monotonic in x and every permutation
  * picks nearly the same argmin — observed as 16/64 signature agreement on
  * a 0.958-Jaccard pair before this was replaced.) Results masked to 63
  * bits so plain signed comparison orders them. */
case class MinHashAgg(
    child: Expression,
    numPerm: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val n = numPerm

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        val hv = MinHashAgg.mix(h + seed + MinHashAgg.GoldenGamma * (i + 1))
        if (hv < buf(i)) buf(i) = hv
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  val GoldenGamma = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer, masked to 63 bits (signed-comparison safe). */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) & Long.MaxValue
  }
}

/** SimHash-64: per group, signed bit-count over 64-bit token hashes; eval
  * packs the sign vector into one long. Identical output to the 64
  * conditional-sum formulation. */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) buf(k) += 1 else buf(k) -= 1
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var k = 0
    while (k < 64) { b1(k) += b2(k); k += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var k = 0
    while (k < 64) { if (buf(k) > 0) sig |= (1L << k); k += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SketchAggs {
  /** Aggregate Column: MinHash signature of a long hash column. */
  def minhashSig(h: Column, numPerm: Int, seed: Long): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(h), numPerm, seed)
        .toAggregateExpression())

  /** Aggregate Column: SimHash-64 of a long hash column. */
  def simhash64(h: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(h)).toAggregateExpression())
}
