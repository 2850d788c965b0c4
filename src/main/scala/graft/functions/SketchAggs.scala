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

/** Misra-Gries frequent-items summary: at most `k` counters per aggregation
  * buffer, whatever the input cardinality — the bounded-state answer to
  * "which values exceed an x% share" when a plain groupBy would materialize
  * 10^9 groups. Guarantee (order- and merge-shape-independent): every value
  * with true count > N/k survives to the output, and each surviving
  * estimate undercounts by at most N/k. Merging follows the mergeable-
  * summaries construction: sum counters pairwise, then subtract the
  * (k+1)-largest count and drop non-positives — still at most k counters,
  * same guarantee. Eval returns the surviving items sorted (deterministic
  * for a given summary content); ESTIMATES are intentionally not returned —
  * they depend on arrival order, so callers needing exact counts re-count
  * just the survivors (ops/Frequency.heavyHitters). */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  type Buf = scala.collection.mutable.HashMap[String, Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "freq_items_mg"

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString // UTF8String buffers are reused; copy out
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None => // decrement-all: the classic MG eviction step
          val dead = List.newBuilder[String]
          buf.foreach { case (item, c) =>
            if (c == 1L) dead += item else buf.update(item, c - 1)
          }
          dead.result().foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.foreach { case (item, c) =>
      b1.update(item, b1.getOrElse(item, 0L) + c)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything, keep positives
      val cut = b1.values.toArray.sortBy(-_).apply(k)
      val dead = List.newBuilder[String]
      b1.foreach { case (item, c) =>
        if (c - cut <= 0L) dead += item else b1.update(item, c - cut)
      }
      dead.result().foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.keys.toArray.sorted
      .map(org.apache.spark.unsafe.types.UTF8String.fromString(_))
      .asInstanceOf[Array[Any]])

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.toArray.map { case (s, c) =>
      (s.getBytes("UTF-8"), c) // encode once, reuse for sizing and writing
    }
    val bb = ByteBuffer.allocate(4 + entries.length * 12 +
      entries.map(_._1.length).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
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

  /** Aggregate Column: Misra-Gries candidate heavy hitters (sorted array of
    * the <= k surviving string values). */
  def freqItems(c: Column, k: Int): Column =
    ColumnBridge.column(
      FreqItemsAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
