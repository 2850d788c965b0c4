package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Mergeable KLL quantile sketches — the percentile sibling of the stored
 * HLL/theta columns in ops/Dedup: per-segment (per-day, per-source)
 * ~few-KB binaries whose UNION answers quantiles over any segment range
 * with no raw rescan. Spark 4 ships hll_/theta_ SQL functions but no
 * KLL aggregate, so this wraps the same DataSketches library Spark
 * already bundles, through the TypedImperativeAggregate shape of
 * SketchAggs (one sketch buffer per group, elementwise merge —
 * constant-width state at any row count).
 *
 * k = 200 gives ~1.65% normalized rank error, preserved under merge by
 * the KLL guarantee (what makes per-segment sketches safe to combine).
 */

/** Build a KLL doubles sketch per group from a double column. */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Union stored KLL binaries (the incremental-maintenance merge). */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_union"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Query quantiles out of a stored KLL binary. Evaluated per sketch ROW
  * (|segments|-sized frames, not the corpus), so CodegenFallback is the
  * honest choice — no codegen win to chase on dozens of rows. */
case class KllQuantilesExpr(child: Expression, ranks: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"ranks must be in [0,1]: $ranks")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // an empty sketch (every segment all-NULL) yields null regardless of
  // the child's nullability — never inherit non-nullable here
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override protected def nullSafeEval(input: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new GenericArrayData(ranks.map(r => sk.getQuantile(r)).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KllSketches {
  /** Aggregate Column: KLL doubles sketch binary of a numeric column
    * (cast to double here — the aggregate's eval path reads doubles). */
  def kllSketch(c: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllAgg(ColumnBridge.expression(c.cast("double")), k)
        .toAggregateExpression())

  /** Aggregate Column: union of stored KLL binaries. */
  def kllUnion(c: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllUnionAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Scalar Column: quantile values at `ranks` from a stored binary. */
  def kllQuantiles(c: Column, ranks: Seq[Double]): Column =
    ColumnBridge.column(KllQuantilesExpr(ColumnBridge.expression(c), ranks))
}
