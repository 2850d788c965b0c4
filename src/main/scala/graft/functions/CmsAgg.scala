package graft.functions

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Count-Min frequency-sketch column plumbing. Spark 4 SHIPS the build
 * aggregate (`count_min_sketch(col, eps, conf, seed)` → binary) but no
 * union aggregate and no point-query reader, which is exactly what the
 * stored-sketch maintenance pattern needs (per-day binaries → merged
 * range estimate, the HLL/theta/KLL sibling for item FREQUENCIES).
 * These two fill the gap against Spark's own
 * org.apache.spark.util.sketch.CountMinSketch, so binaries interoperate
 * with the built-in builder byte-for-byte.
 */

/** Union stored count-min binaries (same eps/conf/seed by contract —
  * CountMinSketch.mergeInPlace rejects incompatible shapes). */
case class CmsUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CountMinSketch]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_union"

  override def createAggregationBuffer(): Option[CountMinSketch] = None

  private def read(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def update(buf: Option[CountMinSketch],
                      input: InternalRow): Option[CountMinSketch] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = read(v.asInstanceOf[Array[Byte]])
      buf match {
        case None => Some(sk)
        case Some(acc) => acc.mergeInPlace(sk); buf
      }
    }
  }

  override def merge(b1: Option[CountMinSketch],
                     b2: Option[CountMinSketch]): Option[CountMinSketch] =
    (b1, b2) match {
      case (Some(a), Some(b)) => a.mergeInPlace(b); b1
      case (Some(_), None) => b1
      case _ => b2
    }

  override def eval(buf: Option[CountMinSketch]): Any =
    buf.map(_.toByteArray).orNull

  override def serialize(buf: Option[CountMinSketch]): Array[Byte] =
    buf.map(_.toByteArray).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[CountMinSketch] =
    if (bytes.isEmpty) None else Some(read(bytes))

  override def withNewMutableAggBufferOffset(o: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Point-query a stored count-min binary for a FIXED item list (string
  * items, encoded UTF-8 exactly as Spark's builder adds them). Runs on
  * |segments|-sized frames — CodegenFallback, same stance as
  * KllQuantilesExpr. */
case class CmsEstimateExpr(child: Expression, items: Seq[String])
  extends UnaryExpression with CodegenFallback {

  require(items.nonEmpty, "need at least one item to query")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(input: Any): Any = {
    val sk = CountMinSketch.readFrom(
      new ByteArrayInputStream(input.asInstanceOf[Array[Byte]]))
    new GenericArrayData(items.map(i =>
      sk.estimateCount(i.getBytes(StandardCharsets.UTF_8))).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsSketches {
  /** Aggregate Column: union of stored count-min binaries. */
  def cmsUnion(c: Column): Column =
    ColumnBridge.column(
      CmsUnionAgg(ColumnBridge.expression(c)).toAggregateExpression())

  /** Scalar Column: estimated counts for `items` from a stored binary. */
  def cmsEstimates(c: Column, items: Seq[String]): Column =
    ColumnBridge.column(CmsEstimateExpr(ColumnBridge.expression(c), items))
}
