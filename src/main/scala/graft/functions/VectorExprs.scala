package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Native vector math for the similarity module.
 *
 * The declarative formulation — `aggregate(zip_with(a, b, _ * _), 0d, _ + _)`
 * — is a higher-order function: Catalyst evaluates it interpreted
 * (CodegenFallback), allocating the zipped array and invoking the lambda
 * closure per element, per row. On similarity workloads the dot product runs
 * on PAIR-expanded rows (|block|² verify joins, |Q|×|C| brute force), so the
 * closure overhead multiplies quadratically; and SRP-LSH bucketing needs
 * nbits×nTables dots per row, which as separate HOF trees produced
 * thousand-node projections that took longer to plan and Janino-compile than
 * to run.
 *
 * [[DotProduct]] is the same left-to-right double fold as the HOF version —
 * bit-identical results, preserved oracle hashes — as one codegen'd
 * expression node. [[SrpBuckets]] computes ALL tables' bucket ids in a
 * single pass over the vector against a plane matrix carried as a reference
 * object: per row it is a tight JIT'd triple loop, and per plan it is ONE
 * node regardless of nbits × nTables.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_dot expects array<float|double> inputs, got $other")
  }

  @transient private lazy val leftFloat = elemIsFloat(left)
  @transient private lazy val rightFloat = elemIsFloat(right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""java.lang.Double $r = graft.functions.DotProduct.compute(
         |  $a, $b, $leftFloat, $rightFloat);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Called from both interpreted eval and generated code. Mirrors the HOF
    * semantics exactly: length mismatch or a null element yields null
    * (zip_with pads with null / null propagates through the fold); otherwise
    * a sequential left-to-right sum of elementwise double products. */
  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/**
 * Packed SRP-LSH bucket ids for `planes.length / nbits` hash tables in one
 * pass: bit b of table t = sign of dot(vec, plane[t*nbits + b]), packed into
 * a long per table. Output is array<long> of nTables elements.
 *
 * Exactly equivalent to nbits×nTables `when(dot >= 0, 1L<<b)` OR-reductions
 * (a vector with a null element yields bucket 0 everywhere — the null dot
 * fails the >= 0 test in the declarative form), but planned and compiled as
 * a single expression node.
 */
case class SrpBuckets(child: Expression, planes: Seq[Seq[Double]], nbits: Int)
    extends UnaryExpression {

  require(nbits >= 1 && nbits <= 64, "nbits must be in [1, 64]")
  require(planes.nonEmpty && planes.length % nbits == 0,
    "planes.length must be a positive multiple of nbits")
  require(planes.forall(_.length == planes.head.length),
    "all hyperplanes must share one dimensionality")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  @transient private lazy val flat: Array[Double] = planes.flatten.toArray
  @transient private lazy val dim: Int = planes.head.length
  @transient private lazy val nTables: Int = planes.length / nbits

  @transient private lazy val childFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"srp_buckets expects an array<float|double> vector, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SrpBuckets.compute(input.asInstanceOf[ArrayData], flat, dim, nbits,
      nTables, childFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", flat, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"""graft.functions.SrpBuckets.compute(
         |  $v, $planesRef, $dim, $nbits, $nTables, $childFloat)""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBuckets {

  /** Called from both interpreted eval and generated code. */
  def compute(vec: ArrayData, planes: Array[Double], dim: Int, nbits: Int,
              nTables: Int, vecFloat: Boolean): ArrayData = {
    val out = new Array[Long](nTables)
    val n = vec.numElements()
    // a null element nulls every dot; `when(null >= 0, bit)` contributes 0,
    // so every table's bucket is 0 — match that wholesale. Dim mismatch
    // (vector shorter/longer than the planes) dots only the overlap, like
    // zip_with's null-padding would null it; treat as bucket 0 too.
    var i = 0
    var clean = n == dim
    while (clean && i < n) {
      if (vec.isNullAt(i)) clean = false
      i += 1
    }
    if (!clean) return new GenericArrayData(out)
    val v = new Array[Double](dim)
    i = 0
    while (i < dim) {
      v(i) = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < nbits) {
        val off = (t * nbits + b) * dim
        var s = 0.0
        var d = 0
        while (d < dim) {
          s += v(d) * planes(off + d)
          d += 1
        }
        if (s >= 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

object VectorFunctions {

  /** Native dot product over array<float|double> columns. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Packed SRP bucket ids (one long per table) for the given plane matrix;
    * planes are grouped as nTables consecutive runs of nbits rows. */
  def srpBuckets(vec: Column, planes: Seq[Seq[Double]], nbits: Int): Column =
    ColumnBridge.column(SrpBuckets(
      ColumnBridge.expression(vec), planes, nbits))
}
