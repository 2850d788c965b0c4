package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge

/**
 * Native as-of (point-in-time) join: tier (c) of the extension ladder — a
 * custom LogicalPlan node, a planner Strategy, and a SparkPlan that merges
 * both sides in one pass.
 *
 * The compositional form (graft.ops.AsOfJoin: union + window carry-forward)
 * materializes the UNION of both sides through a full window evaluation —
 * every right row flows through the sort AND the carry projection alongside
 * the left rows. This operator requests the same shuffle + sort from the
 * planner (ClusteredDistribution on the key, (key, ts) child ordering — so
 * it composes with Exchange reuse, AQE coalescing, and bucketed inputs like
 * any built-in join) but then streams the two sorted iterators through a
 * single merge: each partition is one pass, no unioned intermediate, no
 * window buffer. Semantics match AsOfJoin.asOf exactly (inclusive t' <= t;
 * null-key/null-ts left rows get a null payload) and both are checked
 * against DuckDB's independent native ASOF JOIN implementation.
 */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        payload: Seq[Attribute],
                        asofAttrs: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofAttrs
  // the asof_* columns are GENERATED here, not consumed from children —
  // without this, CheckAnalysis flags them as missing from the input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, payload, asofAttrs) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, payload,
        l.output ++ asofAttrs) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        payload: Seq[Expression],
                        output: Seq[Attribute]) extends BinaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      output.drop(left.output.size))

  // co-partition both sides on the key (EnsureRequirements inserts the
  // exchanges; an already-bucketed side satisfies it exchange-free)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // in-partition (key, ts) order on both sides: the merge is one pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val payloadB = payload.map(BindReferences.bindReference(_, right.output))
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val nPayload = payload.size
    val outputAttrs = output
    val nLeft = left.output.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadB)
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow
      // the remembered candidate: latest right row with rKey == current
      // left key and rTs <= current left ts (copied: iterators reuse rows)
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var candKey: Any = null
      var candRow: InternalRow = null

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lk == null || lt == null) {
          // SQL equality/comparison never matches on null: null payload
          resultProj(joined(lRow, nullPayload))
        } else {
          // advance the right cursor through every row at-or-before (lk, lt)
          var advancing = rRow != null
          while (advancing) {
            val rk = rKeyB.eval(rRow)
            val rt = rTsB.eval(rRow)
            // right side is pre-filtered to non-null key/ts by the API
            val cmp = keyOrd.asInstanceOf[Ordering[Any]].compare(rk, lk)
            if (cmp < 0 ||
                (cmp == 0 && tsOrd.asInstanceOf[Ordering[Any]].compare(rt, lt) <= 0)) {
              if (cmp == 0) { candKey = rk; candRow = payloadProj(rRow).copy() }
              if (rIter.hasNext) rRow = rIter.next() else { rRow = null; advancing = false }
            } else advancing = false
          }
          val matched = candRow != null && candKey != null &&
            keyOrd.asInstanceOf[Ordering[Any]].compare(candKey, lk) == 0
          resultProj(joined(lRow, if (matched) candRow else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNative {

  /** Native as-of join with [[graft.ops.AsOfJoin.asOf]]'s API and
    * semantics: attach to each left row the latest right payload of the
    * same key with rightTs <= leftTs (columns `asof_<p>`, null when no
    * quote precedes the row). Registers the planner strategy on the
    * session on first use (or install cluster-wide via GraftExtensions). */
  def asOf(left: DataFrame, right: DataFrame, key: String, leftTs: String,
           rightTs: String, payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // null-key/null-ts quotes can never match (mirrors AsOfJoin.asOf)
    val rightClean = right.filter(
      right(key).isNotNull && right(rightTs).isNotNull)
    val lPlan = PlanBridge.analyzed(left)
    // re-alias every right attribute with a FRESH exprId: when both sides
    // derive from the same scan (self-join shape), shared ids would make
    // BindReferences ambiguous inside the binary node — the analyzer's
    // DeduplicateRelations only rewrites built-in node types
    val rPlan0 = PlanBridge.analyzed(rightClean)
    val rPlan = Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    val payloadAttrs = payload.map(attr(rPlan, _))
    val asofAttrs = payloadAttrs.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    PlanBridge.dataFrame(spark,
      AsOfJoinNode(lPlan, rPlan, attr(lPlan, key), attr(rPlan, key),
        attr(lPlan, leftTs), attr(rPlan, rightTs), payloadAttrs, asofAttrs))
  }
}
