package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  LessThan, LessThanOrEqual, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode,
  LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.StructType

import graft.ops.VersionedTable

/**
 * Ordinary `.filter(...)` / SQL WHERE syntax over a [[VersionedTable]]
 * with AUTOMATIC manifest file skipping — the tier-c integration: a
 * custom leaf [[LogicalPlan]] ([[VersionedRelation]]) plus an optimizer
 * [[Rule]] ([[PruneVersionedScan]]) that sees the filters Catalyst has
 * pushed down next to the leaf, extracts the sound per-column bounds,
 * and substitutes the pruned multi-path scan — so a user writes
 *
 * {{{ VersionedScan.table(spark, root).filter($"v".between(40, 59)) }}}
 *
 * (or registers a temp view and uses plain SQL) and files whose recorded
 * min/max or bloom cannot match are never listed in the physical plan.
 * The original Filter node STAYS on top of the substituted scan, so any
 * predicate shape the extractor does not understand — disjunctions,
 * UDFs, IS NULL — is simply not used for pruning and still filters rows:
 * soundness never depends on extraction completeness.
 */
object VersionedScan {

  /** A versioned table as a DataFrame whose scan is planned LAZILY by the
    * optimizer rule — filters applied on top (before any action) prune
    * files. Self-registering: an unresolved [[VersionedRelation]] reaching
    * the planner is an inscrutable internal error, so the rule is added to
    * the session idempotently here (cluster-wide installs via
    * [[graft.GraftExtensions]] are detected and not doubled). */
  def table(spark: SparkSession, root: String,
            asOfVersion: Option[Int] = None): DataFrame = {
    if (!spark.sessionState.optimizer.extendedOperatorOptimizationRules
          .contains(PruneVersionedScan) &&
        !spark.experimental.extraOptimizations.contains(PruneVersionedScan))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneVersionedScan
    // PIN the version NOW (snapshot semantics): the rule substitutes the
    // scan at action time, and an unpinned relation would silently read
    // whatever version is current then — or crash rebinding attributes if
    // schema evolution dropped a column in between
    val v = asOfVersion.orElse(VersionedTable.currentVersion(spark, root))
    val schema = VersionedTable.schemaOf(spark, root, v)
    PlanBridge.dataFrame(spark,
      VersionedRelation(root, v, schema,
        DataTypeUtils.toAttributes(schema)))
  }
}

/** Leaf standing for "the committed content of the versioned table at
  * `root`" — resolved into a concrete (possibly pruned) parquet scan by
  * [[PruneVersionedScan]]. sizeInBytes is conservatively large so join
  * planning never broadcasts an unresolved table. */
case class VersionedRelation(root: String, asOfVersion: Option[Int],
                             tableSchema: StructType,
                             output: Seq[Attribute])
    extends LeafNode with MultiInstanceRelation {
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(Long.MaxValue) / 16)
  // self-joins of one table() frame: the analyzer's DeduplicateRelations
  // re-instances leaves through this, like every built-in relation
  override def newInstance(): VersionedRelation =
    copy(output = output.map(_.newInstance()))
}

/** Filter(cond, VersionedRelation) → Filter(cond, prunedScan); a bare
  * relation resolves to the full read. Runs inside the operator-
  * optimization batch, i.e. AFTER predicate pushdown has moved filters
  * next to the leaf. */
object PruneVersionedScan extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, rel: VersionedRelation) =>
      f.copy(child = substitute(rel, Some(cond)))
    case rel: VersionedRelation =>
      substitute(rel, None)
  }

  /** Extract sound per-column constraints from the conjuncts: closed /
    * strict bounds (strict widened to inclusive) and equalities against
    * literals. Anything else contributes nothing — the Filter on top
    * keeps row-level semantics regardless. */
  private def constraints(cond: Expression)
      : Seq[VersionedTable.ColConstraint] = {
    def ext(dtJson: Literal): Any =
      CatalystTypeConverters.createToScalaConverter(dtJson.dataType)(
        dtJson.value)
    val perCol = scala.collection.mutable.Map.empty[String,
      (Option[Any], Option[Any], Option[Any])]
    def merge(name: String, lo: Option[Any], hi: Option[Any],
              eq: Option[Any]): Unit = {
      val (l0, h0, e0) = perCol.getOrElse(name, (None, None, None))
      // several bounds on one column: any single sound bound suffices
      // for pruning; keep the first seen of each kind
      perCol(name) = (l0.orElse(lo), h0.orElse(hi), e0.orElse(eq))
    }
    splitConjunctivePredicates(cond).foreach {
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        merge(a.name, Some(ext(l)), None, None)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        merge(a.name, Some(ext(l)), None, None)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        merge(a.name, None, Some(ext(l)), None)
      case LessThan(a: AttributeReference, l: Literal) =>
        merge(a.name, None, Some(ext(l)), None)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        merge(a.name, None, Some(ext(l)), None)
      case GreaterThan(l: Literal, a: AttributeReference) =>
        merge(a.name, None, Some(ext(l)), None)
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        merge(a.name, Some(ext(l)), None, None)
      case LessThan(l: Literal, a: AttributeReference) =>
        merge(a.name, Some(ext(l)), None, None)
      case EqualTo(a: AttributeReference, l: Literal) =>
        merge(a.name, None, None, Some(ext(l)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        merge(a.name, None, None, Some(ext(l)))
      case _ => ()
    }
    perCol.toSeq.map { case (name, (lo, hi, eq)) =>
      VersionedTable.ColConstraint(name, lo, hi, eq)
    }
  }

  /** Build the concrete scan and re-bind it to the relation's original
    * attribute ids so everything referencing the leaf keeps resolving. */
  private def substitute(rel: VersionedRelation,
                         cond: Option[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val df = cond.map(constraints).filter(_.nonEmpty) match {
      case Some(cs) =>
        VersionedTable.readConstrained(spark, rel.root, cs, rel.asOfVersion)
      case None =>
        VersionedTable.read(spark, rel.root, rel.asOfVersion)
    }
    val newPlan = PlanBridge.analyzed(df)
    val byName = newPlan.output.map(a => a.name -> a).toMap
    val projection: Seq[NamedExpression] = rel.output.map { old =>
      val bound = byName.getOrElse(old.name, throw new IllegalStateException(
        s"column ${old.name} of the pinned version is missing from the " +
          s"resolved scan of ${rel.root} — manifest drift under a pinned " +
          "version should be impossible; was the table vacuumed?"))
      Alias(bound, old.name)(exprId = old.exprId)
    }
    Project(projection, newPlan)
  }
}
