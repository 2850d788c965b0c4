package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute,
  AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteFromTable, InsertStarAction, LogicalPlan, MergeIntoTable,
  SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  TimestampType}

import graft.ops.VersionedTable

/**
 * The pure-SQL DML/maintenance surface of the versioned lake — the
 * counterpart of the read-side `graft_table` table function, so a SQL-only
 * user can run the table's FULL lifecycle without a line of Scala:
 *
 * {{{
 *   DELETE FROM graft.`/lake/events` WHERE date < DATE'2024-01-01'
 *   UPDATE graft.`/lake/events` SET score = score * 2 WHERE src = 'b'
 *   MERGE INTO graft.`/lake/events` t USING updates s
 *     ON t.id = s.id WHEN MATCHED THEN UPDATE SET *
 *     WHEN NOT MATCHED THEN INSERT *
 *   OPTIMIZE graft.`/lake/events` ZORDER BY (lat, lon)
 *   VACUUM graft.`/lake/events` RETAIN 3 VERSIONS
 *   RESTORE graft.`/lake/events` TO VERSION AS OF 4
 *   DESCRIBE HISTORY graft.`/lake/events`
 * }}}
 *
 * Mechanics — the Delta-style parser-delegate pattern, not a custom
 * dialect: DELETE / UPDATE / MERGE already live in Spark's OWN ANTLR
 * grammar (the reference's engine has no statement grammar at all, its
 * MERGE is an API call — load_stream_to_snowflake.py:243), so this parser
 * delegates the text to Spark and then REWRITES the returned logical
 * command when its target identifier is `graft`.`<root>` — full
 * expression coverage (subqueries, functions, ANSI literals) for free,
 * zero grammar maintenance. Only the four statements Spark's grammar
 * lacks (OPTIMIZE / VACUUM / RESTORE / DESCRIBE HISTORY) are recognized
 * up front, by anchored patterns that accept both the `graft`.`root`
 * identifier and the `graft_table('root')` spelling.
 *
 * The rewritten plans are eager [[LeafRunnableCommand]]s calling the same
 * engine entry points the Scala API uses (deleteMatching / updateMatching
 * / upsert / compact / vacuum / restore) — SQL DML therefore gets the
 * identical constraint-extraction index pruning, CHECK gating, and
 * claim-retry concurrency story, and returns the committed version as a
 * one-row result. Predicates and SET right-hand sides ride along as
 * UNRESOLVED expressions wrapped in Columns (a Column field is invisible
 * to TreeNode's expression reflection, so the command node is "resolved"
 * and analysis-clean); they resolve against the table's committed schema
 * inside the engine call, exactly like their Scala twins.
 *
 * Activation: session built with
 * `spark.sql.extensions=graft.GraftExtensions` (the parser is part of
 * sessionState and cannot be added to an already-running session —
 * unlike the function/rule surface, which `GraftExtensions.register`
 * retrofits).
 */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseStatement(sqlText, delegate.parsePlan).getOrElse(
      GraftSqlParser.rewriteDml(delegate.parsePlan(sqlText)))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  /** `graft`.`<root>` (group 1) or `graft_table('<root>')` (group 2). */
  private val Target =
    """(?:graft\s*\.\s*`([^`]+)`|graft_table\s*\(\s*'([^']+)'\s*\))"""
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + Target +
      """\s*(?:RETAIN\s+(\d+)\s+(VERSIONS?|HOURS?|DAYS?))?\s*;?\s*$""").r
  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + Target +
      """\s*(?:ZORDER\s+BY\s+\(?\s*([A-Za-z0-9_`,\s]+?)\s*\)?)?\s*;?\s*$""").r
  private val RestoreRe =
    ("""(?is)^\s*RESTORE\s+""" + Target +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val HistoryRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+""" + Target + """\s*;?\s*$""").r
  private val DetailRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+""" + Target + """\s*;?\s*$""").r
  private val AddDerivedRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Target +
      """\s+ADD\s+DERIVED\s+PARTITION\s+`?([A-Za-z0-9_]+)`?\s*=\s*""" +
      """(?:day\s*\(\s*`?([A-Za-z0-9_]+)`?\s*\)""" +
      """|bucket\s*\(\s*(\d+)\s*,\s*`?([A-Za-z0-9_]+)`?\s*\))\s*;?\s*$""").r
  private val DropDerivedRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Target +
      """\s+DROP\s+DERIVED\s+PARTITION\s+`?([A-Za-z0-9_]+)`?\s*;?\s*$""").r
  private val RefreshMvRe =
    ("""(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+""" + Target +
      """\s*;?\s*$""").r
  private val CreateBranchRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Target +
      """\s+CREATE\s+BRANCH\s+`?([A-Za-z0-9_-]+)`?""" +
      """(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""").r
  private val DropBranchRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Target +
      """\s+DROP\s+BRANCH\s+`?([A-Za-z0-9_-]+)`?\s*;?\s*$""").r
  private val FastForwardRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Target +
      """\s+FAST\s+FORWARD\s+BRANCH\s+`?([A-Za-z0-9_-]+)`?\s*;?\s*$""").r
  private val SetPropsRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Target +
      """\s+SET\s+TBLPROPERTIES\s*\(\s*(.+?)\s*\)\s*;?\s*$""").r
  private val UnsetPropsRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Target +
      """\s+UNSET\s+TBLPROPERTIES\s*\(\s*(.+?)\s*\)\s*;?\s*$""").r
  private val ShowPropsRe =
    ("""(?is)^\s*SHOW\s+TBLPROPERTIES\s+""" + Target + """\s*;?\s*$""").r
  private val VacuumDryRe =
    ("""(?is)^\s*VACUUM\s+""" + Target +
      """\s*(?:RETAIN\s+(\d+)\s+VERSIONS?)?\s+DRY\s+RUN\s*;?\s*$""").r
  private val ShowBranchesRe =
    ("""(?is)^\s*SHOW\s+BRANCHES\s+(?:IN\s+)?""" + Target +
      """\s*;?\s*$""").r
  private val CreateMvRe =
    ("""(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+""" + Target +
      """\s+KEYED\s+BY\s+\(\s*([A-Za-z0-9_`,\s]+?)\s*\)""" +
      """\s+AS\s+(SELECT\b.*?)\s*;?\s*$""").r

  private def root(g1: String, g2: String): String =
    Option(g1).getOrElse(g2)

  /** `'k' = 'v', 'k2'='v2'` — single-quoted keys/values, QUOTE-AWARE
    * (commas inside quotes are data, not separators); escaped quotes
    * unsupported on purpose. Full-coverage check: anything between the
    * matched pairs other than commas/whitespace is a loud error. */
  private def kvList(s: String): Map[String, String] = {
    val Kv = """'([^']*)'\s*=\s*'([^']*)'""".r
    val pairs = Kv.findAllMatchIn(s).toSeq
    val residue = Kv.replaceAllIn(s, "").replaceAll("""[,\s]""", "")
    if (pairs.isEmpty || residue.nonEmpty)
      throw new IllegalArgumentException(
        s"TBLPROPERTIES expects 'key' = 'value' pairs; got $s")
    pairs.map(m => m.group(1) -> m.group(2)).toMap
  }

  private def quotedList(s: String): Seq[String] = {
    val Q = """'([^']*)'""".r
    val names = Q.findAllMatchIn(s).toSeq
    val residue = Q.replaceAllIn(s, "").replaceAll("""[,\s]""", "")
    if (names.isEmpty || residue.nonEmpty)
      throw new IllegalArgumentException(s"expected quoted names; got $s")
    names.map(_.group(1))
  }

  private def colList(s: String): Seq[String] =
    s.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
      .filter(_.nonEmpty).toSeq

  /** The statements Spark's grammar cannot parse; None = not ours,
    * delegate the text. `parseSelect` is the delegate's parser, for the
    * materialized-view AS SELECT tail. */
  private[graft] def parseStatement(sql: String,
                                    parseSelect: String => LogicalPlan)
      : Option[LogicalPlan] =
    sql match {
      case VacuumDryRe(g1, g2, keep) =>
        Some(GraftVacuumDryRunCommand(root(g1, g2),
          Option(keep).map(_.toInt)))
      case SetPropsRe(g1, g2, kvs) =>
        Some(GraftSetPropsCommand(root(g1, g2), kvList(kvs)))
      case UnsetPropsRe(g1, g2, ks) =>
        Some(GraftUnsetPropsCommand(root(g1, g2), quotedList(ks)))
      case ShowPropsRe(g1, g2) =>
        Some(GraftShowPropsCommand(root(g1, g2)))
      case VacuumRe(g1, g2, keep, unit) =>
        Option(unit).map(_.toUpperCase(java.util.Locale.ROOT)) match {
          case Some(u) if u.startsWith("HOUR") =>
            Some(GraftVacuumAgeCommand(root(g1, g2),
              keep.toLong * 3600L * 1000L))
          case Some(u) if u.startsWith("DAY") =>
            Some(GraftVacuumAgeCommand(root(g1, g2),
              keep.toLong * 24L * 3600L * 1000L))
          case _ =>
            Some(GraftVacuumCommand(root(g1, g2), Option(keep).map(_.toInt)))
        }
      case OptimizeRe(g1, g2, zorder) =>
        Some(GraftOptimizeCommand(root(g1, g2),
          Option(zorder).toSeq.flatMap(_.split(","))
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty)))
      case RestoreRe(g1, g2, v) =>
        Some(GraftRestoreCommand(root(g1, g2), v.toInt))
      case HistoryRe(g1, g2) =>
        Some(GraftHistoryCommand(root(g1, g2)))
      case DetailRe(g1, g2) =>
        Some(GraftDetailCommand(root(g1, g2)))
      case AddDerivedRe(g1, g2, p, daySrc, bucketN, bucketSrc) =>
        val (transform, src) =
          if (daySrc != null) ("day", daySrc)
          else (s"bucket:$bucketN", bucketSrc)
        Some(GraftAddDerivedCommand(root(g1, g2), p, transform, src))
      case DropDerivedRe(g1, g2, p) =>
        Some(GraftDropDerivedCommand(root(g1, g2), p))
      case RefreshMvRe(g1, g2) =>
        Some(GraftMvRefreshCommand(root(g1, g2)))
      case CreateBranchRe(g1, g2, name, v) =>
        Some(GraftCreateBranchCommand(root(g1, g2), name,
          Option(v).map(_.toInt)))
      case DropBranchRe(g1, g2, name) =>
        Some(GraftDropBranchCommand(root(g1, g2), name))
      case FastForwardRe(g1, g2, name) =>
        Some(GraftFastForwardCommand(root(g1, g2), name))
      case ShowBranchesRe(g1, g2) =>
        Some(GraftShowBranchesCommand(root(g1, g2)))
      case CreateMvRe(g1, g2, keys, select) =>
        Some(mvCreate(root(g1, g2), colList(keys), select, parseSelect))
      case _ => None
    }

  /** Extract a [[graft.ops.MatView]] spec from the MV statement's
    * AS SELECT: `SELECT g..., agg(col) AS alias... FROM
    * graft_table('/src') GROUP BY g...` with aggs ∈ sum/min/max and
    * count(*). Every aggregate must be aliased (the alias is the view's
    * served column name); anything outside the maintainable shape is a
    * loud error naming what is supported. */
  private def mvCreate(viewRoot: String, keys: Seq[String], select: String,
                       parseSelect: String => LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{
      UnresolvedFunction, UnresolvedStar, UnresolvedTableValuedFunction}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    def unsupported(what: String): Nothing =
      throw new IllegalArgumentException(
        "CREATE MATERIALIZED VIEW supports SELECT <group cols>, " +
          "sum|min|max(col) AS alias..., count(*) AS alias FROM " +
          s"graft_table('/src') GROUP BY <group cols>; got $what")
    parseSelect(select) match {
      case Aggregate(groupExprs, resultExprs, child, _) =>
        val srcRoot = child.collectFirst {
          case tvf: UnresolvedTableValuedFunction
              if tvf.name.last.equalsIgnoreCase("graft_table") =>
            tvf.functionArgs match {
              case Seq(Literal(s, _)) => s.toString
              case _ => unsupported("a non-literal graft_table argument")
            }
        }.getOrElse(unsupported(s"FROM ${child.nodeName}"))
        val groups = groupExprs.map {
          case a: UnresolvedAttribute => a.nameParts.last
          case other => unsupported(s"GROUP BY ${other.sql}")
        }
        var sums = Vector.empty[(String, String)]
        var mins = Vector.empty[(String, String)]
        var maxs = Vector.empty[(String, String)]
        var countAlias: Option[String] = None
        resultExprs.foreach {
          case a: UnresolvedAttribute if groups.contains(a.nameParts.last) =>
            () // group column re-selected
          case Alias(f: UnresolvedFunction, name) if !f.isDistinct =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("sum", Seq(c: UnresolvedAttribute)) =>
                sums :+= (name -> c.nameParts.last)
              case ("min", Seq(c: UnresolvedAttribute)) =>
                mins :+= (name -> c.nameParts.last)
              case ("max", Seq(c: UnresolvedAttribute)) =>
                maxs :+= (name -> c.nameParts.last)
              case ("count", Seq(_: UnresolvedStar)) =>
                countAlias = Some(name)
              case ("count", Seq(Literal(_, _))) =>
                countAlias = Some(name)
              case (fn, _) => unsupported(s"$fn(${f.arguments.map(_.sql)
                .mkString(", ")})")
            }
          case other => unsupported(other.sql +
            " (alias every aggregate: sum(x) AS x_sum)")
        }
        GraftMvCreateCommand(viewRoot, srcRoot, keys, groups,
          sums, mins, maxs, countAlias)
      case other => unsupported(s"a ${other.nodeName} statement")
    }
  }

  /** The `graft`.`<root>` target of a DML command (through an optional
    * alias), with the alias so predicate qualifiers can be stripped.
    * Only PATH-shaped roots (containing '/') are claimed — DML on
    * two-part identifiers under a genuine catalog database named `graft`
    * (e.g. `DELETE FROM graft.sales`) passes through to Spark's own
    * resolution untouched. */
  private def graftTarget(plan: LogicalPlan)
      : Option[(String, Option[String])] = plan match {
    case SubqueryAlias(ident, child) =>
      graftTarget(child).map { case (r, _) => (r, Some(ident.name)) }
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
        u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
        u.multipartIdentifier(1).contains("/") =>
      Some((u.multipartIdentifier(1), None))
    case _ => None
  }

  /** `t.col` -> `col` when `t` is the statement's own table alias — the
    * engine re-resolves the predicate against a bare table scan, where
    * the alias does not exist. */
  private def stripQualifier(e: Expression, alias: Option[String])
      : Expression = alias match {
    case None => e
    case Some(a) => e.transform {
      case attr: UnresolvedAttribute if attr.nameParts.length > 1 &&
          attr.nameParts.head.equalsIgnoreCase(a) =>
        UnresolvedAttribute(attr.nameParts.tail)
    }
  }

  private def asColumn(e: Expression, alias: Option[String]): Column =
    ColumnBridge.column(stripQualifier(e, alias))

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case x => Seq(x)
  }

  /** Upsert keys from the MERGE ON clause: a conjunction of
    * `t.k = s.k` equalities over same-named columns, each relating the
    * TARGET to the SOURCE — a degenerate `t.k = t.k` (standard MERGE
    * semantics: every source row matches) or an unknown qualifier is a
    * loud error, never a silent reinterpretation as an upsert key. */
  private def mergeKeys(cond: Expression, tAlias: Option[String],
                        sAlias: Option[String]): Seq[String] = {
    // 'T' target-qualified, 'S' source-qualified, 'U' unqualified
    def side(a: UnresolvedAttribute): Char =
      if (a.nameParts.length == 1) 'U'
      else if (tAlias.exists(_.equalsIgnoreCase(a.nameParts.head))) 'T'
      else if (sAlias.exists(_.equalsIgnoreCase(a.nameParts.head))) 'S'
      else throw new IllegalArgumentException(
        s"MERGE ON references a qualifier that is neither the target " +
          s"nor the source alias: ${a.sql}")
    splitConj(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        val (sa, sb) = (side(a), side(b))
        require(sa == 'U' || sb == 'U' || sa != sb,
          s"MERGE ON equality ${a.sql} = ${b.sql} references the same " +
            "table on both sides — an upsert key must relate target and " +
            "source")
        // both sides unqualified is the same degenerate self-comparison
        // (the case guard already forces same names, so `col = col`
        // matches every source row) — reject it, not just the
        // same-qualifier shape
        require(sa != 'U' || sb != 'U',
          s"MERGE ON equality ${a.sql} = ${b.sql} is ambiguous — " +
            "qualify at least one side with the target or source alias " +
            "so the key relates target and source")
        a.nameParts.last
      case other => throw new IllegalArgumentException(
        "MERGE INTO graft.`root` supports ON as a conjunction of " +
          s"t.k = s.k equalities over same-named columns; got: ${other.sql}")
    }
  }

  /** Swap Spark's parsed DML commands for graft's runnable ones when the
    * target is a `graft`.`root` identifier; any other plan (including
    * DML on real catalog tables) passes through untouched. */
  private[graft] def rewriteDml(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case d: DeleteFromTable =>
        graftTarget(d.table) match {
          case Some((r, alias)) =>
            GraftDeleteCommand(r, asColumn(d.condition, alias))
          case None => d
        }
      case u: UpdateTable =>
        graftTarget(u.table) match {
          case Some((r, alias)) =>
            val set = u.assignments.map {
              case Assignment(key: UnresolvedAttribute, value) =>
                // only bare or alias-qualified TOP-LEVEL columns: a
                // mis-typed qualifier or a struct-field SET must error,
                // not silently write whatever the last name part hits
                val target = key.nameParts match {
                  case Seq(c) => c
                  case Seq(q, c) if alias.exists(_.equalsIgnoreCase(q)) => c
                  case _ => throw new IllegalArgumentException(
                    "UPDATE graft.`root` SET targets must be bare or " +
                      s"alias-qualified top-level columns; got: ${key.sql}" +
                      alias.fold("")(a => s" (table alias: $a)"))
                }
                target -> asColumn(value, alias)
              case other => throw new IllegalArgumentException(
                s"UPDATE graft.`root` SET targets must be columns; " +
                  s"got: ${other.sql}")
            }
            require(set.map(_._1).distinct.length == set.length,
              "duplicate column in UPDATE SET: " +
                set.map(_._1).mkString(", "))
            GraftUpdateCommand(r, set,
              u.condition.map(asColumn(_, alias)))
          case None => u
        }
      case m: MergeIntoTable =>
        graftTarget(m.targetTable) match {
          case Some((r, tAlias)) =>
            (m.matchedActions, m.notMatchedActions,
                m.notMatchedBySourceActions) match {
              case (Seq(UpdateStarAction(None)),
                    Seq(InsertStarAction(None)), Seq()) => ()
              case _ => throw new IllegalArgumentException(
                "MERGE INTO graft.`root` supports exactly WHEN MATCHED " +
                  "THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
                  "(the versioned upsert); for row-level conditions use " +
                  "UPDATE/DELETE statements")
            }
            val sAlias = m.sourceTable match {
              case SubqueryAlias(id, _) => Some(id.name)
              case u: UnresolvedRelation =>
                Some(u.multipartIdentifier.last)
              case _ => None
            }
            GraftMergeCommand(r, m.sourceTable,
              mergeKeys(m.mergeCondition, tAlias, sAlias),
              m.withSchemaEvolution)
          case None => m
        }
    }
}

/** `DELETE FROM graft.`root` WHERE p` — [[VersionedTable.deleteMatching]]:
  * physical rewrite of only the dirs the predicate's extracted facts
  * cannot clear. Returns the committed version. */
case class GraftDeleteCommand(root: String, condition: Column)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.deleteMatching(spark, root, condition)))
}

/** `UPDATE graft.`root` SET a = e [, ...] [WHERE p]` —
  * [[VersionedTable.updateMatching]] (OLD-row right-hand sides, CHECK
  * gating, index-cleared dirs keep byte-identity). */
case class GraftUpdateCommand(root: String, set: Seq[(String, Column)],
                              condition: Option[Column])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.updateMatching(spark, root,
      condition.getOrElse(lit(true)), set.toMap)))
}

/** `MERGE [WITH SCHEMA EVOLUTION] INTO graft.`root` t USING src s ON
  * t.k = s.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
  * INSERT *` — the versioned upsert with the ON columns as merge keys.
  * Partitioning comes from the existing manifest; stats/bloom coverage
  * is re-derived from what the current files carry, so the index family
  * survives SQL-driven ingest. The source must cover every table column
  * (SET * / INSERT * semantics); EXTRA source columns are rejected
  * unless WITH SCHEMA EVOLUTION, which admits them as new table columns
  * (older generations surface NULL through the evolution read path —
  * no rewrite, Delta's autoMerge behavior). */
case class GraftMergeCommand(root: String, source: LogicalPlan,
                             keys: Seq[String], schemaEvolution: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val m = VersionedTable.resolveManifest(spark, root, None)
    val (statsCols, bloomCols) = VersionedTable.coveredIndexCols(m)
    val src = PlanBridge.dataFrame(spark, source)
    val tableCols = m.schema.fieldNames.toSeq
    val missing = tableCols.filterNot(src.columns.contains)
    require(missing.isEmpty,
      s"MERGE source lacks table columns ${missing.mkString(", ")} — " +
        "UPDATE SET * / INSERT * need every target column")
    val extra = src.columns.toSeq.filterNot(tableCols.contains)
    require(extra.isEmpty || schemaEvolution,
      s"MERGE source carries columns not in the table: " +
        s"${extra.mkString(", ")} — use MERGE WITH SCHEMA EVOLUTION " +
        "INTO to add them")
    // table-order first, new columns appended: the committed schema
    // evolves deterministically instead of inheriting source order
    val aligned = src.select((tableCols ++ extra).map(src.col): _*)
    // upsert returns the EXACT version this merge committed — reading
    // currentVersion afterwards could report a concurrent disjoint
    // writer's later commit instead
    Seq(Row(VersionedTable.upsert(spark, root, aligned, keys, m.partCols,
      statsCols = statsCols, bloomCols = bloomCols)))
  }
}

/** `OPTIMIZE graft.`root` [ZORDER BY (c, ...)]` — full
  * [[VersionedTable.compact]] preserving (and re-clustering) the
  * manifest's index coverage. */
case class GraftOptimizeCommand(root: String, zOrderCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val m = VersionedTable.resolveManifest(spark, root, None)
    val (statsCols, bloomCols) = VersionedTable.coveredIndexCols(m)
    // z-dimensions join the stats set: clustering by a previously
    // unindexed column must also RECORD its min/max, or the rewrite
    // clusters perfectly and skips nothing
    Seq(Row(VersionedTable.compact(spark, root,
      statsCols = (statsCols ++ zOrderCols).distinct,
      bloomCols = bloomCols, zOrderCols = zOrderCols)))
  }
}

/** `VACUUM graft.`root` [RETAIN n VERSIONS]` (default 1: current only).
  * Returns the versions still readable afterwards. */
case class GraftVacuumCommand(root: String, keepVersions: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("versions_kept", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // no RETAIN clause -> the table's DECLARED policy
    // (graft.retain.versions) is the default, not keep-1: a bare VACUUM
    // must never silently retire time travel the table's own governance
    // promised to keep
    VersionedTable.vacuum(spark, root, keepVersions.getOrElse(
      VersionedTable.declaredRetention(spark, root).getOrElse(1)))
    Seq(Row(VersionedTable.history(spark, root).size))
  }
}

/** `VACUUM graft.`root` RETAIN n HOURS|DAYS` — age-based retention
  * ([[VersionedTable.vacuumOlderThan]]): retire versions whose commit
  * time is older than the window; the current version always
  * survives. The policy a scheduled job wants, independent of commit
  * rate. */
case class GraftVacuumAgeCommand(root: String, retainMs: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("versions_kept", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.vacuumOlderThan(spark, root, retainMs)
    Seq(Row(VersionedTable.history(spark, root).size))
  }
}

/** `RESTORE graft.`root` TO VERSION AS OF v` — commits a NEW version
  * whose content is version v (history stays append-only). */
case class GraftRestoreCommand(root: String, toVersion: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.restore(spark, root, toVersion)))
}

/** `ALTER TABLE graft.`root` SET TBLPROPERTIES('k'='v', ...)` —
  * [[VersionedTable.setProperties]]: metadata-only commit; the engine
  * honors `graft.retain.versions` in [[VersionedTable.maintain]]. */
case class GraftSetPropsCommand(root: String, kvs: Map[String, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.setProperties(spark, root, kvs)))
}

/** `ALTER TABLE graft.`root` UNSET TBLPROPERTIES('k', ...)`. */
case class GraftUnsetPropsCommand(root: String, ks: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.unsetProperties(spark, root, ks)))
}

/** `SHOW TBLPROPERTIES graft.`root`` — key/value rows. */
case class GraftShowPropsCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    VersionedTable.propertiesOf(spark, root).toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
}

/** `VACUUM graft.`root` [RETAIN n VERSIONS] DRY RUN` — what the real
  * vacuum would delete, one name per row, nothing deleted. */
case class GraftVacuumDryRunCommand(root: String, keepVersions: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("would_delete", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    VersionedTable.vacuumDryRun(spark, root, keepVersions.getOrElse(
      VersionedTable.declaredRetention(spark, root).getOrElse(1)))
      .map(Row(_))
}

/** `ALTER TABLE graft.`root` CREATE BRANCH dev [AS OF VERSION n]` —
  * [[VersionedTable.createBranch]]: a zero-copy fork; from then on
  * `graft.`root@dev`` / `graft_table('root@dev')` address the branch in
  * every statement. Returns the branch handle. */
case class GraftCreateBranchCommand(root: String, name: String,
                                    fromVersion: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("branch", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.createBranch(spark, root, name, fromVersion)))
}

/** `ALTER TABLE graft.`root` DROP BRANCH dev` —
  * [[VersionedTable.dropBranch]]. */
case class GraftDropBranchCommand(root: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("dropped", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.dropBranch(spark, root, name)
    Seq(Row(name))
  }
}

/** `ALTER TABLE graft.`root` FAST FORWARD BRANCH dev` —
  * [[VersionedTable.fastForward]]: publish the branch head back onto the
  * ref it forked from (write-audit-publish). Returns the new version. */
case class GraftFastForwardCommand(root: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.fastForward(spark, root, name)))
}

/** `SHOW BRANCHES [IN] graft.`root`` — branch name + head version +
  * recorded fork point per branch. */
case class GraftShowBranchesCommand(root: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("branch", StringType, nullable = false)(),
    AttributeReference("head_version", IntegerType, nullable = false)(),
    AttributeReference("forked_from", StringType, nullable = false)(),
    AttributeReference("fork_version", IntegerType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] =
    VersionedTable.listBranches(spark, root).map { b =>
      // compose from the PHYSICAL root: `root` may itself be a branch
      // handle and "path@dev@b" resolves to nothing
      val handle = s"${VersionedTable.splitRef(root)._1}@$b"
      val head = VersionedTable.currentVersion(spark, handle).getOrElse(-1)
      val fork = VersionedTable.forkOf(spark, handle)
      Seq(b, head, fork.map(_._1).filter(_.nonEmpty).getOrElse("main"),
        fork.map(f => Integer.valueOf(f._2)).orNull)
    }.map(Row.fromSeq)
}

/** `DESCRIBE DETAIL graft.`root`` — Delta's one-row table summary from
  * manifest metadata alone (zero data I/O): current version, partition
  * layout, derived-partition registrations, CHECK constraints, live
  * partition/row/byte totals (nulls where pre-index manifests lack
  * coverage), and merge-on-read DV rows awaiting materialization.
  * `graft_partitions('/root')` is the per-partition drilldown. */
case class GraftDetailCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("partition_cols", StringType, nullable = false)(),
    AttributeReference("derived_partitions", StringType,
      nullable = false)(),
    AttributeReference("constraints", StringType, nullable = false)(),
    AttributeReference("merge_keys", StringType, nullable = false)(),
    AttributeReference("num_partitions", IntegerType, nullable = false)(),
    AttributeReference("total_rows", LongType, nullable = true)(),
    AttributeReference("total_bytes", LongType, nullable = true)(),
    AttributeReference("dv_deleted_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // ONE manifest resolution for every field: per-accessor re-reads
    // both multiply metadata I/O and can interleave with a concurrent
    // commit, reporting version v with v+1's layout/rows
    val v = VersionedTable.currentVersion(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(
        s"no committed version at $root"))
    val parts = VersionedTable.partitionsMeta(spark, root, Some(v))
      .collect()
    val m = VersionedTable.resolveManifestAt(spark, root, v, v)
    val derived = m.derived.toSeq
      .sortBy(_._1).map { case (p, (kind, src)) => s"$p=$kind($src)" }
      .mkString(", ")
    val checks = m.checks.toSeq
      .sortBy(_._1).map { case (n, sql) => s"$n: $sql" }.mkString("; ")
    val partCols = m.partCols.mkString(", ")
    def total(i: Int): java.lang.Long =
      if (parts.exists(_.isNullAt(i))) null
      else java.lang.Long.valueOf(parts.map(_.getLong(i)).sum)
    val dv = parts.map(_.getLong(6)).sum
    val rows = total(3) match {
      case null => null
      case t => java.lang.Long.valueOf(t - dv) // live rows, like COUNT
    }
    Seq(Row(v, partCols, derived, checks, m.keys.mkString(", "),
      parts.length, rows, total(5), java.lang.Long.valueOf(dv)))
  }
}

/** `ALTER TABLE graft.`root` ADD DERIVED PARTITION p = day(src)` (or
  * `= bucket(N, src)`) — [[VersionedTable.addDerivedPartition]]:
  * metadata-only commit after the backlog check; from then on predicates
  * on `src` prune partition dirs and writes must keep p == transform. */
case class GraftAddDerivedCommand(root: String, partCol: String,
                                  transform: String, srcCol: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.addDerivedPartition(spark, root, partCol,
      transform, srcCol)))
}

/** `ALTER TABLE graft.`root` DROP DERIVED PARTITION p`. */
case class GraftDropDerivedCommand(root: String, partCol: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.dropDerivedPartition(spark, root, partCol)))
}

/** `CREATE MATERIALIZED VIEW graft.`/view` KEYED BY (k...) AS SELECT
  * g..., sum(x) AS a... FROM graft_table('/src') GROUP BY g...` —
  * [[graft.ops.MatView.create]]: defines the view and runs the one full
  * build; REFRESH then maintains it from the change feed. */
case class GraftMvCreateCommand(viewRoot: String, srcRoot: String,
                                keys: Seq[String], groups: Seq[String],
                                sums: Seq[(String, String)],
                                mins: Seq[(String, String)],
                                maxs: Seq[(String, String)],
                                countAlias: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.ops.MatView.create(spark, viewRoot, srcRoot, keys,
      groups, sums, mins, maxs, countAlias)))
}

/** `REFRESH MATERIALIZED VIEW graft.`/view`` —
  * [[graft.ops.MatView.refresh]]: advance to the source's current
  * version at change-volume cost. */
case class GraftMvRefreshCommand(viewRoot: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.ops.MatView.refresh(spark, viewRoot)))
}

/** `DESCRIBE HISTORY graft.`root`` — one row per still-committed version:
  * its commit instant (the `_commit.N` marker's create time) and LIVE
  * rows from manifest metadata via the same arithmetic the COUNT(*)
  * fold uses (deletion-vector rows subtracted; null when any live dir
  * predates per-dir row counts). No data files touched. */
case class GraftHistoryCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = true)(),
    AttributeReference("committed_at", TimestampType, nullable = false)(),
    AttributeReference("total_rows", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val cur = VersionedTable.currentVersion(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(
        s"no committed version at $root"))
    VersionedTable.historyDetail(spark, root).map { case (v, ms) =>
      val m = VersionedTable.resolveManifestAt(spark, root, v, cur)
      val rows = VersionedTable.manifestCount(m)
        .map(java.lang.Long.valueOf).orNull
      Row(v, m.op.orNull, new java.sql.Timestamp(ms), rows)
    }
  }
}
