package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-quality EXPECTATIONS on versioned tables: named row predicates
 * that gate every ingested delta like CHECK constraints do, but instead
 * of failing the write, violating rows are either silently DROPPED from
 * the batch or routed to a QUARANTINE table for triage (the Delta Live
 * Tables expect / expect_or_drop / quarantine shape; the reference's
 * pipelines hard-code the equivalent `filter(col(...).isNotNull)` QA
 * stanzas inline, transform_data.py-style — here the TABLE owns the
 * rule).
 *
 * Storage: one table property per expectation
 * (`graft.expect.<name>` = `mode \t b64(sql) \t b64(quarantineRoot)`),
 * so the registry rides the manifest's verbatim property carry through
 * every commit — time travel shows the rules in force at any version,
 * and no new manifest machinery is needed.
 *
 * Enforcement (inside [[VersionedTable]]'s staged write, after the
 * FAIL-mode CHECK gate):
 *  - the delta is flagged once per expectation (ANSI CHECK semantics:
 *    NULL passes, only definite FALSE violates) and localCheckpointed —
 *    ONE delta-sized materialization, change-volume priced, zero cost
 *    for tables with no expectations;
 *  - per-expectation violation counts land in [[lastGateCounts]]
 *    (thread-local, the lastFullRecompute contract);
 *  - QUARANTINE rows upsert into the quarantine table keyed by the
 *    source's merge keys + the expectation name, partitioned by
 *    expectation — a replayed batch re-quarantines the SAME rows
 *    idempotently (at-least-once capture, exactly-once contents);
 *  - UPDATEs treat every expectation as FAIL-mode: an update driving
 *    a surviving row into violation aborts loudly (dropping a row
 *    mid-rewrite would silently shrink the table).
 *
 * Existing rows are NOT retroactively gated when an expectation is
 * registered (it prices the change stream, not the backlog); use
 * `deleteWhere` for retroactive cleanup.
 *
 * Coverage: every path through the staged upsert — plain upserts,
 * INSERT/overwrite, streaming merges — and EVERY leg of MERGE with one
 * uniform semantic (round 10): a violating candidate row never enters
 * the table. A violating INSERT vanishes or quarantines; a violating
 * matched/by-source REWRITE reverts to its old row (quarantining the
 * post-image); DELETE legs write no row and are not gated
 * ([[gateMergeResult]]). updateWhere stays FAIL-mode deliberately — an
 * explicit UPDATE driving a surviving row into violation aborts loudly
 * rather than silently discarding the user's statement.
 */
object Expectations {

  sealed abstract class Mode(val tag: String)
  /** Violating rows vanish from the write (counted, not kept). */
  case object DropRows extends Mode("drop")
  /** Violating rows route to a quarantine table instead of the write. */
  case object QuarantineRows extends Mode("quarantine")

  case class Expectation(name: String, sql: String, mode: Mode,
                         quarantineRoot: Option[String])

  private val KeyPrefix = "graft.expect."
  private val NameRe = "^[A-Za-z_][A-Za-z0-9_]*$".r
  /** Column added to quarantined rows: which expectation trapped them. */
  val ExpectationCol = "__expectation"

  private def b64e(s: String) = java.util.Base64.getEncoder
    .encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def b64d(s: String) =
    new String(java.util.Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** Register an expectation. The predicate must resolve against the
    * table's current schema NOW (a bad expr crashing the next ingest is
    * the wrong place to find out); the quarantine table itself is
    * created lazily by the first violation. */
  def add(spark: SparkSession, root: String, name: String, sql: String,
          mode: Mode, quarantineRoot: Option[String] = None): Int = {
    require(NameRe.findFirstIn(name).isDefined,
      s"expectation name must be an identifier: '$name'")
    mode match {
      case DropRows => require(quarantineRoot.isEmpty,
        "ON VIOLATION DROP takes no quarantine table")
      case QuarantineRows =>
        require(quarantineRoot.exists(_.nonEmpty),
          "ON VIOLATION QUARANTINE needs a quarantine table root")
        require(quarantineRoot.get != root,
          "a table cannot quarantine into itself")
    }
    require(!list(spark, root).exists(_.name == name),
      s"expectation $name already exists on $root")
    // resolution probe: zero rows, full analysis
    VersionedTable.read(spark, root).limit(0)
      .filter(not(coalesce(expr(sql), lit(true)))).collect()
    // an EXISTING quarantine table must match the shape the gate writes
    // (partitioned by the expectation name, keyed by the source's merge
    // keys + it) — refusing NOW beats crashing the first violating
    // ingest, the same reason the predicate probes above
    quarantineRoot.foreach { q =>
      if (VersionedTable.currentVersion(spark, q).isDefined) {
        val qm = VersionedTable.resolveManifest(spark, q, None)
        val want =
          VersionedTable.resolveManifest(spark, root, None).keys :+
            ExpectationCol
        require(qm.partCols == Seq(ExpectationCol),
          s"quarantine table $q is partitioned by " +
            s"(${qm.partCols.mkString(", ")}) — the gate writes " +
            s"partitioned by ($ExpectationCol); pick a fresh table")
        require(qm.keys == want,
          s"quarantine table $q records merge keys " +
            s"(${qm.keys.mkString(", ")}) — the gate writes keyed by " +
            s"(${want.mkString(", ")}); pick a fresh table")
      }
    }
    VersionedTable.setProperties(spark, root, Map(KeyPrefix + name ->
      (mode.tag + "\t" + b64e(sql) + "\t" +
        quarantineRoot.map(b64e).getOrElse("-"))))
  }

  /** Remove an expectation — loud if it does not exist. */
  def drop(spark: SparkSession, root: String, name: String): Int = {
    require(list(spark, root).exists(_.name == name),
      s"expectation $name does not exist on $root")
    VersionedTable.unsetProperties(spark, root, Seq(KeyPrefix + name))
  }

  /** The expectations in force at the current (or as-of) version. */
  def list(spark: SparkSession, root: String,
           asOfVersion: Option[Int] = None): Seq[Expectation] =
    fromProps(VersionedTable.propertiesOf(spark, root, asOfVersion))

  private[graft] def fromProps(props: Map[String, String]): Seq[Expectation] =
    props.collect { case (k, v) if k.startsWith(KeyPrefix) =>
      val parts = v.split("\t", -1)
      require(parts.length == 3, s"malformed expectation property $k: $v")
      val mode = parts(0) match {
        case DropRows.tag => DropRows
        case QuarantineRows.tag => QuarantineRows
        case other => throw new IllegalArgumentException(
          s"unknown expectation mode '$other' in property $k")
      }
      Expectation(k.stripPrefix(KeyPrefix), b64d(parts(1)), mode,
        if (parts(2) == "-") None else Some(b64d(parts(2))))
    }.toSeq.sortBy(_.name)

  /** Expectations re-expressed as FAIL gates (for UPDATE paths, where
    * dropping the rewritten row is not a meaningful semantics). */
  private[graft] def failGatesFor(props: Map[String, String])
      : Map[String, String] =
    fromProps(props).map(e => s"expectation:${e.name}" -> e.sql).toMap

  /** Null-fill committed columns a delta omits so gate predicates
    * resolve (those rows land NULL there; NULL passes, the ANSI CHECK
    * rule) — shared by the expectation gate and the CHECK gate. */
  private[graft] def alignToSchema(df: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    schema.filterNot(f => df.columns.contains(f.name))
      .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))

  private val counts = new ThreadLocal[Map[String, Long]] {
    override def initialValue(): Map[String, Long] = Map.empty
  }
  /** Per-expectation violation counts of the LAST gated write on this
    * thread (empty map when the table has no expectations). */
  def lastGateCounts: Map[String, Long] = counts.get()

  /** Reset the thread's gate counts — called by write paths that run NO
    * gate (first commit of a fresh table) so a previous gated write on
    * this thread can never leak its counts into an unrelated commit's
    * #expectlog. */
  private[graft] def clearGateCounts(): Unit = counts.set(Map.empty)

  /** The persisted expectation EVENT LOG as a queryable relation: one
    * row per (commit, gated expectation) with the violation count that
    * commit's gate recorded (`#expectlog` manifest lines — zero counts
    * mean the gate ran clean; commits with no gate have no rows). The
    * DLT event-log shape, served from manifest metadata only — no data
    * files touched, cost O(versions). */
  def log(spark: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // resolve currentVersion ONCE: resolveManifest(_, _, Some(v)) re-runs
    // the commit-marker listing per version, O(versions^2) LIST calls on
    // object stores (GraftHistoryCommand's discipline). A table with no
    // commits yet has an empty log, not an error (matches the pre-hoist
    // behavior: historyDetail was simply empty)
    val rows = VersionedTable.currentVersion(spark, root) match {
      case None => Seq.empty[Row]
      case Some(cur) =>
        VersionedTable.historyDetail(spark, root).flatMap {
      case (v, ms) =>
        val m = VersionedTable.resolveManifestAt(spark, root, v, cur)
        val modes = fromProps(m.props).map(e => e.name -> e.mode.tag).toMap
        m.expectLog.toSeq.sortBy(_._1).map { case (name, n) =>
          Row(v, new java.sql.Timestamp(ms), name,
            modes.get(name).orNull, n)
        }
        }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("committed_at", TimestampType, nullable = false),
        StructField("expectation", StringType, nullable = false),
        StructField("mode", StringType, nullable = true),
        StructField("violations", LongType, nullable = false))))
  }

  /** The write-path gate: returns the delta minus violating rows, after
    * routing quarantined rows and recording counts. Called by
    * [[VersionedTable]] inside the staged write, after FAIL-mode CHECK
    * constraints passed. No expectations → the delta passes through
    * untouched (no materialization). */
  private[graft] def gateDelta(spark: SparkSession, updates: DataFrame,
                               pm: VersionedTable.Manifest): DataFrame = {
    val exps = fromProps(pm.props)
    if (exps.isEmpty) { counts.set(Map.empty); return updates }
    val missing = pm.schema
      .filterNot(f => updates.columns.contains(f.name)).toSeq
    val aligned = alignToSchema(updates, pm.schema)
    val flags = exps.map(e => s"__exp_${e.name}")
    // smallQuery: a delta-sized gate plans statically (checkpoint +
    // count = 2 one-job actions instead of one job per AQE stage)
    val flagged = VersionedTable.smallQuery(
      exps.zip(flags).foldLeft(aligned) { case (d, (e, fc)) =>
        d.withColumn(fc, not(coalesce(expr(e.sql), lit(true))))
      }).localCheckpoint() // ONE delta-sized materialization, reused below
    val cntRow = flagged
      .agg(sum(col(flags.head).cast("long")).as(flags.head),
        flags.tail.map(f => sum(col(f).cast("long")).as(f)): _*)
      .collect()(0)
    val cnts = flags.indices.map(i =>
      if (cntRow.isNullAt(i)) 0L else cntRow.getLong(i))
    val junk = flags ++ missing.map(_.name)
    exps.zip(flags).zip(cnts).foreach { case ((e, fc), c) =>
      if (e.mode == QuarantineRows && c > 0) {
        val q = e.quarantineRoot.get
        VersionedTable.upsert(spark, q,
          flagged.filter(col(fc)).drop(junk: _*)
            .withColumn(ExpectationCol, lit(e.name)),
          quarantineKeys(spark, q, pm), Seq(ExpectationCol))
      }
    }
    // counts land AFTER the quarantine upserts: those recurse into
    // gateDelta for the (expectation-free) quarantine table, whose
    // early-return would otherwise clobber this thread's map with empty
    counts.set(exps.map(_.name).zip(cnts).toMap)
    // serve the KEPT rows from the checkpoint either way — the staging
    // write then reads materialized blocks instead of replaying the
    // caller's lineage
    if (cnts.forall(_ == 0L)) flagged.drop(junk: _*)
    else flagged.filter(!flags.map(col).reduce(_ or _)).drop(junk: _*)
  }

  /** Quarantine keying must be STABLE across calls for the replay-
    * idempotency guarantee: an existing quarantine keeps ITS OWN
    * recorded keys; a fresh one is keyed by the main table's recorded
    * keys (what [[add]] validated) — never a caller's per-call keys,
    * which can drift between upserts. */
  private def quarantineKeys(spark: SparkSession, q: String,
      pm: VersionedTable.Manifest): Seq[String] =
    VersionedTable.currentVersion(spark, q) match {
      case Some(_) => VersionedTable.resolveManifest(spark, q, None).keys
      case None => pm.keys :+ ExpectationCol
    }

  /** The MERGE-path gate — [[gateDelta]]'s twin for
    * [[VersionedTable.mergeClauses]]. `posted` is the (checkpointed)
    * post-image of the touched dirs carrying `__m_changed` /
    * `__m_inserted` flags and each row's pre-image under `__o_<col>`
    * (NULL for inserts). Only CHANGED rows gate (never retroactive);
    * a violating insert vanishes (or quarantines its post-image), a
    * violating rewrite reverts to its old row (same quarantine
    * routing) — the upsert leg's "a violating candidate row never
    * enters" semantic, uniform across every MERGE leg. Returns the
    * frame to stage (table columns only) and records
    * [[lastGateCounts]]. */
  private[graft] def gateMergeResult(spark: SparkSession,
      posted: DataFrame, tableCols: Seq[String],
      pm: VersionedTable.Manifest): DataFrame = {
    val exps = fromProps(pm.props)
    if (exps.isEmpty) {
      counts.set(Map.empty)
      return posted.select(tableCols.map(col): _*)
    }
    val flags = exps.map(e => s"__exp_${e.name}")
    val flagged = exps.zip(flags).foldLeft(posted) { case (d, (e, fc)) =>
      d.withColumn(fc,
        col("__m_changed") && not(coalesce(expr(e.sql), lit(true))))
    }
    val cntRow = VersionedTable.smallQuery(flagged
      .agg(sum(col(flags.head).cast("long")).as(flags.head),
        flags.tail.map(f => sum(col(f).cast("long")).as(f)): _*))
      .collect()(0)
    val cnts = flags.indices.map(i =>
      if (cntRow.isNullAt(i)) 0L else cntRow.getLong(i))
    exps.zip(flags).zip(cnts).foreach { case ((e, fc), c) =>
      if (e.mode == QuarantineRows && c > 0) {
        val q = e.quarantineRoot.get
        VersionedTable.upsert(spark, q,
          flagged.filter(col(fc)).select(tableCols.map(col): _*)
            .withColumn(ExpectationCol, lit(e.name)),
          quarantineKeys(spark, q, pm), Seq(ExpectationCol))
      }
    }
    // counts AFTER the quarantine upserts, the gateDelta clobber rule
    counts.set(exps.map(_.name).zip(cnts).toMap)
    if (cnts.forall(_ == 0L)) flagged.select(tableCols.map(col): _*)
    else {
      val anyViol = flags.map(col).reduce(_ or _)
      flagged.filter(!(anyViol && col("__m_inserted")))
        .select(tableCols.map(c =>
          when(anyViol, col(s"__o_$c")).otherwise(col(c)).as(c)): _*)
    }
  }
}
