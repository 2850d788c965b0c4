package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/**
 * Cross-table consistency primitives — the reference's DAG loads TWO
 * warehouse tables per cycle (spark_stream_processor.py writes both
 * aggregates; load_stream_to_snowflake.py:243-323 MERGEs each), and
 * per-table cursors leave a crash window where one table is synced and
 * the other is not: a reader sees a MIXED snapshot. Two pieces close
 * it:
 *
 *  - [[snapshot]]: a VERSION VECTOR capture — every table's committed
 *    version resolved together (with a stability re-read: if no table
 *    moved between two passes, the vector corresponds to a real
 *    quiescent instant). [[Snapshot.read]] then serves every table
 *    pinned at its captured version, however far the tables move —
 *    repeated queries inside one snapshot can never mix versions.
 *  - [[syncChangesMulti]]: the multi-table [[VersionedTable
 *    .syncChanges]] — ONE cursor file holds the whole vector and
 *    advances by ONE atomic rename only after the consumer's `apply`
 *    returns for ALL tables' feeds. A crash anywhere before the
 *    promote replays the ENTIRE cycle from the same bases
 *    (at-least-once for the vector, exactly like the single-table
 *    contract) — there is no state in which table A's cursor moved
 *    and table B's did not.
 *
 * Scale shape: identical to the single-table legs — each table's feed
 * is a touched-generation diff, the cursor is one tiny file, and the
 * vector capture is one commit-marker listing per table (no data I/O).
 */
object MultiSync {

  /** A captured version vector. Reads serve EXACTLY these versions. */
  case class Snapshot(versions: Seq[(String, Int)]) {
    private val byRoot = versions.toMap
    def version(root: String): Int = byRoot.getOrElse(root,
      throw new NoSuchElementException(
        s"$root is not part of this snapshot (${versions.map(_._1)})"))
    /** The table pinned at its captured version — time travel, so the
      * read stays valid until vacuum retires the version. */
    def read(spark: SparkSession, root: String): DataFrame =
      VersionedTable.read(spark, root, Some(version(root)))
  }

  /** Capture a version vector over `roots`. Up to `passes` re-reads: a
    * pass that matches the previous one proves NO table committed in
    * between — the vector is a true quiescent instant. Under constant
    * concurrent writes the last pass is returned (each entry is still a
    * real committed version; cross-table quiescence simply never
    * existed to capture). */
  def snapshot(spark: SparkSession, roots: Seq[String],
               passes: Int = 3): Snapshot = {
    require(roots.nonEmpty, "snapshot of zero tables")
    require(roots.distinct.length == roots.length,
      s"duplicate table in snapshot: ${roots.mkString(", ")}")
    def pass(): Seq[(String, Int)] = roots.map(r =>
      r -> VersionedTable.currentVersion(spark, r).getOrElse(
        throw new java.io.FileNotFoundException(
          s"no committed version at $r")))
    var prev = pass()
    var i = 1
    while (i < passes) {
      val next = pass()
      if (next == prev) return Snapshot(next)
      prev = next
      i += 1
    }
    Snapshot(prev)
  }

  private def header = "#graft-synccursor\t1"

  private def renderVector(v: Seq[(String, Int)]): String =
    v.sortBy(_._1).map { case (r, ver) =>
      s"${SpecFile.b64e(r)}\t$ver" }
      .mkString(header + "\n", "\n", "\n")

  private def parseVector(text: String, at: String): Map[String, Int] = {
    val lines = text.split("\n").filter(_.nonEmpty)
    require(lines.headOption.exists(_.startsWith(header)),
      s"unrecognized sync cursor at $at")
    lines.drop(1).map { l =>
      val Array(r, v) = l.split("\t", 2)
      SpecFile.b64d(r) -> v.trim.toInt
    }.toMap
  }

  /** One sync cycle over several tables with ONE atomically-advanced
    * cursor vector. `apply` receives every table's feed for this cycle
    * (initial load as `insert` rows on the first cycle, the recorded-
    * keys change feed afterwards); the cursor promotes in one rename
    * only after it returns. Returns the per-table (from, to) advances,
    * or None when every table is already synced. Call in a loop until
    * None to drain a `maxVersions`-capped catch-up. */
  def syncChangesMulti(spark: SparkSession,
                       tables: Seq[(String, Seq[String])],
                       cursorPath: String,
                       maxVersions: Int = Int.MaxValue)
                      (apply: Map[String, DataFrame] => Unit)
      : Option[Map[String, (Int, Int)]] = {
    require(tables.nonEmpty, "sync of zero tables")
    require(tables.map(_._1).distinct.length == tables.length,
      s"duplicate table in sync: ${tables.map(_._1).mkString(", ")}")
    require(maxVersions >= 1, s"maxVersions must be >= 1: $maxVersions")
    val fs = VersionedTable.fsFor(spark, cursorPath)
    val cp = new Path(cursorPath)
    val tmp = new Path(cursorPath + ".tmp")
    // crash recovery (shared discipline with the single-table leg): a
    // complete .tmp promotes; a TORN first-cycle tmp is deleted so the
    // idempotent cycle replays instead of wedging every later call.
    // "Complete" requires the parsed vector to cover EXACTLY this
    // call's table set — a tmp truncated at a line boundary parses as
    // a valid shorter vector, and promoting that prefix would wedge
    // every later call on the table-set-drift check below
    VersionedTable.recoverCursor(fs, cp, tmp, txt =>
      scala.util.Try(parseVector(txt, cursorPath)).toOption
        .exists(_.keySet == tables.map(_._1).toSet))
    val targetVec = snapshot(spark, tables.map(_._1))
    val last: Map[String, Int] =
      if (!fs.exists(cp)) Map.empty
      else parseVector(SpecFile.readText(spark, cp, cursorPath),
        cursorPath)
    // refuse a cursor whose table set drifted from the call's — a
    // silently-reused cursor of OTHER tables would serve their bases
    if (last.nonEmpty)
      require(last.keySet == tables.map(_._1).toSet,
        s"sync cursor at $cursorPath tracks ${last.keySet}, not " +
          s"${tables.map(_._1).toSet} — one cursor per table set")
    val advances = tables.flatMap { case (root, _) =>
      val cur = targetVec.version(root)
      val from = last.get(root)
      if (from.contains(cur)) None
      else {
        val to = from.map(f =>
          math.min(cur.toLong, f.toLong + maxVersions).toInt)
          .getOrElse(cur)
        Some(root -> ((from.getOrElse(-1), to)))
      }
    }.toMap
    if (advances.isEmpty) return None
    // smallQuery on each feed: the consumer's probes/loads over a
    // change-sized feed plan statically (one job per action instead of
    // one per AQE stage); table-sized initial loads keep AQE via the
    // leaf-byte gate
    val feeds = tables.map { case (root, keys) =>
      root -> VersionedTable.smallQuery(advances.get(root) match {
        case None => // already synced: an EMPTY feed of the table's
          // change shape, so `apply` always sees every table
          VersionedTable.changeFeed(spark, root, keys,
            last(root), last(root))
        case Some((-1, to)) => // first cycle: initial load PINNED at
          // the version the cursor will record
          val t = VersionedTable.read(spark, root, Some(to))
          t.select(lit("insert").as("op") +: t.columns.map(col): _*)
        case Some((from, to)) =>
          VersionedTable.changeFeed(spark, root, keys, from, to)
      })
    }.toMap
    apply(feeds)
    // the new vector: advanced tables move to their `to`, already-
    // synced tables keep their recorded base
    val newVec = tables.map { case (root, _) =>
      root -> advances.get(root).map(_._2).getOrElse(last(root)) }
    // write-new-then-promote: ONE rename publishes the whole vector —
    // a crash at any earlier point leaves the old vector intact and
    // the next call replays the full cycle from the same bases
    fs.delete(tmp, false)
    val out = fs.create(tmp, false)
    try out.write(renderVector(newVec).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(cp, false)
    if (!fs.rename(tmp, cp))
      throw new java.io.IOException(s"cursor promote rename failed: $tmp")
    Some(advances)
  }

  // ===================================================== atomic write ==

  /** Test-only crash injection for [[upsertAtomic]]: called at the
    * named points `"intent:<markerPath>"`, `"staged:<root>"`,
    * `"decision:<markerPath>"`, `"published:<root>"`. Every point
    * carries the group's marker path or member root so an injection
    * can (and must) scope itself to ITS OWN transaction — the hook is
    * process-global, and an unscoped `p == "decision"` predicate fires
    * from every concurrently benched query's commits (the round-11
    * bench carried exactly that cross-query error).
    * A hook that throws [[SimulatedCrash]]
    * simulates PROCESS DEATH there — files on disk are exactly the
    * crash state (the in-process abort cleanup deliberately does not
    * run), and the next [[recoverAtomic]]/[[upsertAtomic]] must
    * complete or retract. */
  private[graft] var crashHook: String => Unit = _ => ()

  /** See [[crashHook]]. Extends IllegalStateException so existing
    * crash-window catches keep matching. */
  private[graft] class SimulatedCrash(msg: String)
      extends IllegalStateException(msg)

  // v2 markers: the header line carries the writing group's unique txn
  // id (`#graft-txnintent\t2\t<uuid>`), so every trailing delete and
  // every recovery action can be OWNER-GUARDED — a slow publisher whose
  // group a recovering peer already rolled forward can never delete the
  // SUCCESSOR group's markers (the round-10 protocol released the intent
  // at the decision point and deleted the decision unguarded, which let
  // exactly that interleaving strand a successor's crash durably mixed)
  private def intentHeader = "#graft-txnintent\t2"
  private def vectorHeader = "#graft-txnvector\t2"
  private def stagedHeader = "#graft-txnstaged\t1"

  private def stagedRec(markerPath: String, i: Int) =
    new Path(s"$markerPath.staged.$i")

  private def readText(fs: org.apache.hadoop.fs.FileSystem,
                       p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** The txn id from a v2 marker's header line (None: torn/legacy). */
  private def markerOwner(text: String): Option[String] = {
    val parts = text.split("\n").headOption.getOrElse("").split("\t")
    if (parts.length >= 3 && parts(0).startsWith("#graft-txn"))
      Some(parts(2))
    else None
  }

  /** Delete `p` only if its header names `txnId` — the trailing-cleanup
    * guard. Best-effort: a marker that vanished or fails to read belongs
    * to (or is being cleaned by) someone else; leftovers a transient
    * delete failure leaves are finished by the next recovery. */
  private def deleteIfOwned(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                            txnId: String): Unit =
    try {
      if (fs.exists(p) && markerOwner(readText(fs, p)).contains(txnId))
        fs.delete(p, false)
    } catch { case _: java.io.IOException => () }

  /** Every staged-record sidecar under `markerPath`, parsed. `purgeTmp`
    * deletes `.tmp` debris of a crashed record write in passing — set
    * ONLY from the grace-protected recovery branches: a read path (the
    * graft_txn_log TVF) deleting a tmp would abort a LIVE writer's
    * in-flight rename. */
  private def listStagedRecs(fs: org.apache.hadoop.fs.FileSystem,
                             markerPath: String,
                             purgeTmp: Boolean = false)
      : Seq[(Path, String)] =
    fs.globStatus(new Path(markerPath + ".staged.*")).toSeq.flatMap { s =>
      val p = s.getPath
      if (p.getName.endsWith(".tmp")) {
        if (purgeTmp) fs.delete(p, false)
        None
      } else scala.util.Try(readText(fs, p)).toOption.map(p -> _)
    }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                          text: String): Unit = {
    val tmp = new Path(p.toString + ".tmp")
    fs.delete(tmp, false)
    val out = fs.create(tmp, false)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"marker promote rename failed: $p")
  }

  /** Body lines of a marker. The header match is on the marker KIND
    * prefix, version-tolerant: a v1 marker left by a crashed round-10
    * binary must still roll forward (its body format is unchanged),
    * not wedge every later recovery on 'unrecognized marker'. */
  private def parseMarker(text: String, header: String, at: String)
      : Seq[Array[String]] = {
    val kind = header.split("\t")(0)
    val lines = text.split("\n").filter(_.nonEmpty)
    require(lines.headOption.exists(_.startsWith(kind)),
      s"unrecognized marker at $at")
    lines.drop(1).map(_.split("\t", 2)).toSeq
  }

  /** One write per table of an atomic group: (root, rows, merge keys,
    * partition cols, optional index coverage). */
  case class TableWrite(root: String, rows: DataFrame,
                        keys: Seq[String], partCols: Seq[String],
                        statsCols: Seq[String] = Nil,
                        bloomCols: Seq[String] = Nil)

  /** ATOMIC multi-table upsert — the write-side twin of
    * [[syncChangesMulti]]. The reference's DAG loads TWO warehouse
    * tables per cycle (load_stream_to_snowflake.py:243-323 +
    * load_to_snowflake.py:212-231), and a crash between the two MERGEs
    * publishes a mixed pair durably. Two-phase commit over the
    * engine's own stage/publish split closes it:
    *
    *  1. write an INTENT marker (create-exclusive claim, carrying a
    *     unique txn id) naming the group's tables;
    *  2. STAGE every table's upsert ([[VersionedTable.prepare]]: data
    *     written, manifest claimed, commit marker withheld — the claim
    *     doubles as a per-table write lock), recording each staged
    *     version in a per-member sidecar as staging proceeds;
    *  3. write the DECISION marker (one atomic rename recording the
    *     whole version vector + txn id) — THE commit point;
    *  4. publish every member's commit marker (idempotently — a
    *     recovering peer may be rolling the same decision forward);
    *     delete the markers, each delete OWNER-GUARDED by txn id, the
    *     intent last: a peer that rolled this group forward and started
    *     its own cycle can never have its fresh markers deleted by this
    *     writer's trailing cleanup.
    *
    * Crash recovery ([[recoverAtomic]], run automatically at the next
    * cycle): a decision marker rolls the group FORWARD (idempotent
    * publish of every unpublished member), an intent without a decision
    * rolls it BACK — retracting EXACTLY the staged versions the group's
    * sidecars recorded, never a concurrent plain writer's stage that
    * happens to sit at the same version number. Either way, the pair of tables can never
    * END UP with one table's write committed and the other's lost —
    * all-or-nothing durability. (Between the decision and the last
    * publish there is a bounded skew window; readers needing
    * cross-table consistency at every instant read through
    * [[snapshot]], whose stability re-read refuses exactly that
    * window.)
    *
    * Single-writer discipline per marker path + table set, like the
    * sync cursor: the rollback attributes a staged version to this
    * group's crashed cycle only through the group's own recorded
    * sidecars (plus the intent-age grace, renewed as staging
    * progresses).
    *
    * Scale shape: each member is one ordinary partition-pruned staged
    * upsert; the added cost is two tiny marker files per cycle. */
  def upsertAtomic(spark: SparkSession, writes: Seq[TableWrite],
                   markerPath: String): Map[String, Int] = {
    require(writes.nonEmpty, "atomic write of zero tables")
    require(writes.map(_.root).distinct.length == writes.length,
      s"duplicate table in atomic write: ${writes.map(_.root)}")
    val fs = VersionedTable.fsFor(spark, markerPath)
    val decision = new Path(markerPath)
    val intent = new Path(markerPath + ".intent")
    recoverAtomic(spark, markerPath)
    val txnId = java.util.UUID.randomUUID().toString
    // the intent is a CLAIM, taken create-exclusive: of two racing
    // groups over one marker path exactly one proceeds — the loser
    // conflicts loudly instead of the two mutually retracting each
    // other's live stages (recoverAtomic above already rolled back or
    // refused any pre-existing intent by age). Held through the WHOLE
    // cycle, publish phase included: a recovering peer that decides this
    // group crashed rolls it forward and deletes the markers itself, and
    // every trailing delete below is owner-guarded so a slow-but-live
    // writer can never remove a successor group's markers
    val out =
      try VersionedTable.createExclusive(fs, intent)
      catch { case _: java.io.IOException =>
        throw new VersionedTable.ConcurrentWriteConflictException(
          s"another atomic multi-table write holds $intent — " +
            "in flight, or crashed inside the recovery grace window; " +
            "retry after it completes or the grace elapses")
      }
    try out.write(writes.map(w => SpecFile.b64e(w.root))
      .mkString(s"$intentHeader\t$txnId\n", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    crashHook(s"intent:$markerPath")
    // grace heartbeat: a single member's prepare can run far longer
    // than the recovery grace (a large staged write), and renewing the
    // intent mtime only BETWEEN members leaves the live group
    // past-grace mid-stage — a concurrent BEGIN's recoverAll would
    // roll back its recorded stages under the writer's feet. A daemon
    // touches the intent every grace/3 while staging runs (setTimes is
    // best-effort: on stores without it the grace never renews, so
    // size spark.graft.txn.intentGraceMs above worst-case TOTAL
    // staging time there). The heartbeat stops once the decision
    // marker exists — from there recovery only rolls the group
    // FORWARD, which is safe to race.
    val graceMs = spark.conf
      .get("spark.graft.txn.intentGraceMs", "30000").toLong
    val hbStop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hb = new Thread(() => {
      // the interval must stay UNDER grace/3 for any configured grace —
      // a 1s floor against an 800ms grace would let the live intent age
      // past its window between touches, re-opening exactly the
      // mid-stage rollback this heartbeat closes; 50ms only bounds
      // busy-looping for degenerate sub-150ms graces
      val interval = math.max(graceMs / 3, 50L)
      while (!hbStop.get()) {
        hbStop.synchronized { hbStop.wait(interval) }
        if (!hbStop.get()) scala.util.Try(
          fs.setTimes(intent, System.currentTimeMillis(), -1))
      }
    }, s"graft-txn-heartbeat-${txnId.take(8)}")
    hb.setDaemon(true)
    hb.start()
    def stopHeartbeat(): Unit = {
      hbStop.set(true)
      hbStop.synchronized { hbStop.notifyAll() }
    }
    val done = Seq.newBuilder[(Int, String, Int)]
    val staged =
      // stopHeartbeat on EVERY exit, SimulatedCrash included: real
      // process death takes the daemon with it, but a test-simulated
      // crash leaves this JVM alive — a surviving heartbeat would
      // renew the dead group's grace forever and mask the recovery
      try writes.zipWithIndex.map { case (w, i) =>
        val v = VersionedTable.prepare(spark, w.root, w.rows, w.keys,
          w.partCols, statsCols = w.statsCols, bloomCols = w.bloomCols)
        // `done` BEFORE the sidecar write: an in-process failure of the
        // record write must retract THIS member's fresh stage too (the
        // delete of its not-yet-written sidecar is a no-op), or the
        // claim would orphan with the intent released below
        done += ((i, w.root, v))
        // record the staged version in its own sidecar BEFORE the next
        // member stages: crash rollback retracts EXACTLY these recorded
        // (root, version) pairs — never "whatever is staged at cur+1",
        // which could be a concurrent plain writer's live stage. The
        // touch also renews the intent's mtime so the recovery grace
        // window tracks staging PROGRESS, not just the claim instant
        writeMarker(fs, stagedRec(markerPath, i),
          s"$stagedHeader\t$txnId\n${SpecFile.b64e(w.root)}\t$v\n")
        scala.util.Try(
          fs.setTimes(intent, System.currentTimeMillis(), -1))
        crashHook(s"staged:${w.root}")
        w.root -> v
      } catch {
        case c: SimulatedCrash => throw c // process death: files stay
        case t: Throwable =>
          // in-process ABORT (constraint violation, bad frame): the
          // failing prepare retracted ITSELF; retract the earlier
          // members (and their records) and the intent so unrelated
          // writers are not left blocked behind this group's claims.
          // The intent deletes ONLY when every retraction succeeded — a
          // transient retraction failure must leave it for
          // recoverAtomic to retry, or the orphaned claim would block
          // the table with no automatic recovery path
          val allRetracted = done.result().forall { case (i, r, v) =>
            scala.util.Try {
              VersionedTable.retractStaged(spark, r, v)
              fs.delete(stagedRec(markerPath, i), false)
            }.isSuccess }
          if (allRetracted) fs.delete(intent, false)
          throw t
      } finally stopHeartbeat()
    writeMarker(fs, decision, staged.map { case (r, v) =>
      s"${SpecFile.b64e(r)}\t$v" }
      .mkString(s"$vectorHeader\t$txnId\n", "\n", "\n"))
    crashHook(s"decision:$markerPath")
    staged.foreach { case (root, v) =>
      // idempotent: a recovering peer may be rolling this same decision
      // forward concurrently — both publishers must see success
      VersionedTable.publishIdempotent(spark, root, v)
      crashHook(s"published:$root")
    }
    // cleanup order decision → records → intent, each owner-guarded; a
    // crash anywhere in it leaves a state the next recovery finishes
    // (decision present → roll forward no-ops then deletes; records
    // with published versions → skipped and deleted; bare intent →
    // deleted past grace)
    deleteIfOwned(fs, decision, txnId)
    writes.indices.foreach(i =>
      deleteIfOwned(fs, stagedRec(markerPath, i), txnId))
    deleteIfOwned(fs, intent, txnId)
    staged.toMap
  }

  /** Run [[recoverAtomic]] over every marker group under `dir` (the
    * SQL catalog's `_txn/`, or any directory API callers keep marker
    * paths in), completing crashed groups NOW instead of waiting for
    * the next COMMIT over the same table set: decisions roll forward,
    * aged intents roll back. Groups still inside the live-intent grace
    * are SKIPPED, not failed — a BEGIN must not abort on someone
    * else's in-flight transaction. Returns the recovered marker names.
    * Cost: one listStatus of `dir` plus marker-file reads — no data
    * I/O beyond what recovery itself publishes/retracts. */
  def recoverAll(spark: SparkSession, dir: String): Seq[String] = {
    val fs = VersionedTable.fsFor(spark, dir)
    val d = new Path(dir)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.map(_.getPath.getName).flatMap { n =>
      if (n.endsWith(".intent")) Some(n.stripSuffix(".intent"))
      else if (!n.contains(".")) Some(n)
      else None // staged records / tmp debris: owned by their group
    }.distinct.sorted.flatMap { base =>
      try {
        recoverAtomic(spark, new Path(d, base).toString)
        Some(base)
      } catch {
        case _: VersionedTable.ConcurrentWriteConflictException => None
      }
    }
  }

  /** Pending atomic-write groups under `dir` as a queryable relation —
    * one row per (group, member table): `state` is `decision`
    * (commit point durable; publish pending — the next recovery rolls
    * it FORWARD) or `intent` (pre-commit-point; rolled BACK once past
    * the grace), `version` the member's staged/recorded version (null
    * for an intent member that never recorded a stage), `published`
    * whether the member's commit marker exists. Marker metadata only —
    * no data I/O. Completed groups have no rows (their markers are
    * gone). */
  def txnLog(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val fs = VersionedTable.fsFor(spark, dir)
    val d = new Path(dir)
    val rows: Seq[Row] =
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d).toSeq.sortBy(_.getPath.getName).flatMap { st =>
        val n = st.getPath.getName
        val mt = new java.sql.Timestamp(st.getModificationTime)
        if (n.endsWith(".intent")) {
          val base = n.stripSuffix(".intent")
          val markerPath = new Path(d, base).toString
          if (fs.exists(new Path(d, base))) Nil // decision row covers it
          else {
            val txt = scala.util.Try(readText(fs, st.getPath))
              .getOrElse("")
            val staged: Map[String, Int] =
              listStagedRecs(fs, markerPath).flatMap { case (_, recTxt) =>
                scala.util.Try(
                  parseMarker(recTxt, stagedHeader, markerPath)).toOption
                  .toSeq.flatten.map { parts =>
                    SpecFile.b64d(parts(0)) -> parts(1).trim.toInt }
              }.toMap
            val members = scala.util.Try(
              parseMarker(txt, intentHeader, markerPath)).toOption
              .map(_.map(p => SpecFile.b64d(p(0))))
              .getOrElse(staged.keys.toSeq.sorted)
            members.map { r =>
              Row(base, markerOwner(txt).orNull, "intent", r,
                staged.get(r).map(Integer.valueOf).orNull,
                staged.get(r).fold(java.lang.Boolean.FALSE)(v =>
                  java.lang.Boolean.valueOf(
                    VersionedTable.isPublished(spark, r, v))), mt)
            }
          }
        } else if (!n.contains(".")) {
          val markerPath = st.getPath.toString
          val txt = scala.util.Try(readText(fs, st.getPath)).getOrElse("")
          scala.util.Try(parseMarker(txt, vectorHeader, markerPath))
            .toOption.toSeq.flatten.map { parts =>
              val (r, v) = (SpecFile.b64d(parts(0)), parts(1).trim.toInt)
              Row(n, markerOwner(txt).orNull, "decision", r,
                Integer.valueOf(v), java.lang.Boolean.valueOf(
                  VersionedTable.isPublished(spark, r, v)), mt)
            }
        } else Nil
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("marker", StringType, nullable = false),
        StructField("txn_id", StringType, nullable = true),
        StructField("state", StringType, nullable = false),
        StructField("table_root", StringType, nullable = false),
        StructField("version", IntegerType, nullable = true),
        StructField("published", BooleanType, nullable = true),
        StructField("modified_at", TimestampType, nullable = false))))
  }

  /** Complete or retract a crashed [[upsertAtomic]] cycle (idempotent;
    * called automatically by the next cycle). Decision marker present →
    * roll FORWARD: publish every unpublished member of the recorded
    * vector (safe concurrently, and safe against the decision's own
    * writer still being live — publishes go through the idempotent
    * variant and the live writer's trailing deletes are owner-guarded).
    * Intent without decision → roll BACK: retract exactly the staged
    * versions the group's per-member sidecars recorded, so the group's
    * claims release and the replayed cycle stages cleanly — but ONLY
    * once the intent is older than `spark.graft.txn.intentGraceMs`
    * (default 30 s, renewed after each member stages): a fresh intent
    * is presumed a LIVE concurrent group, and rolling back a live
    * group's stages mid-flight would corrupt it — conflict loudly
    * instead. A torn intent (crash mid-create, unparseable) past the
    * grace retracts whatever the sidecars recorded and deletes; a stage
    * claimed but never recorded (crash inside the record write) stays
    * as an orphaned claim for vacuum() — never mis-retracted. */
  def recoverAtomic(spark: SparkSession, markerPath: String): Unit = {
    val fs = VersionedTable.fsFor(spark, markerPath)
    val decision = new Path(markerPath)
    val intent = new Path(markerPath + ".intent")
    if (fs.exists(decision)) {
      // Try: a RACING recovery (two concurrent BEGINs sweep the same
      // catalog dir) may complete the roll-forward and delete the
      // marker between the exists probe and the read — vanished means
      // recovered, not an error
      scala.util.Try(readText(fs, decision)).toOption.foreach { txt =>
      val owner = markerOwner(txt)
      parseMarker(txt, vectorHeader, markerPath).foreach { parts =>
        val (root, v) = (SpecFile.b64d(parts(0)), parts(1).trim.toInt)
        if (!VersionedTable.isPublished(spark, root, v)) {
          require(VersionedTable.isStaged(spark, root, v),
            s"decision marker records $root v$v but its stage is gone " +
              "— storage corrupted or vacuumed mid-recovery")
          // idempotent: the group may be live mid-publish (rolling a
          // live group forward is harmless — same versions, and its
          // trailing deletes are owner-guarded no-ops after this), or
          // another recovery may be racing this one
          VersionedTable.publishIdempotent(spark, root, v)
        }
      }
      // publish-all FIRST, then delete decision → records → intent: a
      // crash mid-roll-forward leaves the decision, so the next
      // recovery continues FORWARD — the rollback branch below can
      // never see a group whose decision was acted on (its leftover
      // records name published versions, which it skips). The decision
      // delete is owner-guarded like the intent's: this recovery may
      // have stalled across a full successor cycle, and deleting the
      // SUCCESSOR's decision would strand its crash as a rollback of
      // a half-published group — the exact mixed-pair failure
      owner match {
        case Some(id) => deleteIfOwned(fs, decision, id)
        case None => fs.delete(decision, false) // legacy v1: no id
      }
      listStagedRecs(fs, markerPath, purgeTmp = true)
        .foreach { case (p, recTxt) =>
          if (owner.isEmpty || markerOwner(recTxt) == owner)
            fs.delete(p, false) }
      if (owner.isEmpty) fs.delete(intent, false)
      else deleteIfOwned(fs, intent, owner.get)
      }
    } else if (fs.exists(intent)) {
      val grace = spark.conf
        .get("spark.graft.txn.intentGraceMs", "30000").toLong
      // a racing recovery may delete the intent between the exists
      // probe and the stat — vanished means recovered, not an error
      val st = try fs.getFileStatus(intent)
        catch { case _: java.io.FileNotFoundException => return }
      val age = System.currentTimeMillis() - st.getModificationTime
      if (age < grace)
        throw new VersionedTable.ConcurrentWriteConflictException(
          s"an atomic multi-table write holds $intent (age ${age} ms " +
            s"< grace $grace ms) — in flight, or crashed moments ago; " +
            "retry after it completes or the grace elapses")
      val owner = scala.util.Try(readText(fs, intent)).toOption
        .flatMap(markerOwner)
      // roll BACK exactly what the crashed group RECORDED staging — its
      // per-member sidecars — never "whatever is staged at cur+1",
      // which a concurrent plain INSERT mid-stage at that version is
      // indistinguishable from. A stage the group claimed but crashed
      // before recording (the record write's rename window) stays put
      // as an orphaned claim vacuum() clears — the safe side of the
      // trade: a blocked table is loud and recoverable, a retracted
      // live writer is silent corruption. Published versions are
      // skipped (leftover records of a fully-rolled-forward group whose
      // cleanup crashed midway). A legacy v1 intent (no txn id, no
      // sidecars — a round-10 binary's crash) retracts nothing: its
      // stages become orphaned claims vacuum() clears, which blocks
      // loudly instead of guessing at cur+1 ownership
      listStagedRecs(fs, markerPath, purgeTmp = true)
        .foreach { case (p, recTxt) =>
        val matches = owner.isEmpty || markerOwner(recTxt) == owner
        if (matches) {
          scala.util.Try(
            parseMarker(recTxt, stagedHeader, p.toString)).foreach {
            _.foreach { parts =>
              val (root, v) = (SpecFile.b64d(parts(0)), parts(1).trim.toInt)
              if (VersionedTable.isStaged(spark, root, v) &&
                  !VersionedTable.isPublished(spark, root, v))
                VersionedTable.retractStaged(spark, root, v)
            }
          }
          // delete ONLY what this rollback owns, and re-check ownership
          // at delete time (deleteIfOwned re-reads): a sidecar owned by
          // a SUCCESSOR group — this recoverer may have stalled across
          // a completed recovery plus a fresh cycle — must survive, or
          // the successor's own crash rollback finds no record and
          // strands its stage as an orphaned claim
          owner match {
            case Some(id) => deleteIfOwned(fs, p, id)
            case None => fs.delete(p, false) // legacy v1: no id to check
          }
        }
      }
      // same at the intent: a stalled second recoverer deleting a
      // successor's LIVE intent would release its create-exclusive
      // claim and re-open the double-claim/mixed-pair scenario the v2
      // owner-guarded protocol exists to close (legacy v1 intents have
      // no owner to check — unguarded delete is all there is)
      owner match {
        case Some(id) => deleteIfOwned(fs, intent, id)
        case None => fs.delete(intent, false) // legacy v1: no id
      }
    }
  }
}
