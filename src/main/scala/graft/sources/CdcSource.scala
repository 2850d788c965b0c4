package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StringType, StructField,
  StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.VersionedTable
import graft.plans.GraftCatalog

/**
 * The READ side of the change feed as a first-class Structured
 * Streaming source:
 *
 * {{{
 *   spark.readStream.format("graft-cdc")
 *     .option("table", "metrics")          // registered name or path
 *     .load()                              // op, _commit_version, cols...
 *     .writeStream...
 * }}}
 *
 * completes the streaming-by-name story: [[graft.streaming
 * .StreamPipeline.startNamedInsert]] lands a stream INTO a named table,
 * and this source streams its committed changes OUT — the composable
 * replacement for the reference's poll-and-re-MERGE warehouse sync
 * (load_stream_to_snowflake.py:243-323), usable with any downstream
 * transform or sink instead of one hardwired callback
 * ([[graft.streaming.StreamPipeline.startChangeFeedStream]] remains the
 * callback flavor for at-least-once side effects).
 *
 * Mechanics (round 10): a full DSv2 stack — [[TableProvider]] →
 * [[Table]](MICRO_BATCH_READ) → [[Scan]] → [[MicroBatchStream]] with
 * [[SupportsTriggerAvailableNow]] (uniform AvailableNow drains) and
 * admission control via the [[ReadMaxVersions]] [[ReadLimit]] (the
 * engine round-trips `getDefaultReadLimit` into
 * `latestOffset(start, limit)`, so rate limiting rides the engine's own
 * batch-planning state). Offsets ARE committed table versions, so the
 * streaming checkpoint records "synced through version N" —
 * restart-exact, nothing re-read.
 *
 * Because a DSv2 `planInputPartitions` must return self-contained
 * partitions (it cannot serve the change feed's driver-planned
 * two-version manifest-diff JOIN directly, the reason Delta Lake's
 * source stayed V1), each micro-batch STAGES its diff as parquet under
 * the stream's own checkpoint metadata dir, then serves it through
 * Spark's standard bin-packed [[org.apache.spark.sql.execution
 * .datasources.FilePartition]]s and the vectorized parquet reader
 * ([[org.apache.spark.sql.graftbridge.FileStreamBridge]]). The staging
 * write is distributed and CHANGE-VOLUME sized (one extra
 * write+read of the batch's diff, never the table), deterministic per
 * (start, end] so crash-replayed batches reuse the staged files
 * (`_SUCCESS`-guarded), and staged dirs are purged at `commit(end)` —
 * steady-state disk holds only in-flight batches. The FIRST batch is
 * the whole table as `insert` rows pinned at one version (CDC initial
 * load) — attaching a consumer to a huge table should set
 * `startingVersion` to skip materializing that bootstrap snapshot, the
 * same advice Delta gives for backfill-free streams.
 *
 * Each micro-batch is [[VersionedTable.changeFeedCdf]] between the
 * checkpointed version and the current one: full CDF fidelity
 * (`insert` / `delete` / `update_preimage` / `update_postimage`), so
 * downstream decomposable state subtracts old and adds new in
 * O(|changes|). Idle micro-batch planning costs one commit-marker
 * listing; no data I/O. `_commit_version` stamps each row with its
 * BATCH-END version: a batch spanning several versions (consumer
 * catch-up) attributes every change to the newest one — net-effect
 * semantics, matching the diff the batch IS; set
 * `maxVersionsPerBatch=1` when exact per-commit attribution matters
 * (audit logs, per-version replay).
 *
 * `startingVersion`: an integer N means "changes AFTER version N";
 * 'latest' means "only commits after stream creation". The resolved
 * base persists to `<checkpoint>/sources/N/graft-cdc-base` at first
 * resolution (the Kafka-source initial-offset pattern), so a restart
 * before any batch commits can never re-resolve 'latest' PAST data
 * committed in between — the durable twin of the V1 source's empty
 * boundary batch.
 *
 * Scale shape: a batch's cost is the diff of the TOUCHED generations
 * (changedSideScans prunes untouched dirs) plus one staged copy of
 * that diff, never a full-table rescan — the property that lets a
 * 100 TB table feed a warehouse continuously. Size
 * [[VersionedTable.vacuum]] retention to the trigger cadence so
 * checkpointed versions stay readable across consumer downtime — the
 * zero-copy legs sharpen this: their batches read the table's LIVE
 * generation files directly for the batch's whole execution-and-replay
 * lifetime, so retention must also cover in-flight batches (a
 * compact+vacuum racing a running zero-copy batch fails it loudly,
 * where a staged batch was immune once its copy landed).
 *
 * The served schema is pinned at stream construction (op +
 * _commit_version + the table's visible columns); columns added later
 * surface when the stream restarts, and a dropped served column fails
 * loudly rather than silently narrowing mid-stream.
 */
class CdcSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"

  /** The table's own shape is authoritative — user-supplied schemas are
    * refused by the engine when this is false. */
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    CdcSource.servedSchema(spark, CdcSource.rootOf(spark, options))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new CdcTable(schema, new CaseInsensitiveStringMap(properties))
}

/** Version-axis admission control: "at most `maxVersions` version
  * transitions past the batch base" — the [[ReadLimit]] carrier for
  * maxVersionsPerBatch, Delta's maxFilesPerTrigger idea expressed
  * through the engine's own contract ([[ReadLimit]] is an open
  * interface; the engine round-trips whatever `getDefaultReadLimit`
  * returns into `latestOffset(start, limit)`). */
case class ReadMaxVersions(maxVersions: Int) extends ReadLimit

private[sources] class CdcTable(served: StructType,
                                options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-cdc:${options.get("table")}"
  override def schema(): StructType = served
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new CdcScan(served, options)
  }
}

private[sources] class CdcScan(served: StructType,
                               options: CaseInsensitiveStringMap)
    extends Scan {
  override def readSchema(): StructType = served
  override def description(): String =
    s"graft-cdc change feed of ${options.get("table")} " +
      "(staged-parquet micro-batches)"

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream = {
    val spark = SparkSession.active
    val root = CdcSource.rootOf(spark, options)
    // startingVersion: begin past the initial load — an integer N means
    // "changes AFTER version N" (the offset convention), 'latest' means
    // "only commits after stream creation" (resolved NOW and persisted,
    // so a commit racing the start is not silently skipped by a later
    // resolution)
    val startingVersion = Option(options.get("startingVersion")).map {
      case v if v.equalsIgnoreCase("latest") =>
        VersionedTable.currentVersion(spark, root).getOrElse(-1).toLong
      case v => v.toLongOption.getOrElse(
        throw new IllegalArgumentException(
          s"startingVersion must be an integer version or 'latest': $v"))
    }
    // maxVersionsPerBatch: rate limit — a consumer restarted after long
    // downtime catches up N version transitions per micro-batch instead
    // of one giant diff (Delta's maxFilesPerTrigger idea on the version
    // axis); triggers keep firing until drained
    val maxPerBatch = Option(options.get("maxVersionsPerBatch")).map { v =>
      val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"maxVersionsPerBatch must be a positive integer: $v"))
      require(n >= 1, s"maxVersionsPerBatch must be >= 1: $n")
      n
    }
    // the PINNED schema the plan was bound to — re-resolving here could
    // diverge from Scan.readSchema() when a commit widens the table
    // between analysis and stream start
    new CdcMicroBatchStream(spark, root, served, startingVersion,
      maxPerBatch, checkpointLocation)
  }
}

private[sources] object CdcSource {
  /** `table` option -> root path: registered names resolve with batch
    * SQL's shadowing rules; paths pass through. */
  def rootOf(spark: SparkSession, options: CaseInsensitiveStringMap)
      : String =
    GraftCatalog.resolveTableRef(spark,
      Option(options.get("table")).getOrElse(
        throw new IllegalArgumentException(
          "graft-cdc requires .option(\"table\", <registered name or " +
            "path>)")))

  /** op + _commit_version + the table's VISIBLE columns, from the
    * committed manifest (or a never-written table's declared schema). */
  def servedSchema(spark: SparkSession, root: String): StructType = {
    val table = VersionedTable.currentVersion(spark, root) match {
      case Some(v) =>
        VersionedTable.resolveManifestAt(spark, root, v, v).schema
      case None =>
        GraftCatalog.list(spark)
          .find(_.root == VersionedTable.splitRef(root)._1)
          .flatMap(_.schemaDdl).map(StructType.fromDDL)
          .getOrElse(throw new java.io.FileNotFoundException(
            s"no committed version at $root (and no declared schema)"))
    }
    // the synthesized columns claim two names — a table using them
    // would be silently overwritten (or ambiguous), so refuse loudly
    Seq("op", "_commit_version").foreach(r =>
      require(!table.fieldNames.exists(_.equalsIgnoreCase(r)),
        s"graft-cdc reserves the column name '$r' — the table at " +
          s"$root has one; rename it to stream its changes"))
    StructType(
      StructField("op", StringType, nullable = false) +:
        StructField("_commit_version", IntegerType, nullable = false) +:
        table.fields.toSeq.filterNot(_.name.startsWith("__"))
          .map(f => StructField(f.name, f.dataType, nullable = true)))
  }
}

private[sources] class CdcMicroBatchStream(spark: SparkSession,
    root: String, served: StructType, startingVersion: Option[Long],
    maxVersionsPerBatch: Option[Int], checkpointLocation: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val fs = new Path(checkpointLocation)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The stream's base version, durable from the FIRST run even when no
    * batch ever commits: without this, a restart would re-resolve
    * 'latest' past commits that landed between runs and silently skip
    * them (the V1 source checkpointed the base via an empty boundary
    * batch; DSv2 constructs no batch when there is no data, so the base
    * persists here instead — Kafka's initial-offset metadata pattern). */
  private val resolvedBase: Long = {
    val p = new Path(checkpointLocation, "graft-cdc-base")
    def readBack(): Long = {
      val in = fs.open(p)
      val out = new java.io.ByteArrayOutputStream()
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      finally in.close()
      new String(out.toByteArray, StandardCharsets.UTF_8).trim.toLong
    }
    if (fs.exists(p)) readBack()
    else {
      val v = startingVersion.getOrElse(-1L)
      // write-tmp-then-rename, the marker discipline every other
      // cursor in this engine uses: a crash can never leave a torn
      // half-written base that wedges all later runs
      val tmp = new Path(p.toString + ".tmp")
      fs.delete(tmp, false)
      val out = fs.create(tmp, false)
      try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (fs.rename(tmp, p)) v
      else { fs.delete(tmp, false); readBack() } // lost a (re)start race
    }
  }

  /** Zero-copy snapshot wing, laid out at stream construction from the
    * table's current partitioning: when the initial-load version's
    * manifest needs no schema-level fidelity machinery (no renames /
    * default backfills — [[VersionedTable.rawSnapshotFiles]]), the
    * first batch serves the table's OWN live parquet files directly
    * instead of staging a full snapshot copy, with (op,
    * _commit_version, visible partition cols) injected as per-file
    * constants and the output permuted to the served order. Deletion
    * vectors no longer force staging: a DV-carrying file becomes a
    * single-file row-path partition whose reader skips the deleted
    * row indices in-plan ([[org.apache.spark.sql.graftbridge
    * .FileStreamBridge.CdcSnapshotDvPartition]]).
    * Fields: (full partition schema — the equality guard against a
    * layout change between construction and the first batch, visible
    * partition schema, visible indices within partCols, the snapshot
    * reader factory, served-order permutation). None → every batch
    * stages (never-written table, or a layout this wing cannot serve —
    * the staged path applies full read fidelity). */
  private val snapWing: Option[(StructType, StructType, Seq[Int],
      org.apache.spark.sql.connector.read.PartitionReaderFactory,
      Array[Int])] =
    VersionedTable.currentVersion(spark, root).map { _ =>
      val m = VersionedTable.resolveManifest(spark, root, None)
      val visibleIdx = m.partCols.zipWithIndex
        .filterNot(_._1.startsWith("__")).map(_._2)
      val visibleParts = StructType(visibleIdx.map(i =>
        m.schema(m.partCols(i)).copy(nullable = true)))
      val readData = StructType(served.fields.toSeq.filter(f =>
        f.name != "op" && f.name != "_commit_version" &&
          !m.partCols.contains(f.name)))
      val partReader = StructType(
        StructField("op", StringType, nullable = false) +:
          StructField("_commit_version", IntegerType, nullable = false) +:
          visibleParts.fields.toSeq)
      val inputIdx = (readData.fieldNames ++ partReader.fieldNames)
        .zipWithIndex.toMap
      val perm = served.fields.map(f => inputIdx(f.name))
      (StructType(m.partCols.map(c => m.schema(c))), visibleParts,
        visibleIdx,
        org.apache.spark.sql.graftbridge.FileStreamBridge
          .parquetReaderFactory(spark, readData, partReader),
        perm)
    }

  /** Trigger.AvailableNow pins its END here (the engine would otherwise
    * keep draining a table that commits concurrently); commits landing
    * after the prepare are the next run's. */
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      VersionedTable.currentVersion(spark, root).map(_.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerBatch.map(ReadMaxVersions(_))
      .getOrElse(ReadLimit.allAvailable())

  /** The version cap a ReadLimit implies, if any — ReadMaxVersions
    * applies to the version axis; row/file limits don't (a version is
    * the atomic diff unit), and composite limits scan for the
    * version-axis member. */
  private def versionCap(limit: ReadLimit): Option[Int] = limit match {
    case ReadMaxVersions(n) => Some(n)
    case c: org.apache.spark.sql.connector.read.streaming
        .CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(versionCap).sorted.headOption
    case _ => None
  }

  private def version(o: OffsetV2): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  override def initialOffset(): OffsetV2 = LongOffset(resolvedBase)
  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)
  override def latestOffset(): OffsetV2 = throw new IllegalStateException(
    "graft-cdc implements SupportsAdmissionControl — the engine calls " +
      "latestOffset(start, limit)")

  /** The table's current committed version IS the latest offset (one
    * marker listing per trigger, no data I/O), capped at the ReadLimit's
    * version transitions past the batch base and clamped so the stream
    * never regresses below the configured startingVersion. A
    * not-yet-written table is "no data yet" (start returned unchanged),
    * not an error: the stream starts delivering at its first commit. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val base = Option(start).map(version).getOrElse(resolvedBase)
    VersionedTable.currentVersion(spark, root) match {
      case Some(cur0) =>
        val cur = availableNowTarget.fold(cur0.toLong)(
          math.min(cur0.toLong, _))
        val capped = versionCap(limit).fold(cur)(n =>
          math.min(cur, math.max(base, -1L) + n))
        LongOffset(Seq(capped, base, resolvedBase).max)
      case None => Option(start).getOrElse(LongOffset(resolvedBase))
    }
  }

  /** The (from, to] diff as a batch frame — initial load below v0, the
    * CDF diff otherwise, stamped and cast to the PINNED schema (a
    * widened column must not change the stream's shape mid-run). */
  private def batchFrame(from: Long, to: Int): DataFrame = {
    val feed =
      if (from < 0L) {
        // CDC initial load, PINNED at `to` (the version the checkpoint
        // will record): the whole table as insert rows
        val t = VersionedTable.read(spark, root, Some(to))
        t.select(lit("insert").as("op") +: t.columns.map(col): _*)
      } else {
        val m = VersionedTable.resolveManifestAt(spark, root, to, to)
        VersionedTable.changeFeedCdf(spark, root, m.keys, from.toInt, to)
      }
    val missing = served.fieldNames.toSeq
      .filterNot(c => c == "op" || c == "_commit_version")
      .filterNot(feed.columns.contains)
    require(missing.isEmpty,
      s"graft-cdc stream schema lost column(s) ${missing.mkString(", ")}" +
        s" at version $to of $root — restart the stream to pick up the " +
        "table's new shape")
    feed.withColumn("_commit_version", lit(to))
      .select(served.fields.toSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  private def stagedRoot = new Path(checkpointLocation, "staged")

  /** Stage the (from, to] diff as parquet, `_SUCCESS`-guarded so a
    * crash-replayed batch reuses the already-staged files (the diff is
    * deterministic per version pair, so a re-stage is equivalent — this
    * guard only saves the work). */
  private def stage(from: Long, to: Int)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val dir = new Path(stagedRoot, s"${from}_$to")
    if (!fs.exists(new Path(dir, "_SUCCESS"))) {
      fs.delete(dir, true)
      batchFrame(from, to).write.mode("overwrite").parquet(dir.toString)
    }
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
  }

  override def planInputPartitions(start: OffsetV2, end: OffsetV2)
      : Array[InputPartition] = {
    val (from, to) = (version(start), version(end))
    if (from >= to) return Array.empty
    // ZERO-COPY legs: the initial load (below v0) serves the pinned
    // snapshot's OWN live files when they ARE the snapshot (deletion
    // vectors apply IN-PLAN — DV files read row-path with their
    // positions skipped), and an APPEND-ONLY transition (the
    // streaming-ingest shape: whole new partition dirs, nothing else
    // touched) serves exactly the new dirs' files — never a staged
    // copy. Renames/defaults, a general diff, or a layout drifted from
    // construction falls back to staging through the read path.
    snapWing.foreach { case (fullPs, vps, vIdx, _, _) =>
      val raw =
        if (from < 0L)
          VersionedTable.rawSnapshotFiles(spark, root, to.toInt)
        else
          VersionedTable.rawAppendDiffFiles(spark, root, from.toInt,
            to.toInt)
      raw.foreach {
        case (files, ps, schemaAtTo) if ps == fullPs &&
            servedMatches(schemaAtTo) =>
          return org.apache.spark.sql.graftbridge.FileStreamBridge
            .cdcSnapshotPartitions(spark,
              files.map { case (p, l, mt, vals, dv) =>
                (p, l, mt, vIdx.map(vals), dv) },
              vps, "insert", to.toInt)
        case _ => ()
      }
    }
    val files = stage(from, to.toInt)
    org.apache.spark.sql.graftbridge.FileStreamBridge.parquetPartitions(
      spark, files.map(s =>
        (s.getPath.toString, s.getLen, s.getModificationTime)))
  }

  /** Every served data column still present at the batch version with
    * its PINNED type — otherwise the zero-copy read could silently
    * null a dropped column or mis-type a widened one where the staged
    * path casts (or fails loudly). */
  private def servedMatches(schemaAtTo: StructType): Boolean =
    served.fields.forall(f =>
      f.name == "op" || f.name == "_commit_version" ||
        schemaAtTo.fields.exists(g =>
          g.name == f.name && g.dataType == f.dataType))

  override def createReaderFactory(): PartitionReaderFactory =
    org.apache.spark.sql.graftbridge.FileStreamBridge.cdcReaderFactory(
      org.apache.spark.sql.graftbridge.FileStreamBridge
        .parquetReaderFactory(spark, served),
      snapWing.map(_._4),
      snapWing.map(_._5).getOrElse(Array.empty),
      served.fields.map(_.dataType))

  /** Batch durably committed: its staged files (and any earlier
    * batch's) can never be re-planned — purge them so steady-state disk
    * holds only in-flight batches. */
  override def commit(end: OffsetV2): Unit = {
    val v = version(end)
    if (fs.exists(stagedRoot)) fs.listStatus(stagedRoot).foreach { s =>
      val parts = s.getPath.getName.split("_")
      if (parts.length == 2 &&
          parts(1).toLongOption.exists(_ <= v))
        fs.delete(s.getPath, true)
    }
  }

  override def stop(): Unit = ()
}
