package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset,
  SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister,
  StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField,
  StructType}

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
 * Mechanics: a V1 [[Source]] that opts into the ENGINE's v2 streaming
 * contracts where they carry weight — [[SupportsTriggerAvailableNow]]
 * (uniform AvailableNow drains) and admission control via a custom
 * [[ReadMaxVersions]] [[ReadLimit]] (the engine passes
 * `getDefaultReadLimit` back into `latestOffset(start, limit)` with
 * the checkpoint base, so rate limiting rides the engine's own
 * batch-planning state instead of a source-private cursor). The batch
 * tier itself stays V1 deliberately: `getBatch` returns a
 * DRIVER-planned DataFrame, which is exactly what the change feed is —
 * a two-version manifest diff JOIN whose sides are columnar parquet
 * scans over only the touched generations. A DSv2 MicroBatchStream's
 * `planInputPartitions` cannot express that join; the standard
 * workaround (stage each diff to files at plan time, serve a file
 * scan) DOUBLES the per-batch I/O — the same reason Delta Lake's
 * streaming source remains a V1 `Source`. The columnar property is
 * pinned by StreamingSpec (each micro-batch's physical plan bottoms
 * out in parquet scans), not traded away for the interface badge.
 * Offsets ARE committed table versions, so the streaming
 * checkpoint records "synced through version N" — restart-exact,
 * nothing re-read. Each micro-batch is [[VersionedTable.changeFeedCdf]]
 * between the checkpointed version and the current one: full CDF
 * fidelity (`insert` / `delete` / `update_preimage` /
 * `update_postimage`), so downstream decomposable state subtracts old
 * and adds new in O(|changes|). The FIRST batch is the whole table as
 * `insert` rows pinned at one version (CDC initial load). Idle
 * micro-batch planning costs one commit-marker listing; no data I/O.
 * `_commit_version` stamps each row with its BATCH-END version: a
 * batch spanning several versions (consumer catch-up) attributes every
 * change to the newest one — net-effect semantics, matching the diff
 * the batch IS; set `maxVersionsPerBatch=1` when exact per-commit
 * attribution matters (audit logs, per-version replay).
 *
 * Scale shape: a batch's cost is the diff of the TOUCHED generations
 * (changedSideScans prunes untouched dirs), never a full-table rescan —
 * the property that lets a 100 TB table feed a warehouse continuously.
 * Size [[VersionedTable.vacuum]] retention to the trigger cadence so
 * checkpointed versions stay readable across consumer downtime.
 *
 * The served schema is pinned at stream construction (op +
 * _commit_version + the table's visible columns); columns added later
 * surface when the stream restarts, and a dropped served column fails
 * loudly rather than silently narrowing mid-stream.
 */
class CdcSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    require(schema.isEmpty,
      "graft-cdc serves the table's own schema — do not pass one")
    (shortName(),
      CdcSource.servedSchema(sqlContext.sparkSession,
        CdcSource.rootOf(sqlContext.sparkSession, parameters)))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val root = CdcSource.rootOf(spark, parameters)
    // startingVersion: begin past the initial load — an integer N means
    // "changes AFTER version N" (the offset convention), 'latest' means
    // "only commits after stream creation" (resolved NOW, so a commit
    // racing the start is not silently skipped by a later resolution)
    val startingVersion = parameters.get("startingversion")
      .orElse(parameters.get("startingVersion")).map {
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
    val maxPerBatch = parameters.get("maxversionsperbatch")
      .orElse(parameters.get("maxVersionsPerBatch")).map { v =>
        val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"maxVersionsPerBatch must be a positive integer: $v"))
        require(n >= 1, s"maxVersionsPerBatch must be >= 1: $n")
        n
      }
    new CdcSource(spark, root, CdcSource.servedSchema(spark, root),
      startingVersion, maxPerBatch)
  }
}

/** Version-axis admission control: "at most `maxVersions` version
  * transitions past the batch base" — the [[ReadLimit]] carrier for
  * maxVersionsPerBatch, Delta's maxFilesPerTrigger idea expressed
  * through the engine's own contract ([[ReadLimit]] is an open
  * interface; the engine round-trips whatever `getDefaultReadLimit`
  * returns into `latestOffset(start, limit)`). */
case class ReadMaxVersions(maxVersions: Int)
    extends org.apache.spark.sql.connector.read.streaming.ReadLimit

private[sources] object CdcSource {
  /** `table` option -> root path: registered names resolve with batch
    * SQL's shadowing rules; paths pass through. */
  def rootOf(spark: SparkSession, parameters: Map[String, String]): String =
    GraftCatalog.resolveTableRef(spark,
      parameters.getOrElse("table", throw new IllegalArgumentException(
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

class CdcSource(spark: SparkSession, root: String,
                override val schema: StructType,
                startingVersion: Option[Long] = None,
                maxVersionsPerBatch: Option[Int] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow pins its END here (the engine would otherwise
    * snapshot ONE getOffset — a rate-limited drain would stop after the
    * first capped batch instead of catching up to the pinned target);
    * commits landing after the prepare are the next run's. */
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      VersionedTable.currentVersion(spark, root).map(_.toLong)

  /** The admission knob rides the ENGINE's ReadLimit contract: the
    * engine calls `latestOffset(checkpointBase, getDefaultReadLimit)`,
    * so the rate limit's base is the engine's own batch-planning state
    * — no source-private cursor can drift from the checkpoint. */
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    maxVersionsPerBatch.map(ReadMaxVersions(_)).getOrElse(
      org.apache.spark.sql.connector.read.streaming.ReadLimit
        .allAvailable())

  /** The version cap a ReadLimit implies, if any — ReadMaxVersions
    * applies to the version axis; row/file limits don't (a version is
    * the atomic diff unit), and composite limits scan for the
    * version-axis member. */
  private def versionCap(
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Option[Int] = limit match {
    case ReadMaxVersions(n) => Some(n)
    case c: org.apache.spark.sql.connector.read.streaming
        .CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(versionCap).sorted.headOption
    case _ => None
  }

  /** SupportsAdmissionControl's entry point (the engine uses it instead
    * of getOffset once SupportsTriggerAvailableNow is implemented).
    * Null = no data yet, per the contract. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val base: Long = Option(start).map {
      case LongOffset(v) => v
      case o => o.json.trim.toLong
    }.getOrElse(startingVersion.getOrElse(-1L))
    maxSeen = math.max(maxSeen, base)
    VersionedTable.currentVersion(spark, root) match {
      case Some(cur0) =>
        val cur = availableNowTarget.fold(cur0.toLong)(
          math.min(cur0.toLong, _))
        val capped = versionCap(limit).fold(cur)(n =>
          math.min(cur, math.max(base, -1L) + n))
        // never below the configured base (see getOffset)
        LongOffset(startingVersion.fold(capped)(math.max(capped, _)))
      case None => startingVersion.map(LongOffset(_)).orNull
    }
  }

  private def version(o: Offset): Int = o match {
    case LongOffset(v) => v.toInt
    case SerializedOffset(json) => json.trim.toInt
    case other => throw new IllegalStateException(
      s"unexpected offset type for graft-cdc: $other")
  }

  /** Highest offset this source has handed to the engine — the rate
    * limit's base. Re-initialized on restart by the engine's recovery
    * getBatch of the last batch (and advanced by commit callbacks), so
    * a capped getOffset can never fall BEHIND the checkpoint and stall
    * the stream. */
  @volatile private var maxSeen: Long = startingVersion.getOrElse(-1L)

  /** The table's current committed version IS the latest offset (one
    * marker listing per trigger, no data I/O), capped at
    * maxVersionsPerBatch transitions past the last delivered offset. A
    * not-yet-written table is "no data yet", not an error: the stream
    * starts delivering at its first commit. */
  override def getOffset: Option[Offset] =
    VersionedTable.currentVersion(spark, root) match {
      case Some(cur0) =>
        val cur = availableNowTarget.fold(cur0.toLong)(
          math.min(cur0.toLong, _))
        val capped = maxVersionsPerBatch.fold(cur)(m =>
          math.min(cur, math.max(maxSeen, -1L) + m))
        // never checkpoint BELOW the configured base: startingVersion=5
        // on a table still at v0 must not record offset 0 (later batches
        // would then deliver v0->v1 diffs the user explicitly excluded);
        // the boundary batch at the clamped offset is empty by the
        // from >= to rule in getBatch
        Some(LongOffset(startingVersion.fold(capped)(
          math.max(capped, _))))
      case None =>
        // never-written table: a configured startingVersion still
        // CHECKPOINTS its resolved base (-1 for 'latest') via an empty
        // boundary batch — otherwise a later run would re-resolve
        // 'latest' PAST data committed in between and silently skip it
        startingVersion.map(LongOffset(_))
    }
    // when current <= the configured startingVersion, the first batch
    // is an EMPTY boundary diff (from >= to) — deliberately never a
    // filter to None, so a RESTARTED stream's checkpoint always
    // outranks a re-resolved 'latest'

  override def commit(end: Offset): Unit =
    maxSeen = math.max(maxSeen, version(end).toLong)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = version(end)
    maxSeen = math.max(maxSeen, to.toLong)
    val feed = start.map(version).orElse(
        startingVersion.map(_.toInt)) match {
      case None =>
        // CDC initial load, PINNED at `to` (the version the checkpoint
        // will record): the whole table as insert rows
        val t = VersionedTable.read(spark, root, Some(to))
        t.select(lit("insert").as("op") +: t.columns.map(col): _*)
      case Some(from) if from >= to =>
        // boundary batch (startingVersion == current, or a
        // never-written table checkpointing its resolved base):
        // an EMPTY feed of the served shape, never a crash — the
        // checkpoint records `to` and later commits diff from there
        spark.createDataFrame(spark.sparkContext.emptyRDD[
          org.apache.spark.sql.Row],
          StructType(schema.fields.filterNot(f =>
            f.name == "op" || f.name == "_commit_version")
            .map(f => f.copy(nullable = true))))
          .select(lit("insert").as("op") +: schema.fieldNames.toSeq
            .filterNot(c => c == "op" || c == "_commit_version")
            .map(col): _*)
      case Some(from) if from < 0 =>
        // base = "before v0" ('latest' resolved on a then-empty table,
        // checkpointed as -1): everything since IS new — the diff from
        // before v0 is the whole table, the initial-load shape
        val t = VersionedTable.read(spark, root, Some(to))
        t.select(lit("insert").as("op") +: t.columns.map(col): _*)
      case Some(from) =>
        val m = VersionedTable.resolveManifestAt(spark, root, to, to)
        VersionedTable.changeFeedCdf(spark, root, m.keys, from, to)
    }
    val missing = schema.fieldNames.toSeq
      .filterNot(c => c == "op" || c == "_commit_version")
      .filterNot(feed.columns.contains)
    require(missing.isEmpty,
      s"graft-cdc stream schema lost column(s) ${missing.mkString(", ")}" +
        s" at version $to of $root — restart the stream to pick up the " +
        "table's new shape")
    // getBatch's contract wants an isStreaming=true frame; the feed is
    // a driver-planned batch diff, so rewrap its row RDD (cast columns
    // to the PINNED schema types — a widened column must not change the
    // stream's shape mid-run)
    org.apache.spark.sql.graftbridge.PlanBridge.asStreaming(spark,
      feed.withColumn("_commit_version", lit(to))
        .select(schema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*))
  }

  override def stop(): Unit = ()
}
