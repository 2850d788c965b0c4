package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Sources and sinks (SURVEY §2.1, S1-S7).
 *
 * Everything is schema-on-read with explicit StructTypes (reference:
 * src/spark/jobs/spark_batch_processor.py:36-43,54) so scans never pay an
 * inference pass, and columnar parquet everywhere past the raw zone. Writers
 * keep hive-style partition layout so downstream reads get partition pruning
 * for free on a 1000-executor cluster.
 */
object Ingest {

  /** S1: batch CSV scan over a (possibly hive-partitioned) directory with an
    * explicit schema and header. Reference: spark_batch_processor.py:54. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S2: streaming CSV scan (file-stream source) over a landing directory.
    * Reference: spark_stream_processor.py:132-135. */
  def readCsvStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).option("header", "true").csv(path)

  /** S3: parquet scan. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Align any frame to a canonical schema: present columns cast to the
    * canonical type, missing columns null-filled, extra columns dropped,
    * output column order = canonical order. */
  def alignSchema(df: DataFrame, canonical: StructType): DataFrame =
    df.select(canonical.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)

  /** Schema-evolution-tolerant parquet scan: a long-lived lake holds files
    * written under EVOLVING schemas — yesterday's files lack this week's
    * column, a backfill widened an int to long. Reading with the CANONICAL
    * schema (not mergeSchema — whose union REFUSES to merge int32 and
    * int64 leaves, exactly the widening case) makes every file align at
    * scan time: missing columns surface NULL, extra columns are never
    * read, and Spark 4's parquet readers apply widening promotions
    * (int→long, float→double) per file. Old files never crash the read. */
  def readParquetEvolved(spark: SparkSession, path: String,
                         canonical: StructType): DataFrame =
    spark.read.schema(canonical).parquet(path)

  /** Read one of the driver-generated testdata tables by name. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The `events` stream-shaped table, with `ts` normalized to a plain
    * session-local TimestampType (µs) whatever physical type the lake
    * wrote — generations of the testdata have carried nanosecond INT64
    * (which Spark's vectorized reader rejects unless read as raw longs via
    * legacy nanosAsLong, then truncated µs-identically to DuckDB's reader)
    * and plain µs timestamps (NTZ when isAdjustedToUTC=false; the session
    * runs UTC, so the NTZ→LTZ cast preserves the instant bit-for-bit).
    * Dispatching on the SCANNED type here means every downstream operator
    * sees one canonical event-time column across lake generations. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // The conf is read lazily at scan time, so it cannot be set-then-restored
    // here; Bench/Verify (and SparkSpec) set it at session build. This guard
    // only covers ad-hoc sessions, and writes a constant value, so a
    // first-call race between worker threads is benign (same write).
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long lake
        expr("timestamp_micros(ts div 1000)")
      case _ => // µs timestamp (NTZ or LTZ) lake
        col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }
    raw.withColumn("ts", tsCol)
  }

  /** S4: partitioned parquet write, snappy, overwrite — the processed-zone
    * layout (reference: spark_stream_batch_processor.py:218-221). No
    * coalesce(1): at 100 TB one output file per write is a driver-side
    * bottleneck; callers size files via spark.sql.files.maxRecordsPerFile. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .option("compression", "snappy")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Small-files compaction: rewrite a parquet directory into
    * ~targetFileBytes output files. A streaming sink or over-parallel job
    * leaves thousands of KB-sized files; each later scan then pays one
    * task + one open per file, and the NameNode/object-store pays the
    * metadata. Reads pack small files together (Spark's FilePartition
    * bin-packing), and the write side uses coalesce — a NARROW
    * repartitioning, no shuffle: compaction is IO-bound by design, so
    * shuffling the data to rebalance it would double the cost for nothing.
    * Returns the output file count. Sizing uses the compressed input bytes
    * as the estimate of output bytes (same format + codec on both sides).
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(inDir), spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: partitioned layouts (date=*/part-*.parquet) keep
    // their data files in subdirectories — a flat listStatus would size
    // them at 0 bytes and coalesce(1) a 100 GB dataset onto one task
    def totalBytes(p: org.apache.hadoop.fs.Path): Long = {
      val it = fs.listFiles(p, true)
      var sum = 0L
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet")) sum += s.getLen
      }
      sum
    }
    val nFiles = math.max(1L,
      (totalBytes(new org.apache.hadoop.fs.Path(inDir)) + targetFileBytes - 1)
        / targetFileBytes).toInt
    spark.read.parquet(inDir)
      .coalesce(nFiles)
      .write.mode("overwrite").option("compression", "snappy")
      .parquet(outDir)
    // coalesce cannot INCREASE partition count, so the write may produce
    // fewer files than asked; report what actually landed
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** S7: raw-zone CSV landing with header (consumer side of the reference;
    * realtime_data_consumer.py:101-127). */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** ORC leg: the second columnar format Spark ships natively — same
    * pushdown/pruning surface as parquet (predicate pushdown, column
    * projection, stripe-level min/max skipping), so a warehouse
    * standardized on ORC swaps formats without touching any operator. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** S6 (zero-egress form): the reference's Kafka leg carries one JSON
    * object per tick (stream_data_producer.py:120-131); the offline
    * equivalent is JSONL on disk. Schema-on-read, no inference pass. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Malformed-tolerant JSONL ingestion — a live feed WILL contain
    * truncated/garbled messages, and failing the job (FAILFAST) or
    * silently dropping them (DROPMALFORMED) are both wrong for an
    * auditable pipeline. Reads the file as raw text and parses each line
    * with from_json (exactly the Kafka value-decode shape,
    * [[decodeKafkaJson]]) carrying an in-struct `_corrupt_record` field:
    * an unparseable line sets it to the raw text, so clean and quarantine
    * are two filters over one narrow scan — no cache, and none of the
    * corrupt-column-only query restrictions of the PERMISSIVE file reader
    * (those apply to raw file scans, not to parsed columns).
    * Returns (clean rows, quarantine raw lines); the
    * quarantine count is the feed-health metric and the raw line replays
    * after a parser fix. A parseABLE line with wrong field types is NOT
    * quarantined — it parses to a struct with null fields, the same
    * schema-skew semantics as the reference's change_percent column. */
  def readJsonlAudited(spark: SparkSession, path: String,
                       schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType, nullable = true))
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("__j"))
    val clean = parsed.filter(col("__j._corrupt_record").isNull)
      .select(col("__j.*")).drop("_corrupt_record")
    val quarantine = parsed.filter(col("__j._corrupt_record").isNotNull)
      .select(col("value").as("raw_line"))
    (clean, quarantine)
  }

  /** S6 streaming twin: JSONL file-stream source. */
  def readJsonlStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  def writeJsonl(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** Kafka record batch -> typed columns: cast the binary `value` payload to
    * string and parse with an explicit schema — the reference consumer's
    * decode step (realtime_data_consumer.py:83-94). Factored out of the
    * source assembly so the projection is unit-testable against the JSONL
    * fixtures without a broker. */
  def decodeKafkaJson(records: DataFrame, schema: StructType): DataFrame =
    records.select(from_json(col("value").cast("string"), schema).as("j"))
      .select(col("j.*"))

  /** S6 (native assembly): the reference's primary ingress is a Kafka topic
    * of one JSON tick per message (stream_data_producer.py:120-131;
    * realtime_data_consumer.py:83-94). This is the `format("kafka")` +
    * [[decodeKafkaJson]] assembly; it compiles against the stable source
    * options but cannot run in the zero-egress sandbox (no broker, no
    * spark-sql-kafka jar) — [[readJsonlStream]] is the offline twin with
    * identical decode semantics. */
  def readKafkaStream(spark: SparkSession, servers: String, topic: String,
                      schema: StructType,
                      startingOffsets: String = "earliest"): DataFrame =
    decodeKafkaJson(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load(), schema)

  /** S6 batch form: bounded Kafka scan (backfill/repair reads). */
  def readKafka(spark: SparkSession, servers: String, topic: String,
                schema: StructType): DataFrame =
    decodeKafkaJson(
      spark.read.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .load(), schema)

  /** Typed boundary for the speed path (SURVEY §1.4): raw CSV -> cleaned
    * Dataset[Tick]. Compile-time schema safety at ingestion; downstream
    * stays DataFrame. */
  def readTicks(spark: SparkSession, path: String): org.apache.spark.sql.Dataset[graft.model.Schemas.Tick] = {
    import spark.implicits._
    Clean.castTicks(readCsv(spark, path, graft.model.Schemas.tickRaw))
      .as[graft.model.Schemas.Tick]
  }

  /** Bucketed managed table: pre-shuffles once at write time so every
    * subsequent equi-join/aggregation on `bucketCols` with a matching
    * bucket count runs exchange-free. This is the 100 TB co-located-join
    * lever: a fact table bucketed by its join key never shuffles again. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** S10 availability sensor: true iff `path` (any Hadoop-FS URI — local,
    * HDFS, object store) exists, optionally requiring at least one
    * data-bearing file matching `glob` under it. The reference gates each
    * DAG stage on a list-objects check (check_minio_file.py:47-88); this is
    * the engine-side equivalent a scheduler polls before submitting the
    * dependent job — a driver-only metadata call, no executor work. */
  def available(spark: SparkSession, path: String,
                glob: Option[String] = None): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return false
    glob match {
      case None => true
      case Some(g) =>
        val matches = fs.globStatus(new org.apache.hadoop.fs.Path(hPath, g))
        matches != null && matches.exists(_.getLen > 0)
    }
  }
}
