package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.multimodal.Multimodal
import graft.ops.{Clean, Ingest}

/** Reference-fidelity behaviors (SURVEY §8 quirks) and scale plumbing. */
class FidelitySpec extends SparkSpec {
  import spark.implicits._

  test("§8.1 schema skew: CSV leg loads percent_change positionally; " +
    "JSON leg nulls it (name-matched); cleaning tolerates both") {
    val dir = Files.createTempDirectory("graft_skew")
    // raw zone file exactly as the reference consumer writes it: the
    // header says percent_change, every Spark schema says change_percent
    Files.writeString(dir.resolve("ticks.csv"),
      """symbol,price,change,percent_change,volume,timestamp
        |AAPL,190.5,0.5,0.26%,1000,2024-01-01T09:30:00
        |MSFT,410.0,-1.0,-0.24%,2000,2024-01-01T09:30:30""".stripMargin)
    // CSV + explicit schema: columns map BY POSITION (enforceSchema=true
    // default) — the skewed header is ignored and the value loads
    val csvClean = Clean.castTicks(
      Ingest.readCsv(spark, dir.toString, Schemas.tickRaw))
      .orderBy("symbol").collect()
    assert(csvClean(0).getAs[Double]("change_percent") == 0.26)
    assert(csvClean(0).getAs[Double]("price") == 190.5)
    // JSON (the Kafka message shape): fields match BY NAME — the skewed
    // key really does leave change_percent NULL, and cleaning tolerates it
    Files.writeString(dir.resolve("ticks.jsonl"),
      """{"symbol":"AAPL","price":190.5,"change":0.5,"percent_change":"0.26%","volume":"1000","timestamp":"2024-01-01T09:30:00"}""")
    val jsonClean = Clean.castTicks(Ingest.readJsonl(spark,
      dir.resolve("ticks.jsonl").toString, Schemas.tickRaw)).collect()
    assert(jsonClean(0).isNullAt(jsonClean(0).fieldIndex("change_percent")))
    assert(jsonClean(0).getAs[Double]("price") == 190.5)
  }

  test("S6 wire-format fixture: producer-shaped Kafka records through " +
    "decode -> clean -> windowedMetrics (NULL change_percent end-to-end)") {
    // records exactly as spark-sql-kafka would surface the reference
    // producer's messages (stream_data_producer.py:88-131): key = symbol
    // bytes, value = one JSON tick with the percent_change field name and
    // NUMERIC price/change/percent_change/volume — no broker needed to pin
    // the wire format, only the (key binary, value binary) record shape
    def rec(symbol: String, price: Double, change: Double, pct: Double,
            volume: Long, ts: String): (Array[Byte], Array[Byte]) =
      (symbol.getBytes("UTF-8"),
        (s"""{"symbol": "$symbol", "price": $price, "change": $change, """ +
          s""""percent_change": $pct, "volume": $volume, """ +
          s""""timestamp": "$ts"}""").getBytes("UTF-8"))

    // batch leg: the name-skewed percent_change really is dropped by the
    // name-matched from_json (schema says change_percent), numerics load
    val batch = Seq(
      rec("AAPL", 190.0, 0.5, 0.26, 100L, "2024-01-01T09:30:00"),
      rec("AAPL", 192.0, 2.0, 1.05, 300L, "2024-01-01T09:34:00"),
      rec("MSFT", 410.0, -1.0, -0.24, 50L, "2024-01-01T09:31:00"))
    val decoded = Clean.castTicks(
      Ingest.decodeKafkaJson(batch.toDF("key", "value"), Schemas.tickRaw))
    val rows = decoded.orderBy("timestamp").collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("change_percent"))))
    assert(rows(0).getAs[Double]("price") == 190.0)
    assert(rows(0).getAs[Long]("volume") == 100L) // JSON number -> string -> long
    assert(rows(0).getAs[java.sql.Timestamp]("timestamp") ==
      java.sql.Timestamp.valueOf("2024-01-01 09:30:00"))

    // streaming leg: same records as an unbounded source, through the
    // actual speed-path aggregation (15 min windows, 5 min slide)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Array[Byte], Array[Byte])]
    mem.addData(batch: _*)
    val ticks = Clean.castTicks(
      Ingest.decodeKafkaJson(mem.toDF().toDF("key", "value"),
        Schemas.tickRaw))
    val q = graft.streaming.StreamPipeline.windowedMetrics(ticks)
      .writeStream.format("memory").queryName("kafka_fixture")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("kafka_fixture")
    // both AAPL ticks land in the [09:20, 09:35) window: ma over price,
    // volume summed through the NULL-change_percent rows untouched
    val w = out.filter($"symbol" === "AAPL" &&
        $"window_start" === "2024-01-01 09:20:00").collect()
    assert(w.length == 1)
    assert(w(0).getAs[Long]("n_events") == 2L)
    assert(w(0).getAs[Long]("volume_sum") == 400L)
    assert(math.abs(w(0).getAs[Double]("ma") - 191.0) < 1e-9)
  }

  test("hive-partitioned write prunes partitions at read time") {
    val dir = Files.createTempDirectory("graft_prune").toString + "/t"
    val df = Seq(("AAPL", 1.0), ("AAPL", 2.0), ("MSFT", 3.0))
      .toDF("symbol", "price")
    Ingest.writePartitioned(df, dir, Seq("symbol"))
    val scan = spark.read.parquet(dir).filter($"symbol" === "AAPL")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("symbol"), s"no partition pruning in:\n$plan")
    assert(scan.count() == 2)
    // the pruned scan must read exactly the one partition directory
    val filesRead = scan.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles").map(_.value)
    assert(filesRead.forall(_ <= 1), s"read $filesRead files, expected <=1")
  }

  test("typed Dataset[Tick] boundary: raw CSV to case-class rows") {
    val dir = Files.createTempDirectory("graft_typed")
    Files.writeString(dir.resolve("t.csv"),
      """symbol,price,change,change_percent,volume,timestamp
        |AAPL,190.5,0.5,0.26%,1000,2024-01-01T09:30:00""".stripMargin)
    val ticks = Ingest.readTicks(spark, dir.toString).collect()
    assert(ticks.length == 1)
    val t = ticks(0)
    assert(t.symbol == "AAPL" && t.price == 190.5 && t.volume == 1000L)
    assert(t.change_percent.contains(0.26))
  }

  test("analyticsBatch pipeline: full reference job graph end-to-end") {
    val raw = Seq(
      ("AAPL", "100.0", "0.0", null, "10", "2024-01-01T10:00:00"),
      ("AAPL", "110.0", "10.0", null, "20", "2024-01-01T10:02:00"),
      ("AAPL", "120.0", "10.0", null, "30", "2024-01-01T10:16:00"),
      ("MSFT", "400.0", "0.0", null, "5", "2024-01-01T10:01:00"))
      .toDF("symbol", "price", "change", "change_percent", "volume", "timestamp")
    val out = graft.ops.Pipelines.analyticsBatch(raw)
    val cols = out.columns.toSet
    assert(Set("symbol", "window_start", "window_type", "open", "high",
      "low", "close", "avg_price", "volatility", "total_volume", "n_ticks",
      "ma_15", "ma_30", "price_trend", "volatility_level", "volume_trend")
      .subsetOf(cols))
    // 5min windows: AAPL has 2 (10:00, 10:15), MSFT 1; 15min: AAPL 2,
    // MSFT 1; 1hour: AAPL 1, MSFT 1 -> 8 rows
    assert(out.count() == 8)
    val aaplHour = out.filter($"symbol" === "AAPL" && $"window_type" === "1hour")
      .collect()(0)
    assert(aaplHour.getAs[Double]("open") == 100.0)
    assert(aaplHour.getAs[Double]("close") == 120.0)
    assert(aaplHour.getAs[Long]("total_volume") == 60L)
    assert(aaplHour.getAs[String]("price_trend") == "neutral") // ma_15 == ma_30
  }

  test("multimodal feature-extract and resize stages") {
    val docs = Seq((1L, "hello world", "s"), (2L, "hello world", "s"),
      (3L, "completely different", "s")).toDF("doc_id", "text", "source")
    val assets = Multimodal.asAssets(docs, "doc_id", "text", "source", "text")
    val feats = Multimodal.extractFeatures(assets, dim = 16)
      .orderBy("asset_id").collect()
    // fixed dim, integer count histogram, identical payloads -> identical vecs
    assert(feats.forall(_.getSeq[Float](1).length == 16))
    assert(feats(0).getSeq[Float](1) == feats(1).getSeq[Float](1))
    assert(feats(0).getSeq[Float](1) != feats(2).getSeq[Float](1))
    val resized = Multimodal.resizeStub(assets, stride = 4)
      .filter($"asset_id" === 1).collect()(0)
    assert(resized.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Long]("n_bytes") == 3L) // ceil(11/4)
  }

  test("F5: processing-time audit column is emitted and injectable") {
    // reference: spark_batch_processor.py:65 (simple) and the airflow
    // analytics processor:228-230 both stamp current_timestamp; injecting a
    // literal keeps tests and replays deterministic
    val raw = Seq(("AAA", "10.5", "0.5", "1.23%", "100", "2024-01-01T00:01:00"))
      .toDF("symbol", "price", "change", "change_percent", "volume", "timestamp")
    val fixed = lit(java.sql.Timestamp.valueOf("2024-06-01 12:00:00"))
    val simple = graft.ops.Pipelines.simpleBatch(raw, processingTime = fixed)
      .select("processing_time").collect()(0)
    assert(simple.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-06-01 12:00:00"))
    val analytics = graft.ops.Pipelines.analyticsBatch(raw,
      processingTime = fixed).select("processing_time").collect()(0)
    assert(analytics.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-06-01 12:00:00"))
    // default emits a real timestamp column (non-null), like the reference
    assert(!graft.ops.Pipelines.simpleBatch(raw)
      .select("processing_time").collect()(0).isNullAt(0))
  }

  test("multimodal asset plumbing: schema, deterministic decode, frames") {
    val docs = Seq((1L, "hello world", "src1"), (2L, "abc", "src2"))
      .toDF("doc_id", "text", "source")
    val assets = Multimodal.asAssets(docs, "doc_id", "text", "source", "text")
    assert(assets.schema.fieldNames.toSeq ==
      Seq("asset_id", "modality", "payload", "meta"))
    val d1 = Multimodal.decodeAssets(assets).orderBy("asset_id").collect()
    val d2 = Multimodal.decodeAssets(assets).orderBy("asset_id").collect()
    assert(d1.toSeq == d2.toSeq) // stub decode is deterministic
    assert(d1(0).getAs[Long]("n_bytes") == 11L)
    val frames = Multimodal.sampleFrames(assets, nFrames = 4)
      .filter($"asset_id" === 1).orderBy("frame_idx")
      .select("frame_offset").as[Long].collect()
    assert(frames.toSeq == Seq(0L, 2L, 5L, 8L)) // floor(k*11/4)
  }
}
