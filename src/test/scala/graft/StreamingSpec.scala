package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamPipeline

class StreamingSpec extends SparkSpec {

  private def writeCsv(dir: Path, name: String, rows: Seq[String]): Unit = {
    val header = "symbol,price,change,change_percent,volume,timestamp"
    Files.writeString(dir.resolve(name), (header +: rows).mkString("\n"))
  }

  test("speed path end-to-end: CSV landing -> windowed agg -> parquet") {
    val base = Files.createTempDirectory("graft_stream")
    val raw = Files.createDirectory(base.resolve("raw"))
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    writeCsv(raw, "a.csv", Seq(
      "AAA,10.0,0.1,1.0%,100,2024-01-01T00:01:00",
      "AAA,12.0,0.2,2.0%,200,2024-01-01T00:06:00",
      "BBB,50.0,0.0,,10,2024-01-01T00:02:00"))

    StreamPipeline.run(spark, raw.toString, out, ckpt).awaitTermination(60000)
    // append mode + watermark: a window is emitted only once a later batch
    // advances the watermark past its end — push it forward twice, exactly
    // how a live stream would
    writeCsv(raw, "b.csv", Seq("AAA,11.0,0.0,,50,2024-01-01T01:00:00"))
    StreamPipeline.run(spark, raw.toString, out, ckpt).awaitTermination(60000)
    writeCsv(raw, "c.csv", Seq("AAA,11.5,0.0,,50,2024-01-01T02:00:00"))
    StreamPipeline.run(spark, raw.toString, out, ckpt).awaitTermination(60000)

    val result = spark.read.parquet(out)
    assert(result.count() > 0)
    val cols = result.columns.toSet
    assert(Set("symbol", "window_start", "window_end", "ma", "volatility",
      "volume_sum", "n_events", "batch_id").subsetOf(cols))
    // AAA rows at 00:01 and 00:06 share the [00:00,00:15)/5m sliding windows
    import spark.implicits._
    val aaa = result.filter($"symbol" === "AAA")
      .filter($"window_start" === "2024-01-01 00:00:00")
      .select("n_events").as[Long].collect()
    assert(aaa.headOption.contains(2L))
  }

  test("merge sink upserts per micro-batch; replayed keys do not duplicate") {
    val base = Files.createTempDirectory("graft_stream_merge")
    val raw = Files.createDirectory(base.resolve("raw"))
    val table = base.resolve("table").toString
    val ckpt = base.resolve("ckpt").toString
    def run(): Unit = {
      val metrics = StreamPipeline.windowedMetrics(
        StreamPipeline.tickStream(spark, raw.toString),
        width = "5 minutes", slide = "5 minutes")
      StreamPipeline.startMerge(metrics, table, ckpt,
        keys = Seq("symbol", "window_start")).awaitTermination(60000)
    }
    writeCsv(raw, "m1.csv", Seq("AAA,10.0,0.0,,100,2024-01-01T00:01:00"))
    run()
    // push watermark so the 00:00 window flushes, then far enough for 01:00
    writeCsv(raw, "m2.csv", Seq("AAA,20.0,0.0,,100,2024-01-01T01:00:00"))
    run()
    writeCsv(raw, "m3.csv", Seq("AAA,30.0,0.0,,100,2024-01-01T02:00:00"))
    run()
    import spark.implicits._
    val rows = spark.read.parquet(table)
      .select("symbol", "window_start", "ma").collect()
    // exactly one row per (symbol, window): merged, not appended twice
    assert(rows.map(r => (r.getString(0), r.getTimestamp(1))).distinct.length
      == rows.length)
    assert(rows.exists(_.getTimestamp(1).toString.startsWith("2024-01-01 00:00")))
  }

  test("watermark drops rows later than the bound across micro-batches") {
    val base = Files.createTempDirectory("graft_stream_wm")
    val raw = Files.createDirectory(base.resolve("raw"))
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    // batch 1 advances event time to 01:00
    writeCsv(raw, "b1.csv", Seq(
      "AAA,10.0,0.0,,100,2024-01-01T01:00:00"))
    val ticks = StreamPipeline.tickStream(spark, raw.toString)
    val metrics = StreamPipeline.windowedMetrics(ticks,
      watermark = "5 minutes", width = "5 minutes", slide = "5 minutes")
    val q1 = StreamPipeline.start(metrics, out, ckpt)
    q1.awaitTermination(60000)
    // batch 2: one fresh row and one row far behind the watermark (00:10)
    writeCsv(raw, "b2.csv", Seq(
      "AAA,99.0,0.0,,100,2024-01-01T00:10:00", // late: dropped
      "AAA,11.0,0.0,,100,2024-01-01T01:20:00"))
    val q2 = StreamPipeline.start(metrics, out, ckpt)
    q2.awaitTermination(60000)

    import spark.implicits._
    val rows = spark.read.parquet(out)
      .select("window_start", "ma").as[(java.sql.Timestamp, Double)]
      .collect().toMap
    // the late 00:10 window must never appear
    assert(!rows.keys.exists(_.toString.startsWith("2024-01-01 00:10")))
  }
}
