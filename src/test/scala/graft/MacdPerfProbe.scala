package graft

import org.apache.spark.sql.SparkSession

/** Perf probe for the one mapPartitions path in the engine (VERDICT r2 #8):
  * runs withEmaMacd's order-dependent recurrence over the FULL events table
  * (100k rows at sf0.1) rather than q_macd's ~3.6k hourly bars, so the
  * Encoders.row row-copy cost is measured at series scale. Run with
  *   sbt 'Test/runMain graft.MacdPerfProbe [sfDir]'
  * Not a ScalaTest: timing asserts are flaky; this prints, a human judges.
  */
object MacdPerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.ops.Ingest.events(spark, sfDir)
    val n = ev.count()
    def run(): Long = graft.ops.Indicators
      .withEmaMacd(ev, "event_type", Seq("ts", "event_id"), "value").count()
    run() // warm: codegen + scan cache
    val t0 = System.nanoTime(); run()
    val warm1 = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime(); run(); run()
    val steady = (System.nanoTime() - t1) / 2e9
    println(f"MACD_PROBE input_rows=$n warm1=$warm1%.3fs steady=$steady%.3fs" +
      f" rows_per_s=${n / steady}%.0f")
    spark.stop()
  }
}
