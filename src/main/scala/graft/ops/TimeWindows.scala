package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-time windowed aggregations (SURVEY §2.3 A1-A3, §2.6 T1-T3).
 *
 * All shapes are hash aggregates over (key, window) — a single shuffle on the
 * group key. At 100 TB this is the dominant shuffle of the pipeline; partial
 * (map-side) aggregation halves the wire bytes for free since every agg used
 * here (avg/stddev/sum/min/max/count/min_by/max_by) has a partial form.
 */
object TimeWindows {

  /** T1/T2/T3 + A1: the reference's core windowed aggregate — per key and
    * time window: avg(price), sample stddev(price), sum(volume).
    * Reference: spark_stream_processor.py:186-213.
    *
    * @param slide None for tumbling windows, Some(d) for sliding. */
  def metricWindow(df: DataFrame, key: String, ts: String, value: String,
                   volume: Column, width: String, slide: Option[String] = None)
      : DataFrame = {
    val w = slide.fold(window(col(ts), width))(s => window(col(ts), width, s))
    df.groupBy(col(key), w.as("window"))
      .agg(
        avg(col(value)).as("ma"),
        Clean.nanToNull(stddev_samp(col(value))).as("volatility"),
        sum(volume).as("volume_sum"),
        count(lit(1)).as("n_events"),
        sum(col(value)).as("value_sum"))
  }

  /** A2: extended OHLC-style windowed aggregate — ordered first/last via
    * min_by/max_by on the event-time column (deterministic, unlike first()
    * on an unsorted group — SURVEY §7.3), plus min/max/avg/stddev/count.
    * Reference: airflow analytics processor:154-203. */
  def ohlcWindow(df: DataFrame, key: String, ts: String, value: String,
                 width: String): DataFrame =
    df.groupBy(col(key), window(col(ts), width).as("window"))
      .agg(
        min(col(ts)).as("first_ts"),
        max(col(ts)).as("last_ts"),
        min_by(col(value), col(ts)).as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max_by(col(value), col(ts)).as("close"),
        avg(col(value)).as("avg_value"),
        Clean.nanToNull(stddev_samp(col(value))).as("volatility"),
        count(lit(1)).as("n_events"),
        sum(col(value)).as("value_sum"))

  /** A3: daily OHLCV rollup per (key, date) — the capability the reference's
    * warehouse DDL declares but no job produces (SURVEY §8.4).
    * Reference DDL: load_to_snowflake.py:72-84. */
  def dailyOhlcv(df: DataFrame, key: String, ts: String, value: String,
                 volume: Column): DataFrame =
    df.groupBy(col(key), to_date(col(ts)).as("date"))
      .agg(
        min_by(col(value), col(ts)).as("daily_open"),
        max(col(value)).as("daily_high"),
        min(col(value)).as("daily_low"),
        max_by(col(value), col(ts)).as("daily_close"),
        sum(volume).as("daily_volume"),
        (max_by(col(value), col(ts)) - min_by(col(value), col(ts))).as("daily_change"))

  /** P7 helper: flatten the window struct to top-level start/end columns and
    * drop the struct (P2). Reference: spark_stream_processor.py:196-198. */
  def flattenWindow(df: DataFrame): DataFrame =
    df.withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
}
