package graft.model

import org.apache.spark.sql.types._

/**
 * Canonical schemas and typed boundary case classes.
 *
 * The raw-zone schemas mirror the reference's explicit StructType literals
 * (reference: src/spark/jobs/spark_stream_processor.py:72-82,
 * src/spark/jobs/spark_batch_processor.py:36-43) — schema-on-read, never
 * inference, so a scan of a 100 TB raw zone never pays an inference pass.
 *
 * Note the reference's known schema skew: the producer emits
 * `percent_change` while every Spark schema declares `change_percent`
 * (reference: src/kafka/producer/stream_data_producer.py:92 vs
 * spark_stream_processor.py:79). We canonicalize on `change_percent` and all
 * downstream ops are null-tolerant on it.
 */
object Schemas {

  /** Raw realtime tick as landed in the CSV raw zone (all-string at the
    * edges where the reference declares strings; cleaned by Clean.castTicks).
    * Reference: spark_stream_processor.py:75-82. */
  val tickRaw: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("price", DoubleType),
    StructField("change", DoubleType),
    StructField("change_percent", StringType), // may carry '%' suffix, often null
    StructField("volume", StringType),         // string at the edge, cast to long
    StructField("timestamp", StringType)       // ISO-8601 string
  ))

  /** Historical daily OHLCV bar as produced by the batch producer.
    * Reference: src/kafka/producer/batch_data_producer.py:73-86,104-106. */
  val ohlcvRaw: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("symbol", StringType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType), // BIGINT at 100 TB scale (reference DDL says BIGINT)
    StructField("batch_id", StringType),
    StructField("batch_date", StringType)
  ))

  /** Cleaned tick after Clean.castTicks: typed, event-time as timestamp. */
  val tickClean: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("price", DoubleType),
    StructField("change", DoubleType),
    StructField("change_percent", DoubleType),
    StructField("volume", LongType),
    StructField("timestamp", TimestampType)
  ))

  /** Typed boundary for the speed path. */
  final case class Tick(
      symbol: String,
      price: Double,
      change: Double,
      change_percent: Option[Double],
      volume: Long,
      timestamp: java.sql.Timestamp)

  /** Typed boundary for the batch path. */
  final case class OhlcvBar(
      date: String,
      symbol: String,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      volume: Long,
      batch_id: String,
      batch_date: String)
}
