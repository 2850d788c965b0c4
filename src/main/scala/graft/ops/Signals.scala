package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Conditional signal derivation (SURVEY §2.9 F7-F9) — the reference's
 * trading-signal CASE/WHEN cluster. Pure expressions: codegen'd, no UDFs.
 * Reference: airflow analytics processor:227-245.
 */
object Signals {

  /** F7: 3-arm trend CASE — fast MA above slow MA = bullish, below =
    * bearish, else neutral (null-tolerant: null MAs fall to neutral). */
  def priceTrend(fast: Column, slow: Column): Column =
    when(fast > slow, "bullish")
      .when(fast < slow, "bearish")
      .otherwise("neutral")

  /** F8: threshold CASE on volatility. */
  def volatilityLevel(vol: Column, high: Double = 2.0, medium: Double = 1.0): Column =
    when(vol > high, "high")
      .when(vol > medium, "medium")
      .otherwise("low")

  /** F9: comparison-with-arithmetic CASE on volumes. */
  def volumeTrend(shortVol: Column, longVol: Column, ratio: Double = 0.3): Column =
    when(shortVol > longVol * ratio, "increasing").otherwise("normal")

  /** Apply all three signals with the reference's column conventions. */
  def withSignals(df: DataFrame, maFast: String, maSlow: String,
                  vol: String, volShort: String, volLong: String): DataFrame =
    df.withColumn("price_trend", priceTrend(col(maFast), col(maSlow)))
      .withColumn("volatility_level", volatilityLevel(col(vol)))
      .withColumn("volume_trend", volumeTrend(col(volShort), col(volLong)))
}
