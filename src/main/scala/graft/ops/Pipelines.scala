package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The reference's job graphs, composed end-to-end from graft operators — a
 * user of the reference runs these as drop-in equivalents of its Spark
 * jobs.
 */
object Pipelines {

  /**
   * The rich analytics batch job (reference:
   * src/airflow/dags/scripts/spark_stream_batch_processor.py, SURVEY §3.2):
   * clean/cast -> per-symbol row-frame MAs + rolling volatility + volume
   * MAs -> tumbling-window OHLC aggregates per granularity (keeping the
   * last row-frame MA per window) -> long-format tagged union -> CASE/WHEN
   * trading signals.
   *
   * Input: raw ticks in the reference's schema (Schemas.tickRaw).
   * Output: one row per (symbol, window_start, window_type) with metrics
   * and signals, ready for partitionBy(symbol, window_type) parquet.
   */
  def analyticsBatch(rawTicks: DataFrame,
                     volatilityHigh: Double = 2.0,
                     volatilityMedium: Double = 1.0,
                     processingTime: Column = current_timestamp()): DataFrame = {
    val ticks = Clean.castTicks(rawTicks)
    val order = Seq("timestamp")
    val withMas = WindowAnalytics.rollingVolatility(
      WindowAnalytics.movingAverages(
        WindowAnalytics.movingAverages(ticks, "symbol", order, "price",
          Seq(5, 15, 30)),
        "symbol", order, "volume", Seq(5, 15), prefix = "vol_ma"),
      "symbol", order, "price", Seq(5, 15))

    def grain(width: String) = TimeWindows.flattenWindow(
      withMas.groupBy(col("symbol"), window(col("timestamp"), width).as("window"))
        .agg(
          min(col("timestamp")).as("first_ts"),
          max(col("timestamp")).as("last_ts"),
          min_by(col("price"), col("timestamp")).as("open"),
          max(col("price")).as("high"),
          min(col("price")).as("low"),
          max_by(col("price"), col("timestamp")).as("close"),
          avg(col("price")).as("avg_price"),
          Clean.nanToNull(stddev_samp(col("price"))).as("volatility"),
          sum(col("volume")).as("total_volume"),
          count(lit(1)).as("n_ticks"),
          max_by(col("ma_15"), col("timestamp")).as("ma_15"),
          max_by(col("ma_30"), col("timestamp")).as("ma_30"),
          max_by(col("vol_ma_5"), col("timestamp")).as("vol_ma_5"),
          max_by(col("vol_ma_15"), col("timestamp")).as("vol_ma_15")))

    val unioned = Combine.unionLong(Seq(
      "5min" -> grain("5 minutes"),
      "15min" -> grain("15 minutes"),
      "1hour" -> grain("1 hour")))

    unioned
      .withColumn("price_trend",
        Signals.priceTrend(col("ma_15"), col("ma_30")))
      .withColumn("volatility_level",
        Signals.volatilityLevel(col("volatility"), volatilityHigh,
          volatilityMedium))
      .withColumn("volume_trend",
        Signals.volumeTrend(col("vol_ma_5"), col("vol_ma_15")))
      // processing-time audit column (airflow analytics processor:228-230);
      // injectable so tests and replays stay deterministic
      .withColumn("processing_time", processingTime)
  }

  /** The simple batch job (reference: src/spark/jobs/spark_batch_processor
    * .py): clean/cast -> minute-floor window_start -> corrected +15min end
    * (the reference's date_add(_, 15) adds days; SURVEY §8.2) -> processing
    * -time audit column (spark_batch_processor.py:65), injectable for
    * deterministic tests/replays. */
  def simpleBatch(rawTicks: DataFrame,
                  processingTime: Column = current_timestamp()): DataFrame =
    Clean.castTicks(rawTicks)
      .withColumn("window_start", date_trunc("minute", col("timestamp")))
      .withColumn("window_15m_end",
        col("window_start") + expr("INTERVAL 15 MINUTES"))
      .withColumn("processing_time", processingTime)

  /**
   * The canonical LLM training-data curation chain as ONE composed plan:
   * quality gate -> exact dedup (min-id per content hash) -> near-dup
   * dedup (connected components over a verified pair list, min-id
   * representative kept). Returns the surviving docs with their quality
   * features attached, ready for per-(lang, source) corpus accounting.
   *
   * `pairs` is the caller's verified near-dup pair list (id1, id2) —
   * typically jaccardPairs / minhashVerifiedPairs output filtered at the
   * dedup threshold, computed ONCE on the full corpus and restricted here
   * to survivors. Computing pairs on the full corpus and filtering (rather
   * than re-pairing the filtered corpus) keeps the expensive pair index
   * reusable across pipeline variants — index once, query many.
   *
   * Every stage is a shuffle the plan already needs (hash groupBy on a
   * 16-byte digest; semi joins on the id; the component loop is
   * O(log diameter) rounds over the tiny pair list) — no stage widens
   * beyond (id, features).
   */
  def curateDocuments(docs: DataFrame, pairs: DataFrame,
                      minQuality: Double, minTokens: Int): DataFrame = {
    val scored = graft.text.TextAnalysis.qualityScore(
      graft.text.TextAnalysis.withQualityFeatures(docs, "text",
        graft.text.TextAnalysis.defaultStopwords))
    // quality_score is rounded to 6 decimals inside qualityScore, and the
    // rounded value is cross-engine hash-identical (q_text_quality) — so a
    // threshold on it is deterministic, never a float-tie coin flip
    val kept = scored.filter(col("quality_score") >= minQuality &&
      col("n_tokens") >= minTokens)
    val minIds = kept.groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exactKept = kept.join(minIds, Seq("doc_id"), "left_semi")
    val ids = exactKept.select(col("doc_id"))
    val survivorPairs = pairs
      .join(ids.select(col("doc_id").as("id1")), Seq("id1"), "left_semi")
      .join(ids.select(col("doc_id").as("id2")), Seq("id2"), "left_semi")
    graft.dedup.FuzzyDedup.applyDedup(exactKept, "doc_id", survivorPairs)
  }
}
