package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Row-frame window analytics (SURVEY §2.5 W1-W3): moving averages, rolling
 * volatility, rolling volume over N-row frames per key, ordered by event
 * time.
 *
 * Scale note: a row-frame per key serializes each key into one task. That is
 * inherent to the semantics (an ordered scan per symbol); the scale lever is
 * key cardinality — at 100 TB you want thousands of keys (fine) and must
 * never run this partitioned by a constant. The sort is a single shuffle on
 * the key followed by an in-partition sort; all the frame aggregates share
 * that one sort.
 */
object WindowAnalytics {

  /** Deterministic per-key ordered frame: orderBy event time plus a unique
    * tiebreaker so results are stable under ties (the reference orders by
    * timestamp alone — airflow analytics processor:126-128 — which is
    * nondeterministic under duplicate timestamps). */
  def keyFrame(key: String, order: Seq[String]) =
    Window.partitionBy(col(key)).orderBy(order.map(col): _*)

  /** W1/W3: moving averages of `value` over trailing row frames, one output
    * column per frame size, e.g. Seq(5,15,30) -> ma_5, ma_15, ma_30.
    * Reference: airflow analytics processor:126-133, 136-137. */
  def movingAverages(df: DataFrame, key: String, order: Seq[String],
                     value: String, frames: Seq[Int],
                     prefix: String = "ma"): DataFrame = {
    val w = keyFrame(key, order)
    // single select so all frames evaluate in ONE Window node (different
    // frames legally share a node when partition/order match; chained
    // withColumn would interleave Projects and defeat CollapseWindow)
    df.select(col("*") +: frames.map(n =>
      avg(col(value)).over(w.rowsBetween(-(n - 1), Window.currentRow))
        .as(s"${prefix}_$n")): _*)
  }

  /** W2: rolling sample stddev (volatility) over trailing row frames.
    * NaN-normalized to NULL for 1-row frames (ANSI/oracle semantics).
    * Reference: airflow analytics processor:134-135. */
  def rollingVolatility(df: DataFrame, key: String, order: Seq[String],
                        value: String, frames: Seq[Int],
                        prefix: String = "volatility"): DataFrame = {
    val w = keyFrame(key, order)
    df.select(col("*") +: frames.map(n =>
      Clean.nanToNull(
        stddev_samp(col(value)).over(w.rowsBetween(-(n - 1), Window.currentRow)))
        .as(s"${prefix}_$n")): _*)
  }

  /** Time-RANGE trailing frame: aggregates over "the last `seconds` of
    * event time" per key — unlike a ROWS frame, the window adapts to
    * irregular tick spacing (quiet periods shrink it, bursts grow it),
    * which is the correct reading of "10-minute trailing average". Ordered
    * by epoch seconds with rangeBetween, so rows with equal timestamps
    * share a frame (no tiebreaker needed for determinism of the AGGREGATE —
    * every peer sees the same frame). Same single shuffle + sort per key as
    * the ROWS frames. */
  def trailingTimeAgg(df: DataFrame, key: String, ts: String,
                      aggs: Seq[(String, Column => Column)], value: String,
                      seconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(unix_timestamp(col(ts)))
      .rangeBetween(-seconds, Window.currentRow)
    // one select, not chained withColumn: interleaved Projects would block
    // CollapseWindow and the plan would evaluate one Window node per
    // aggregate instead of sharing a single pass over the sorted frame
    df.select(col("*") +:
      aggs.map { case (name, f) => f(col(value)).over(w).as(name) }: _*)
  }

  /** Quantile bucketing: ntile(n) over a total order — "quality deciles"
    * for keep-top-N% curation. The `order` columns MUST form a total order
    * (append a unique id): ntile assigns by rank, so ties broken
    * differently across engines would shift bucket boundaries. Single
    * global sort (one range exchange — Spark's ntile over an empty
    * partitionBy is a single-task sort; at 100 TB bucket within strata
    * via `partitionCols` instead). */
  def quantileBuckets(df: DataFrame, partitionCols: Seq[String],
                      order: Seq[Column], n: Int,
                      bucketCol: String = "bucket"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn(bucketCol, ntile(n).over(w))
  }

  /** W4/A7: keep-last dedup — row_number over (keys) ordered by `order`
    * descending, keep rank 1. Reference semantics: pandas
    * drop_duplicates(keep='last') before MERGE (load_to_snowflake.py:154).
    * `order` should end with a unique column for determinism. */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(col(_).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Time-series feature columns for supervised training: lag_k / lead_k of
    * `value` per key plus the pct change vs lag_1 — the previous/next-tick
    * features every forecasting pipeline derives. One shuffle on the key;
    * each offset is O(1) state in a single Window node (same frame spec, so
    * Spark collapses all the lag/lead expressions into one sort). `order`
    * must be a total order for cross-engine determinism. */
  def laggedFeatures(df: DataFrame, key: String, order: Seq[String],
                     value: String, offsets: Seq[Int]): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ > 0),
      s"offsets must be positive: $offsets")
    // pct_change is documented as "vs lag_1"; silently substituting another
    // offset under the same column name would mislabel the feature
    require(offsets.contains(1),
      s"offsets must include 1 (pct_change is defined vs lag_1): $offsets")
    val w = keyFrame(key, order)
    val withLags = offsets.foldLeft(df) { (d, k) =>
      d.withColumn(s"lag_$k", lag(col(value), k).over(w))
        .withColumn(s"lead_$k", lead(col(value), k).over(w))
    }
    withLags.withColumn("pct_change",
      (col(value) - col("lag_1")) / nullif(col("lag_1"), lit(0.0)))
  }

  /** Rolling Pearson correlation of two measures over trailing row frames
    * per key (e.g. price/volume co-movement) — each frame size is three
    * co-moment aggregates (covar, two stddevs) in ONE Window node, O(1)
    * state per row. Formulated as covar / nullif(sx·sy, 0) rather than
    * corr(): a zero-variance frame makes Spark's ANSI-mode corr THROW
    * DIVIDE_BY_ZERO, while the nullif form yields NULL — which is both the
    * ANSI-SQL answer (correlation undefined) and what DuckDB's corr
    * returns, so frames that degenerate (constant side, n < 2) agree
    * cross-engine instead of killing the job. */
  def rollingCorr(df: DataFrame, key: String, order: Seq[String],
                  x: String, y: String, frames: Seq[Int],
                  prefix: String = "corr"): DataFrame = {
    val base = keyFrame(key, order)
    val cols = df.columns.map(col).toSeq ++ frames.map { n =>
      val w = base.rowsBetween(-(n - 1), Window.currentRow)
      val cov = covar_samp(col(x), col(y)).over(w)
      val sx = stddev_samp(col(x)).over(w)
      val sy = stddev_samp(col(y)).over(w)
      round(Clean.nanToNull(cov / nullif(sx * sy, lit(0.0))), 6)
        .as(s"${prefix}_$n")
    }
    df.select(cols: _*)
  }

  /** Relative-position features per key: rank, dense_rank, percent_rank,
    * cume_dist over `order` — the cross-sectional "where does this row sit
    * in its group" features (e.g. a symbol's volume percentile that day).
    * percent_rank/cume_dist are exact rational doubles ((rank-1)/(n-1),
    * rank/n) so they compare bit-identically across engines. */
  def rankFeatures(df: DataFrame, keys: Seq[String],
                   order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rnk", rank().over(w))
      .withColumn("dense_rnk", dense_rank().over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume_d", cume_dist().over(w))
  }
}
