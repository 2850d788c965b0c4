package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: resample an irregular event stream onto a
 * fixed time grid and forward-fill the gaps — the "as-of panel" prep that
 * turns raw ticks into the aligned feature matrix a model trains on.
 *
 * Scale shape, stage by stage:
 *  1. last-observation-per-bucket is one partial-aggregated groupBy
 *     (max_by over a total-order struct — no window, no sort);
 *  2. the grid explodes from per-key (min, max) bounds — the sequence()
 *     fan-out runs on |keys| rows and emits |keys| × horizon/step rows by
 *     construction, never a cross join;
 *  3. the gap fill is one per-key ordered window (last ignoreNulls over an
 *     unbounded-preceding frame, O(1) running state per row).
 * Nothing is collected; every stage shuffles on the key only.
 */
object Resample {

  /** Last observed `value` per (keys, step-aligned bucket), deterministic
    * under equal timestamps via the `tiebreak` columns. Buckets are
    * epoch-aligned `window(ts, step).start` — the same grid DuckDB's
    * time_bucket and Flink's TUMBLE produce. */
  def lastPerBucket(df: DataFrame, keys: Seq[String], ts: String,
                    value: String, step: String,
                    tiebreak: Seq[String]): DataFrame =
    df.groupBy(keys.map(col) :+
        window(col(ts), step).getField("start").as("grid_ts"): _*)
      .agg(max_by(col(value),
        struct((ts +: tiebreak).map(col): _*)).as("v_last"))

  /** Expand each key's observed bucket range into a dense grid and
    * left-join the observations back: one row per (key, grid step),
    * `v_last` null where the bucket had no events, `is_gap` marking them. */
  def toGrid(bucketed: DataFrame, keys: Seq[String], step: String): DataFrame = {
    val bounds = bucketed.groupBy(keys.map(col): _*)
      .agg(min(col("grid_ts")).as("__lo"), max(col("grid_ts")).as("__hi"))
    val grid = bounds.select(keys.map(col) :+
      explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $step"))).as("grid_ts"): _*)
    grid.join(bucketed, keys :+ "grid_ts", "left")
      .withColumn("is_gap", col("v_last").isNull.cast("int"))
  }

  /** Forward fill: carry the last non-null observation down each key's
    * timeline (leading gaps stay null — there is nothing to carry). */
  def forwardFill(df: DataFrame, keys: Seq[String], order: Seq[String],
                  value: String, out: String = "value_ff"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, last(col(value), ignoreNulls = true).over(w))
  }

  /** Backward fill: carry the NEXT non-null observation up each key's
    * timeline (trailing gaps stay null — nothing ahead to pull back).
    * ffill's mirror; the pair brackets every gap for audit. */
  def backwardFill(df: DataFrame, keys: Seq[String], order: Seq[String],
                   value: String, out: String = "value_bf"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn(out, first(col(value), ignoreNulls = true).over(w))
  }

  /** The composed panel: bucket → dense grid → forward fill. */
  def resampleLast(df: DataFrame, keys: Seq[String], ts: String,
                   value: String, step: String,
                   tiebreak: Seq[String]): DataFrame =
    forwardFill(
      toGrid(lastPerBucket(df, keys, ts, value, step, tiebreak), keys, step),
      keys, Seq("grid_ts"), "v_last")

  /** Linear interpolation over a gridded panel (pandas
    * `interpolate('linear')` semantics): a strictly-interior gap takes
    * `v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev)`;
    * leading/trailing gaps stay null — no second anchor to draw the
    * line to. Two per-key ordered window passes (running last / reversed
    * first, IGNORE NULLS — O(1) state per row over ONE sort), never a
    * self-join; the time axis is epoch seconds so step-aligned grids
    * interpolate in exact integer arithmetic before the one divide. */
  def interpolate(grid: DataFrame, keys: Seq[String], ts: String,
                  value: String, out: String = "v_interp"): DataFrame = {
    val kcols = keys.map(col)
    val wPrev = Window.partitionBy(kcols: _*).orderBy(col(ts))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(kcols: _*).orderBy(col(ts))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tsec = col(ts).cast("long")
    grid
      .withColumn("__pv", last(col(value), ignoreNulls = true).over(wPrev))
      .withColumn("__pt",
        last(when(col(value).isNotNull, tsec), ignoreNulls = true)
          .over(wPrev))
      .withColumn("__nv", first(col(value), ignoreNulls = true).over(wNext))
      .withColumn("__nt",
        first(when(col(value).isNotNull, tsec), ignoreNulls = true)
          .over(wNext))
      .withColumn(out,
        when(col(value).isNotNull, col(value))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              ((tsec - col("__pt")).cast("double") /
                (col("__nt") - col("__pt")).cast("double"))))
      .drop("__pv", "__pt", "__nv", "__nt")
  }
}
