package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization (batch form): a session breaks when the gap to
 * the previous event of the same key exceeds `gapMinutes`.
 *
 * Classic two-window formulation: lag() marks the breaks, a running sum
 * numbers the sessions, then a hash aggregate rolls sessions up. One
 * shuffle on the key; both window functions share the same sort. The
 * streaming twin (graft.streaming.SessionizeStream) produces the same
 * sessions incrementally with flatMapGroupsWithState.
 */
object Sessionize {

  def byGap(df: DataFrame, key: String, ts: String, value: String,
            gapMinutes: Int, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val gapMicros = gapMinutes * 60L * 1000000L
    val marked = df
      .withColumn("__brk",
        when(unix_micros(col(ts)) - lag(unix_micros(col(ts)), 1).over(w)
          > gapMicros, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    marked.groupBy(col(key), col("session_idx"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(value)).as("value_sum"))
  }

  /** Built-in `session_window` formulation — the same gap sessions from
    * Spark's native session-window aggregate instead of the two-window
    * composition above. One hash aggregate with session merge, no sort-based
    * window functions; usable unchanged in Structured Streaming (where
    * [[byGap]]'s lag/over cannot run and the custom-state twin is
    * graft.streaming.SessionizeStream).
    *
    * Boundary semantics MATCH [[byGap]]: an event arriving at exactly
    * `gap` after the previous one merges into the session (the native
    * operator's interval merge is end-inclusive — asserted in OpsSpec), so
    * a session breaks only when the gap is strictly greater. The one
    * output difference: session_end here = last event + gap (the
    * watermark-style close time), not the last event time. */
  def bySessionWindow(df: DataFrame, key: String, ts: String, value: String,
                      gapMinutes: Int): DataFrame =
    df.groupBy(col(key), session_window(col(ts), s"$gapMinutes minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(value)).as("value_sum"))
      .select(col(key),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))

  /** Gaps-and-islands: maximal runs of consecutive rows with the same
    * `state` per key (ordered by ts, tiebreak) — the "how long did the
    * user stay in this mode" rollup behind state-machine audits and
    * streak features.
    *
    * Same two-window shape as [[byGap]]: lag() marks state changes, a
    * running sum numbers the runs (1-based — the key's first row is
    * always a break, forced by row_number, so a key whose first state is
    * NULL still starts at run 1), a hash aggregate rolls each run up —
    * one shuffle on the key, all three windows share one sort. NULL is a
    * GROUPABLE state (null-safe <=> compare): consecutive NULL-state rows
    * merge into one run, the grouped-set semantics a state-machine audit
    * wants ("unknown" is itself a mode, not an infinite run of singleton
    * modes). run_idx is deterministic because (ts, tiebreak) totally
    * orders each key's rows. Oracle: q_runs (DuckDB IS NOT DISTINCT
    * FROM replays <=> exactly). */
  def runs(df: DataFrame, key: String, ts: String, tiebreak: String,
           state: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val marked = df
      .withColumn("__brk",
        when(row_number().over(w) === 1, 1)
          .when(lag(col(state), 1).over(w) <=> col(state), 0)
          .otherwise(1))
      .withColumn("run_idx",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    marked.groupBy(col(key), col("run_idx"))
      .agg(
        min(col(state)).as(state), // constant within the run
        min(col(ts)).as("run_start"),
        max(col(ts)).as("run_end"),
        count(lit(1)).as("n_events"))
  }

  /** True debounce: drop any row closer than `minGapSeconds` to the last
    * KEPT row of the same key (the first row of a key is always kept) —
    * the rapid-fire / double-click suppressor. Unlike a plain lag()
    * filter, the decision depends on which earlier rows survived, so
    * this is an order-dependent recurrence: it runs on the shared
    * [[Indicators.keyedSeriesScan]] harness (one shuffle on the key, one
    * in-partition sort, O(1) state per key). State is the last-kept µs
    * instant — all-integer, so a recursive-CTE oracle replays the
    * decision bit-identically (q_debounce). A NULL-ts row gets a NULL
    * `kept` and leaves the state untouched (the withEwm passthrough
    * discipline — an instant-less row can neither be suppressed nor
    * anchor suppression). Appends `kept` (boolean); callers filter,
    * keeping the audit trail available. */
  def debounce(df: DataFrame, key: String, ts: String, tiebreak: String,
               minGapSeconds: Long): DataFrame = {
    val gapMicros = minGapSeconds * 1000000L
    val withUs = df.withColumn("__us", unix_micros(col(ts)))
    val usIdx = withUs.schema.fieldIndex("__us")
    Indicators.keyedSeriesScan(withUs, key, Seq(ts, tiebreak),
      Seq(org.apache.spark.sql.types.StructField("kept",
        org.apache.spark.sql.types.BooleanType))) { () =>
      new Indicators.SeriesFold {
        private var lastKept = Long.MinValue
        def reset(): Unit = lastKept = Long.MinValue
        def apply(row: org.apache.spark.sql.Row): Seq[Any] =
          if (row.isNullAt(usIdx)) Seq(null)
          else {
            val us = row.getLong(usIdx)
            val keep = lastKept == Long.MinValue || us - lastKept >= gapMicros
            if (keep) lastKept = us
            Seq(keep)
          }
      }
    }.drop("__us")
  }
}
