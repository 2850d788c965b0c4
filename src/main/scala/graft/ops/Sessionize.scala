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
}
