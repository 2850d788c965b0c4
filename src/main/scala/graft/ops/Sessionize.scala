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
}
