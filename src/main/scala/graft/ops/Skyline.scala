package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * 2-D skyline (Pareto frontier): rows not dominated in (maximize `x`,
 * minimize `y`) — the dominance query behind "best tradeoff" curation
 * cuts (e.g. highest-volume / lowest-price suppliers, highest-quality /
 * shortest documents).
 *
 * Spark-first shape — NO pair join: a point survives iff its y is the
 * best at its exact x AND strictly better than every y at strictly
 * larger x. Both conditions come from the distinct-x table:
 *   1. groupBy(x) -> min y per distinct x (one shuffle, input-sized);
 *   2. strict-prefix cumulative min over distinct x desc — a window over
 *      the DISTINCT-X table only, which for any aggregated entity
 *      (parts, suppliers, docs-by-score-band) is orders of magnitude
 *      smaller than the input, so the single-partition window is a
 *      deliberate small-table pass (same stance as Similarity's
 *      centroid table), not a scale hazard;
 *   3. broadcast join back + filter — input-sized, shuffle-free.
 * Ties: equal (x, y) points dominate neither way and are all kept —
 * `y < strict-prefix min` (strict) + `y = min-at-x` (non-strict)
 * encodes exactly the standard dominance definition.
 */
object Skyline {

  /** Rows of `df` on the (max `x`, min `y`) Pareto frontier. */
  def skyline2D(df: DataFrame, x: String, y: String): DataFrame = {
    val bestAtX = df.groupBy(x).agg(min(col(y)).as("__best_at_x"))
    val pref = bestAtX.withColumn("__pref",
      min(col("__best_at_x")).over(
        Window.orderBy(col(x).desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
    df.join(broadcast(pref), Seq(x))
      .filter(col(y) === col("__best_at_x")
        && (col("__pref").isNull || col(y) < col("__pref")))
      .drop("__best_at_x", "__pref")
  }
}
