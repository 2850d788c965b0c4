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
 *   2. strict-prefix cumulative min over distinct x desc — computed by
 *      the repo's banded two-pass ([[Curate.quantileNormalize]]'s
 *      pattern), because for a CONTINUOUS x the distinct-x table is
 *      input-sized and a single-partition window over it would be the
 *      one unbanded global window in the engine: range-band x (one
 *      input-pass min/max), cummin the ≤nbands band minima (tiny
 *      driver-adjacent window), run the in-band strict-prefix window
 *      partitioned BY band (parallel), and take the least of the two —
 *      strictly-larger x lives either earlier in this band or in a
 *      higher band.
 *   3. join back + filter — broadcast while the approx distinct-x count
 *      fits [[broadcastCapDefault]], a plain equi-join (AQE-planned)
 *      past it, so a continuous x can never demand an unbounded
 *      broadcast.
 * Ties: equal (x, y) points dominate neither way and are all kept —
 * `y < strict-prefix min` (strict) + `y = min-at-x` (non-strict)
 * encodes exactly the standard dominance definition. The in-band
 * window has no order peers (its input is one row per distinct x), so
 * the row-frame strict prefix is exact. A NULL or non-numeric-castable
 * x lands in a dedicated lowest band (dominated by every real band),
 * which for a wholly non-numeric x degrades to the single-window
 * formulation rather than mis-banding.
 */
object Skyline {

  /** Above this many (approximate) distinct x values the join back to
    * the input stops broadcasting. */
  val broadcastCapDefault = 1000000L

  /** Rows of `df` on the (max `x`, min `y`) Pareto frontier. */
  def skyline2D(df: DataFrame, x: String, y: String,
                nbands: Int = 256,
                broadcastCap: Long = broadcastCapDefault): DataFrame = {
    // band range + join-strategy size in ONE shuffle-free input pass
    val st = df.agg(min(col(x)).cast("double").as("__lo"),
      max(col(x)).cast("double").as("__hi"),
      approx_count_distinct(col(x)).as("__nd")).first()
    val (lo, hi) =
      if (st.isNullAt(0)) (0.0, 1.0) else (st.getDouble(0), st.getDouble(1))
    val nd = st.getLong(2)
    val bandOf =
      when(col(x).isNull || col(x).cast("double").isNull, lit(-1))
        .otherwise(
          if (hi > lo) Stats.binColumn(col(x).cast("double"), lo, hi, nbands)
          else lit(0))
    val bestAtX = df.groupBy(x).agg(min(col(y)).as("__best_at_x"))
      .withColumn("__b", bandOf)
    // strict-prefix cummin over the ≤nbands+1 band MINIMA: the only
    // unpartitioned window, bounded by nbands however large the input
    val bandPref = bestAtX.groupBy("__b")
      .agg(min(col("__best_at_x")).as("__bmin"))
      .withColumn("__bpref",
        min(col("__bmin")).over(Window.orderBy(col("__b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .drop("__bmin")
    val wIn = Window.partitionBy(col("__b")).orderBy(col(x).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = bestAtX.join(broadcast(bandPref), "__b")
      .withColumn("__pref",
        least(min(col("__best_at_x")).over(wIn), col("__bpref")))
      .drop("__b", "__bpref")
    val joined =
      if (nd <= broadcastCap) df.join(broadcast(pref), Seq(x))
      else df.join(pref, Seq(x))
    joined
      .filter(col(y) === col("__best_at_x")
        && (col("__pref").isNull || col(y) < col("__pref")))
      .drop("__best_at_x", "__pref")
  }
}
