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
 *      one unbanded global window in the engine: range-band x (bounds
 *      from an IN-PLAN one-row aggregate — no driver action, the
 *      grouped exchange is reused), cummin the ≤nbands band minima
 *      (the only unpartitioned window, bounded by nbands), run the
 *      in-band strict-prefix window partitioned BY band (parallel),
 *      and take the least of the two — strictly-larger x lives either
 *      earlier in this band or in a higher band.
 *   3. join back + filter — a plain equi-join: AQE broadcasts the
 *      distinct-x-sized side while it fits the threshold and
 *      sort-merges past it, so a continuous x never demands an
 *      unbounded broadcast.
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

  /** Rows of `df` on the (max `x`, min `y`) Pareto frontier. */
  def skyline2D(df: DataFrame, x: String, y: String,
                nbands: Int = 256): DataFrame = {
    val grouped = df.groupBy(x).agg(min(col(y)).as("__best_at_x"))
    // banding needs an order-compatible numeric mapping; a NON-numeric
    // x (date, string) keeps the single-band formulation — its in-band
    // ordering is the type's own, exactly the pre-banding semantics
    // (casting such an x would either fail analysis or, under default
    // ANSI, mix numeric band order with lexicographic in-band order)
    val numericX = df.schema(x).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val bestAtX =
      if (!numericX)
        grouped.withColumn("__b",
          when(col(x).isNull, lit(-1)).otherwise(lit(0)))
      else {
        // band bounds as a broadcast ONE-ROW frame computed inside the
        // same plan — a driver-side stats action here would re-execute
        // the whole upstream (the input is typically itself an
        // aggregate), doubling the query; in-plan, the grouped exchange
        // is built once and REUSED by every consumer below
        val bounds = grouped.agg(min(col(x).cast("double")).as("__lo"),
          max(col(x).cast("double")).as("__hi"))
        val width = (col("__hi") - col("__lo")) / lit(nbands.toDouble)
        val bandOf =
          when(col(x).isNull, lit(-1))
            .when(col("__hi") <= col("__lo"), lit(0))
            .otherwise(floor(least(lit((nbands - 1).toDouble),
              greatest(lit(0.0),
                (col(x).cast("double") - col("__lo")) / width)))
              .cast("int"))
        grouped.crossJoin(broadcast(bounds))
          .withColumn("__b", bandOf).drop("__lo", "__hi")
      }
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
    // plain equi-join back: AQE broadcasts the (distinct-x-sized) pref
    // side while it fits the threshold and sort-merges past it — a
    // continuous x never demands an unbounded forced broadcast
    df.join(pref, Seq(x))
      .filter(col(y) === col("__best_at_x")
        && (col("__pref").isNull || col(y) < col("__pref")))
      .drop("__best_at_x", "__pref")
  }
}
