package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Duplicate detection and distinct counting (SURVEY §2.3 A5-A7).
 */
object Dedup {

  /** A5: duplicate-key detection — groups with more than one row.
    * Reference (declared QA invariant): README.md:744-749. */
  def dupCheck(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** A6: exact distinct counts per column set. At 100 TB prefer
    * approxDistinct below; exact countDistinct expands to a two-phase
    * aggregate (expand + two shuffles). */
  def distinctCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      cols.map(c => countDistinct(col(c)).as(s"n_$c")): _*)

  /** A6 at scale: HLL-sketch distinct count — single pass, no expand,
    * mergeable across partitions. */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.01): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      cols.map(c => approx_count_distinct(col(c), rsd).as(s"n_$c")): _*)

  /** HLL estimates validated against exact counts: emits n_rows, the exact
    * distinct count per column, and a `<col>_within_rsd` flag asserting the
    * HLL estimate landed within 5*rsd of the exact value. The flags make
    * the probabilistic sketch cross-engine checkable — the exact side is
    * oracle-computable and a healthy sketch must satisfy the bound (HLL
    * error is ~N(0, rsd), so 5 sigma; a false flag means the sketch is
    * broken, not unlucky). */
  def approxDistinctBounds(df: DataFrame, cols: Seq[String],
                           rsd: Double = 0.01): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      countDistinct(col(c)).as(s"n_${c}_exact"),
      approx_count_distinct(col(c), rsd).as(s"__n_${c}_approx")))
    val out = col("n_rows") +: cols.map(c => col(s"n_${c}_exact")) ++:
      cols.map(c =>
        (abs(col(s"__n_${c}_approx") - col(s"n_${c}_exact")) <=
          lit(5 * rsd) * col(s"n_${c}_exact")).as(s"${c}_within_rsd"))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*).select(out: _*)
  }

  /** A7: keep-last dedup (delegates to the row_number formulation). */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame =
    WindowAnalytics.keepLast(df, keys, order)

  /** Mergeable distinct-count sketches as STORED COLUMNS (DataSketches
    * HLL): one binary sketch per group, re-mergeable later without
    * rescanning the raw data — the incremental pattern a 100 TB/day ingest
    * needs: sketch each new partition/day once at landing, answer "distinct
    * over any date range" by unioning a handful of 4 KiB sketches
    * (approx_count_distinct merges only inside one aggregation and leaves
    * nothing reusable behind). lgConfigK=12 -> ~4 KiB, ~1.6% rse. */
  def hllSketches(df: DataFrame, keys: Seq[String], distinctCol: String,
                  lgConfigK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(distinctCol), lgConfigK).as("hll_sketch"),
        count(lit(1)).as("n_rows"))

  /** Union stored sketches back into one distinct estimate — no raw-data
    * rescan; cost is O(sketches), independent of row count. */
  def hllMergedDistinct(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("hll_sketch")))
        .as("n_distinct_est"),
      sum(col("n_rows")).as("n_rows"))

  /** Theta sketches: distinct-count SET ALGEBRA across segments. Unlike
    * HLL (union-only), stored theta sketches also answer |A∩B| and |A\B| —
    * audience overlap between segments, "users new today vs yesterday" —
    * again with no raw rescan. Below ~2^lgK distinct values the sketch
    * retains every hash (exact mode); beyond that it samples at ~1/theta. */
  def thetaSketches(df: DataFrame, keys: Seq[String], distinctCol: String,
                    lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(theta_sketch_agg(col(distinctCol), lgK).as("theta_sketch"))

  /** |A∪B| / |A∩B| / |A\B| estimates from two stored sketch columns. */
  def thetaAlgebra(df: DataFrame, a: Column, b: Column): DataFrame =
    df.select(col("*"),
      theta_sketch_estimate(theta_union(a, b)).as("n_union_est"),
      theta_sketch_estimate(theta_intersection(a, b)).as("n_inter_est"),
      theta_sketch_estimate(theta_difference(a, b)).as("n_diff_est"))
}
