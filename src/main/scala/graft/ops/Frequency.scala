package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SketchAggs

/**
 * Heavy hitters over unbounded-cardinality keys, two passes:
 *
 *  1. a Misra-Gries summary (functions/FreqItemsAgg) scans once with at
 *     most `k` counters per partial buffer — every value whose true share
 *     exceeds 1/k is guaranteed to survive, at any cardinality, in any
 *     arrival/merge order;
 *  2. the <= k survivors are exact-counted (broadcast semi-join restricts
 *     the second scan's aggregation to candidate keys only) and thresholded.
 *
 * The output is therefore EXACT and deterministic — the sketch only decides
 * what not to count, never what the counts are. A single-pass plain
 * groupBy-count is better when the key cardinality fits a shuffle; this is
 * for the "group count ~ row count" regime (URLs, user ids, n-grams at
 * 100 TB) where the exact groupBy's shuffle is the bottleneck and only the
 * frequent tail matters.
 */
object Frequency {

  /** Values of `keyCol` (as strings) whose share of non-null rows exceeds
    * `minFraction`, with exact counts. Requires minFraction >= 1/k, else
    * the sketch cannot guarantee recall (enforced). */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
                   minFraction: Double): DataFrame = {
    require(minFraction >= 1.0 / k,
      s"minFraction ($minFraction) must be >= 1/k (${1.0 / k}) " +
        "for the Misra-Gries recall guarantee to hold")
    val key = col(keyCol).cast("string")
    // the total row count rides in the sketch pass, so the operator costs
    // exactly two scans: sketch+count, then the candidate-filtered re-count
    val candidates = df.filter(key.isNotNull)
      .agg(SketchAggs.freqItems(key, k).as("__cands"),
        count(lit(1)).as("__n"))
      .select(explode(col("__cands")).as("item"), col("__n"))
    df.filter(key.isNotNull)
      .select(key.as("item"))
      .join(broadcast(candidates), Seq("item"))
      .groupBy("item", "__n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("__n") * minFraction)
      .select("item", "cnt")
  }

  /** Per-segment mergeable KLL quantile sketches (the percentile sibling
    * of Dedup.hllSketches): one ~few-KB binary per group whose union
    * answers quantiles over ANY segment range with no raw rescan —
    * incremental percentile maintenance for a daily 100 TB ingest.
    * k = 200 ⇒ ~1.65% normalized rank error, preserved under merge. */
  def kllSketches(df: DataFrame, keys: Seq[String], value: String,
                  k: Int = 200): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.KllSketches.kllSketch(col(value), k)
        .as("kll_sketch"), count(col(value)).as("n_rows"))

  /** Per-segment count-min frequency sketches over a string item column
    * (Spark's own builder aggregate, so binaries interop with
    * `count_min_sketch(...)` SQL). Fixed seed ⇒ deterministic bytes. */
  def cmsSketches(df: DataFrame, keys: Seq[String], item: String,
                  eps: Double = 0.001, confidence: Double = 0.99,
                  seed: Int = 42): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count_min_sketch(col(item), lit(eps), lit(confidence),
        lit(seed)).as("cms_sketch"), count(col(item)).as("n_rows"))

  /** Union stored count-min binaries and point-query a fixed item list —
    * one row per item, no raw rescan (the frequency sibling of
    * [[kllMergedQuantiles]]). Estimates NEVER undercount; they
    * overcount by at most eps·N with the sketch's confidence. */
  def cmsMergedCounts(sketches: DataFrame, items: Seq[String]): DataFrame =
    sketches
      .agg(graft.functions.CmsSketches.cmsUnion(col("cms_sketch"))
        .as("__merged"), sum(col("n_rows")).as("n_rows"))
      .select(col("n_rows"),
        posexplode(graft.functions.CmsSketches.cmsEstimates(col("__merged"),
          items)).as(Seq("__i", "count_est")))
      .withColumn("item", element_at(typedlit(items), col("__i") + 1))
      .select("item", "count_est", "n_rows")

  /** Union stored sketches and read quantiles at `ranks` — cost is
    * O(sketches), independent of row count. One row per rank. */
  def kllMergedQuantiles(sketches: DataFrame, ranks: Seq[Double],
                         k: Int = 200): DataFrame =
    sketches
      .agg(graft.functions.KllSketches.kllUnion(col("kll_sketch"), k)
        .as("__merged"), sum(col("n_rows")).as("n_rows"))
      .select(col("n_rows"),
        posexplode(graft.functions.KllSketches.kllQuantiles(col("__merged"),
          ranks)).as(Seq("__i", "value_est")))
      .withColumn("q", element_at(typedlit(ranks), col("__i") + 1))
      .select("q", "value_est", "n_rows")
}
