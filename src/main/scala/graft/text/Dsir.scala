package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection (Xie et al. 2023, "Data Selection for
 * Language Models via Importance Resampling"): score every raw document
 * by how much more likely its hashed bag-of-words is under a TARGET
 * distribution than under the raw-corpus distribution, and keep the
 * top-k — the standard recipe for skimming a web-scale crawl toward a
 * curated target domain.
 *
 * Features are the hashing trick (FeatureHash's md5-bucket scheme —
 * engine-replayable, no vocabulary pass); both bucket distributions use
 * add-α smoothing over the FIXED bucket space, so the per-bucket
 * log-ratio table is exactly `buckets` rows however large the corpus.
 *
 * Scale shape: two corpus-sized grouped aggregations (the shared bucket
 * distribution and the per-doc bucket counts — both map-side partial),
 * one broadcast of the `buckets`-row log-ratio table, and a TakeOrdered
 * top-k. No global sort, no vocabulary broadcast, no driver state
 * beyond k rows. Determinism: weights are rounded to 4 decimals and
 * ties break on the id — float summation order can never move the cut.
 */
object Dsir {

  /** Per-document importance weight `(id, logw)`:
    * logw = Σ_b count_doc[b] × [ln p_target(b) − ln p_raw(b)] with
    * add-α smoothing, rounded r4. `isTarget` marks the target-domain
    * exemplar docs (they stay part of the raw distribution, as in the
    * paper's raw = full-corpus formulation). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 256,
                        alpha: Double = 1.0): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 24),
      s"bucket count out of range: $buckets")
    val toks = docs
      .select(col(idCol), isTarget.as("__tgt"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .withColumn("b",
        (conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long")
          % buckets).cast("int"))
    val dist = toks.groupBy(col("b")).agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("t"),
      count(lit(1)).as("q"))
    val tot = dist.agg(sum(col("t")).as("tn"), sum(col("q")).as("qn"))
    val ratio = dist.crossJoin(tot).select(col("b"),
      (log(col("t") + lit(alpha))
        - log(col("tn") + lit(alpha * buckets))
        - log(col("q") + lit(alpha))
        + log(col("qn") + lit(alpha * buckets))).as("lr"))
    toks.groupBy(col(idCol), col("b")).agg(count(lit(1)).as("c"))
      .join(broadcast(ratio), Seq("b"))
      .groupBy(col(idCol))
      .agg(round(sum(col("c") * col("lr")), 4).as("logw"))
  }

  /** The selected top-k docs (all of `docs`' columns + `logw`), by
    * weight desc then id asc — the deterministic cut. */
  def selectTopK(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, k: Int, buckets: Int = 256,
                 alpha: Double = 1.0): DataFrame =
    docs
      .join(importanceWeights(docs, idCol, textCol, isTarget, buckets,
        alpha), Seq(idCol))
      .orderBy(col("logw").desc, col(idCol).asc)
      .limit(k)
}
