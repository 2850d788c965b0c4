package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph scoring over edge lists — the link-analysis layer for
 * corpus curation: score documents by their position in a similarity /
 * citation / co-occurrence graph (hub boilerplate scores high, isolated
 * pages low), then feed the score into mixture weights or dedup
 * representative choice.
 *
 * Everything here is FIXED-POINT (int64) arithmetic: each iteration's
 * scores are exact longs, so the result is bit-identical on any engine
 * replaying the same recurrence — no float summation-order drift, which
 * is what makes an iterative algorithm DuckDB-oracle-checkable (the same
 * discipline as text/TfIdf's int64 weights). Scale shape: one shuffle per
 * iteration (groupBy dst over the edge list), partial-combined map-side;
 * the score table is |nodes| rows and the edge list is never collected.
 */
object Graph {

  /** PageRank with integer fixed-point arithmetic: initial score `scale`
    * per node, per-iteration
    *   s'(v) = (3·scale)/20 + (17 · Σ_{u∈in(v)} s(u) DIV deg(u)) DIV 20
    * i.e. damping 0.85 as the rational 17/20, every division an integral
    * DIV — deterministic on any engine, no floats anywhere. Expects an
    * UNDIRECTED edge list (id1, id2) with no self-loops; it symmetrizes
    * internally, so every node has degree ≥ 1 and there are no dangling
    * nodes. Scores stay O(|nodes|·scale) total mass; with the default
    * scale=1e9 a sum overflows int64 only past ~9e9 nodes' worth of mass
    * concentrated on one vertex. Shallow runs (≤ 6 iterations — the
    * usual importance-scoring depth) build ONE lazy DAG so Catalyst
    * reuses the edge exchange across rounds; deeper loops switch to the
    * per-round localCheckpoint discipline of FuzzyDedup's component loop
    * (lineage past ~6 rounds costs more in planning than the
    * materialization saves). */
  def pageRankFixedPoint(pairs: DataFrame, iters: Int = 5,
                         scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && iters <= 30, s"iters out of range: $iters")
    val checkpointed = iters > 6
    def flatten(df: DataFrame): DataFrame =
      if (checkpointed) df.localCheckpoint() else df
    val edges = flatten(
      pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
        .distinct())
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val teleport = (3L * scale) / 20L
    var s = flatten(deg.select(col("src").as("id"), lit(scale).as("s")))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(s, edges("src") === s("id"))
        .join(deg, "src")
        .select(col("dst"), expr("s DIV deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("__in"))
      s = flatten(s.select(col("id"))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr("17 * coalesce(__in, 0L) DIV 20")).as("s")))
    }
    s
  }

  /** Weighted PageRank: same int64 fixed-point recurrence as
    * [[pageRankFixedPoint]] but mass flows proportionally to edge weight:
    *   contrib(u→v) = (s(u) · w(u,v)) DIV strength(u),  strength = Σ w
    * so a part co-purchased with another in 500 orders pulls 500× the
    * mass of a one-off pairing. Expects (id1, id2, w) with w ≥ 1 longs;
    * symmetrizes internally (same w both directions). Still DIV-only
    * integer arithmetic — deterministic anywhere; s·w must stay inside
    * int64 (fine for scale=1e9 and per-edge weights up to ~1e6 on
    * realistic mass concentrations; shard the scale down if a single
    * vertex could hold ≥1e12·scale mass). */
  def pageRankWeightedFixedPoint(pairs: DataFrame, iters: Int = 5,
                                 scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && iters <= 30, s"iters out of range: $iters")
    val checkpointed = iters > 6
    def flatten(df: DataFrame): DataFrame =
      if (checkpointed) df.localCheckpoint() else df
    val edges = flatten(pairs
      .select(col("id1").as("src"), col("id2").as("dst"), col("w"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst"),
        col("w")))
      .groupBy("src", "dst").agg(max(col("w")).as("w")))
    val strength = edges.groupBy(col("src")).agg(sum(col("w")).as("deg"))
    val teleport = (3L * scale) / 20L
    var s = flatten(strength.select(col("src").as("id"), lit(scale).as("s")))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(s, edges("src") === s("id"))
        .join(strength, "src")
        .select(col("dst"), expr("s * w DIV deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("__in"))
      s = flatten(s.select(col("id"))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr("17 * coalesce(__in, 0L) DIV 20")).as("s")))
    }
    s
  }

  /** Co-occurrence edge list: undirected distinct pairs of `item` values
    * sharing the same `group` (parts co-purchased in an order, tokens
    * sharing a document...). The per-group pair expansion is quadratic in
    * group size, so `maxGroupSize` drops oversized groups BEFORE pairing
    * (same cap discipline as the dedup shingle maxDf) — at 100 TB a
    * single degenerate group would otherwise dominate the join. */
  def coOccurrenceEdges(df: DataFrame, group: String, item: String,
                        maxGroupSize: Int = 1000): DataFrame = {
    val items = df.select(col(group).as("__g"), col(item).as("__i"))
      .distinct()
    val small = items.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxGroupSize)
      .select("__g")
    val in = items.join(small, "__g")
    in.as("a").join(in.as("b"),
        col("a.__g") === col("b.__g") && col("a.__i") < col("b.__i"))
      .select(col("a.__i").as("id1"), col("b.__i").as("id2"))
      .distinct()
  }

  /** [[coOccurrenceEdges]] with association strength: w = number of
    * groups the pair co-occurs in (each group contributes at most one —
    * items are de-duplicated per group first). Same maxGroupSize cap
    * before the quadratic expansion. */
  def coOccurrenceEdgesWeighted(df: DataFrame, group: String, item: String,
                                maxGroupSize: Int = 1000): DataFrame = {
    val items = df.select(col(group).as("__g"), col(item).as("__i"))
      .distinct()
    val small = items.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxGroupSize)
      .select("__g")
    val in = items.join(small, "__g")
    in.as("a").join(in.as("b"),
        col("a.__g") === col("b.__g") && col("a.__i") < col("b.__i"))
      .select(col("a.__i").as("id1"), col("b.__i").as("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("w"))
  }
}
