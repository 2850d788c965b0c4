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

  /** Enforced input contract for the iterative ops: canonical undirected
    * pairs, id1 < id2 — the [[coOccurrenceEdges]] shape. The strict `<`
    * rejects self-loops AND any both-orientations input (a reversed copy
    * must violate it on one side), the two shapes whose silent acceptance
    * would double-count degrees/votes. The check is a codegen'd per-row
    * compare (assert_true kept alive by the isNull filter) — effectively
    * free, fails loudly. EXACT duplicates of a canonical pair are handled
    * downstream: the symmetrized list dedups (src, dst) ON the hash(src)
    * layout it is already exchanged to (a hash aggregate, no extra
    * shuffle — HashPartitioning(src) satisfies the (src, dst) clustering),
    * so duplicate-carrying input counts each edge once instead of
    * silently inflating degrees and votes. */
  private def requireCanonicalPairs(pairs: DataFrame): DataFrame =
    pairs.filter(assert_true(col("id1") < col("id2"),
      lit("graph iteration ops expect canonical DISTINCT (id1 < id2) " +
        "pairs: self-loop or reversed-duplicate row found; build edges " +
        "with coOccurrenceEdges or canonicalize upstream")).isNull)

  /** PageRank with integer fixed-point arithmetic: initial score `scale`
    * per node, per-iteration
    *   s'(v) = (3·scale)/20 + (17 · Σ_{u∈in(v)} s(u) DIV deg(u)) DIV 20
    * i.e. damping 0.85 as the rational 17/20, every division an integral
    * DIV — deterministic on any engine, no floats anywhere. Expects the
    * [[coOccurrenceEdges]] shape: canonical undirected (id1 < id2) pairs,
    * no self-loops; it symmetrizes internally and dedups (src, dst) on
    * the already-exchanged hash(src) layout (a hash aggregate, no extra
    * shuffle), so exact duplicate input pairs count once; every node has
    * degree ≥ 1, no dangling nodes. Scores stay O(|nodes|·scale) total mass; with the default
    * scale=1e9 a sum overflows int64 only past ~9e9 nodes' worth of mass
    * concentrated on one vertex.
    *
    * Iteration shape (probed in GraphPerfProbe — the lazy shared-subtree
    * form left Catalyst re-deriving the edge exchange across rounds):
    * the static per-node degree is folded INTO the edge list once and
    * the (src, dst, deg) triple is materialized partitioned on `src`, so
    * every round is one exchange-free-on-the-edge-side join against the
    * |nodes|-sized score table plus one partial-aggregated groupBy(dst)
    * — per-round shuffle volume is O(|nodes|), never O(|edges|), at any
    * scale. */
  def pageRankFixedPoint(pairs: DataFrame, iters: Int = 5,
                         scale: Long = 1000000000L,
                         retainCache: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 30, s"iters out of range: $iters")
    def flatten(df: DataFrame): DataFrame =
      if (iters > 6) df.localCheckpoint() else df
    // ONE exchange (on src) builds the whole loop input. persist(), not
    // localCheckpoint(): the in-memory relation KEEPS the hash(src)
    // output partitioning (a checkpoint's ExistingRDD scan reports
    // unknown partitioning — its plans re-inserted an exchange under
    // every downstream aggregation, verified via explain during
    // GraphPerfProbe work), so the degree aggregate, the deg-fold join,
    // the node-frame distinct, and every round's join all ride the one
    // layout. Degree comes from a HASH aggregate (O(1) state per node),
    // not a count-over-window — a window would buffer a hub node's whole
    // adjacency in one group, the skew shape the maxGroupSize doctrine
    // exists to avoid. The intermediate symmetrized cache is released
    // once the deg-folded edge list materializes; the edges/ids caches
    // live for the session (plan-keyed, so identical re-runs share them
    // — warm executions price the loop, not the edge build, exactly like
    // the shared dedup index does for the dedup family).
    val canon = requireCanonicalPairs(pairs)
    // dropDuplicates rides the hash(src) layout (no exchange): exact
    // duplicate input pairs count once instead of inflating degrees
    val sym = canon.select(col("id1").as("src"), col("id2").as("dst"))
      .union(canon.select(col("id2").as("src"), col("id1").as("dst")))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .persist()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edges = sym.join(deg, "src").persist()
    val ids = edges.select(col("src").as("id")).distinct().persist()
    edges.count() // materialize before dropping the intermediate
    sym.unpersist(false)
    val teleport = (3L * scale) / 20L
    var s = ids.select(col("id"), lit(scale).as("s"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(s, edges("src") === s("id"))
        .select(col("dst"), expr("s DIV deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("__in"))
      s = flatten(ids
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr("17 * coalesce(__in, 0L) DIV 20")).as("s")))
    }
    releaseOrRetain(s, retainCache, edges, ids)
  }

  /** Cache policy for the iterative ops: by default the edge/id caches
    * live for the session (plan-keyed — identical re-runs share them, the
    * warm-execution discipline the bench prices). A long-lived driver
    * iterating over MANY distinct graphs accumulates those entries
    * without bound; `retainCache = false` instead materializes the result
    * eagerly (localCheckpoint severs it from the cached lineage) and
    * releases the loop inputs before returning. */
  private def releaseOrRetain(result: DataFrame, retain: Boolean,
                              caches: DataFrame*): DataFrame =
    if (retain) result
    else {
      val out = result.localCheckpoint()
      caches.foreach(_.unpersist(false))
      out
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
                                 scale: Long = 1000000000L,
                                 retainCache: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 30, s"iters out of range: $iters")
    def flatten(df: DataFrame): DataFrame =
      if (iters > 6) df.localCheckpoint() else df
    // same one-exchange shape as [[pageRankFixedPoint]]: hash(src)
    // clustering satisfies the (src, dst) weight-dedup grouping AND the
    // hash-aggregated strength AND the round joins; the strength fold
    // and cache discipline mirror the unweighted form (see its note)
    val canon = requireCanonicalPairs(pairs)
    val sym = canon
      .select(col("id1").as("src"), col("id2").as("dst"), col("w"))
      .union(canon.select(col("id2").as("src"), col("id1").as("dst"),
        col("w")))
      .repartition(col("src"))
      .groupBy("src", "dst").agg(max(col("w")).as("w"))
      .persist()
    val strength = sym.groupBy(col("src")).agg(sum(col("w")).as("deg"))
    val edges = sym.join(strength, "src").persist()
    val ids = edges.select(col("src").as("id")).distinct().persist()
    edges.count() // materialize before dropping the intermediate
    sym.unpersist(false)
    val teleport = (3L * scale) / 20L
    var s = ids.select(col("id"), lit(scale).as("s"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(s, edges("src") === s("id"))
        .select(col("dst"), expr("s * w DIV deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("__in"))
      s = flatten(ids
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr("17 * coalesce(__in, 0L) DIV 20")).as("s")))
    }
    releaseOrRetain(s, retainCache, edges, ids)
  }

  /** Community detection by synchronous label propagation: every node
    * starts as its own community (label = its numeric id); each round,
    * every node simultaneously adopts the most frequent label among its
    * neighbors, ties to the SMALLEST label — fully deterministic, no
    * randomized update order (async LPA's usual nondeterminism is
    * exactly what an oracle-checked engine can't ship). A fixed round
    * count is a deterministic snapshot even where synchronous LPA would
    * oscillate (e.g. perfect bipartite cores).
    *
    * Expects the [[coOccurrenceEdges]] shape — undirected (id1, id2)
    * NUMERIC id pairs, no self-loops; symmetrized internally. Per round:
    * one join of the edge list against the |nodes|-sized label table and
    * one (src, label) count aggregate — the argmax rides the aggregate
    * as max(struct(n, −label)), no window. Label tables stay
    * |nodes|-sized; the shallow-run lazy-DAG discipline of
    * [[pageRankFixedPoint]] applies (checkpoint past 6 rounds). */
  def labelPropagation(pairs: DataFrame, iters: Int = 3,
                       retainCache: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 30, s"iters out of range: $iters")
    // The edge list materializes ONCE, hash-partitioned on src — via
    // persist(), whose in-memory relation keeps the partitioning a
    // localCheckpoint would erase (see pageRankFixedPoint's note).
    // hash(src) clustering satisfies BOTH per-round groupings
    // ((src, community) vote count and the per-src argmax), so the only
    // per-round movement is the label table into the join: broadcast
    // while |nodes| fits (the planner's choice — here it always has),
    // else a sort-merge exchange of the edge side; either way the vote
    // aggregations never shuffle. Input is the coOccurrenceEdges
    // contract — canonical (id1 < id2) pairs, enforced by the guard;
    // exact duplicates dedup on the already-exchanged layout below.
    val canon = requireCanonicalPairs(pairs)
    // dropDuplicates rides the hash(src) layout (no exchange): exact
    // duplicate input pairs vote once instead of double-counting
    val edges = canon.select(col("id1").as("src"), col("id2").as("dst"))
      .union(canon.select(col("id2").as("src"), col("id1").as("dst")))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .persist()
    def flatten(df: DataFrame): DataFrame =
      if (iters > 6) df.localCheckpoint() else df
    // distinct on src rides the existing partitioning: no exchange
    var lab = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").cast("long").as("community"))
    for (_ <- 1 to iters) {
      // argmax via the O(1)-buffer VoteArgMax aggregate: the declarative
      // spellings (max/max_by over a struct) carry struct buffers that
      // force SortAggregate — a sort of every vote row, every round
      lab = flatten(edges
        .join(lab, edges("dst") === lab("id"))
        .groupBy(col("src"), col("community"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("src").as("id"))
        .agg(graft.functions.VoteArgMax
          .voteArgMax(col("__n"), col("community")).as("community")))
    }
    releaseOrRetain(lab, retainCache, edges)
  }

  /** Co-occurrence edge list: undirected distinct pairs of `item` values
    * sharing the same `group` (parts co-purchased in an order, tokens
    * sharing a document...). The per-group pair expansion is quadratic in
    * group size, so `maxGroupSize` drops oversized groups BEFORE pairing
    * (same cap discipline as the dedup shingle maxDf) — at 100 TB a
    * single degenerate group would otherwise dominate the join. */
  def coOccurrenceEdges(df: DataFrame, group: String, item: String,
                        maxGroupSize: Int = 1000): DataFrame =
    groupPairs(df, group, item, maxGroupSize).distinct()

  /** All (id1 < id2) co-occurring item pairs, one row per (group, pair)
    * occurrence. Groups collapse to sorted distinct-item arrays, then
    * pairs expand NARROWLY from each array — the per-group quadratic
    * happens in memory on ≤ maxGroupSize elements, never as a per-group
    * self-join exchange.
    *
    * The collect itself is the capped aggregate
    * [[graft.functions.CappedSetAgg]], not collect_set: a plain
    * collect_set buffer grows with the group's distinct-item count —
    * exactly what a degenerate group would blow up — while the capped
    * buffer holds ≤ maxGroupSize+1 elements on every partial and nulls
    * out overflowing groups, which the size filter was dropping anyway.
    * Exact semantics, ONE shuffle, bounded state. */
  private def groupPairs(df: DataFrame, group: String, item: String,
                         maxGroupSize: Int): DataFrame = {
    df.select(col(group).as("__g"), col(item).as("__i"))
      .groupBy("__g")
      .agg(graft.functions.CappedSetAgg
        .cappedSortedSet(col("__i"), maxGroupSize).as("__arr"))
      .filter(col("__arr").isNotNull && size(col("__arr")) >= 2)
      .select(explode(expr(
        "flatten(transform(__arr, (x, i) -> " +
          "transform(slice(__arr, i + 2, size(__arr) - i - 1), " +
          "y -> struct(x AS id1, y AS id2))))")).as("__p"))
      .select(col("__p.id1").as("id1"), col("__p.id2").as("id2"))
  }

  /** [[coOccurrenceEdges]] with association strength: w = number of
    * groups the pair co-occurs in (each group contributes at most one —
    * items are de-duplicated per group first). Same maxGroupSize cap
    * before the quadratic expansion. */
  def coOccurrenceEdgesWeighted(df: DataFrame, group: String, item: String,
                                maxGroupSize: Int = 1000): DataFrame =
    groupPairs(df, group, item, maxGroupSize)
      .groupBy("id1", "id2").agg(count(lit(1)).as("w"))

  /** Association rules over co-occurring items: for each item pair
    * seen together in ≥ `minCount` groups, emit support, directional
    * confidences, and lift — the market-basket metrics (and, on a
    * corpus, the "these two tags/entities co-occur more than chance"
    * signal).
    *
    *   support = w/N,  conf(a⇒b) = w/n_a,  lift = w·N/(n_a·n_b)
    *
    * with w = groups containing both, n_x = groups containing x, N =
    * groups — every count exact int64 off ONE capped-collect pass
    * (the [[graft.functions.CappedSetAgg]] discipline: oversized
    * groups drop before any quadratic work), every metric a single
    * IEEE divide of exact ints. The group arrays snapshot once and
    * feed all three consumers (N, item counts, pair expansion). */
  def associationRules(df: DataFrame, group: String, item: String,
                       maxGroupSize: Int = 1000,
                       minCount: Long = 2L): DataFrame = {
    val arrs = df.select(col(group).as("__g"), col(item).as("__i"))
      .groupBy("__g")
      .agg(graft.functions.CappedSetAgg
        .cappedSortedSet(col("__i"), maxGroupSize).as("__arr"))
      .filter(col("__arr").isNotNull)
      .localCheckpoint()
    val nGroups = arrs.agg(count(lit(1)).as("__n"))
    val itemCounts = arrs
      .select(explode(col("__arr")).as("__item"))
      .groupBy("__item").agg(count(lit(1)).as("__ni"))
    val pairs = arrs.filter(size(col("__arr")) >= 2)
      .select(explode(expr(
        "flatten(transform(__arr, (x, i) -> " +
          "transform(slice(__arr, i + 2, size(__arr) - i - 1), " +
          "y -> struct(x AS id1, y AS id2))))")).as("__p"))
      .groupBy(col("__p.id1").as("id1"), col("__p.id2").as("id2"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minCount)
    // item-count joins stay unhinted: the item vocabulary may be far
    // past broadcast size at corpus scale — AQE broadcasts when small
    pairs
      .join(itemCounts.select(col("__item").as("id1"),
        col("__ni").as("__na")), "id1")
      .join(itemCounts.select(col("__item").as("id2"),
        col("__ni").as("__nb")), "id2")
      .crossJoin(broadcast(nGroups))
      .select(col("id1"), col("id2"), col("w"),
        (col("w").cast("double") / col("__n").cast("double"))
          .as("support"),
        (col("w").cast("double") / col("__na").cast("double"))
          .as("conf_1_to_2"),
        (col("w").cast("double") / col("__nb").cast("double"))
          .as("conf_2_to_1"),
        ((col("w") * col("__n")).cast("double")
          / (col("__na") * col("__nb")).cast("double")).as("lift"))
  }

  /** Per-vertex triangle counts + local clustering coefficient over an
    * undirected edge list — the cohesion signal that separates tight
    * near-dup/boilerplate cliques (cc → 1) from hub-like connectors
    * (cc → 0) in a similarity graph.
    *
    * Degree-oriented adjacency intersection: every edge is directed
    * from its (degree, id)-smaller endpoint to the larger, so a
    * vertex's OUT-neighborhood is O(√m) even for hubs; each triangle
    * then closes exactly once, at its orientation-minimal edge, as
    * w ∈ N⁺(u) ∩ N⁺(v). The intersection runs per edge over two
    * bounded arrays (array_intersect is hash-linear) — the wedge set is
    * never materialized through a shuffle, which is what makes this
    * ~m^1.5 CPU-bound instead of a Σoutdeg²-row exchange. Shuffles:
    * canonicalize, degree agg, adjacency agg, and two edge⋈adjacency
    * joins — all |edges|-bounded (the same cap-the-quadratic discipline
    * as [[coOccurrenceEdges]]). Everything is exact integer counting;
    * the clustering coefficient 2·T_v / (deg·(deg−1)) is the single
    * IEEE divide of exact int64s, NULL for degree < 2 (no possible
    * wedge — not 0/0).
    *
    * Input edges may carry duplicates / reversed copies / self-loops;
    * they canonicalize to distinct (lo < hi) pairs first. */
  def triangleStats(edges: DataFrame, src: String = "id1",
                    dst: String = "id2",
                    retainCache: Boolean = true): DataFrame = {
    // materialized: canon feeds the degree agg AND the orientation join,
    // and upstream edge builders (coOccurrenceEdges' capped self-join)
    // are far more expensive than the |edges| snapshot — without this
    // the build would re-run for every consumer below (the same
    // discipline as pageRank's deep-loop checkpoint and Q21's late set)
    val canon = edges
      .select(least(col(src), col(dst)).as("lo"),
        greatest(col(src), col(dst)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .persist() // keeps (lo, hi) partitioning; warm re-runs skip the build
    val deg = canon.select(col("lo").as("id"))
      .unionAll(canon.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    // orient by (degree, id): u -> v iff (deg_u, u) < (deg_v, v)
    val withDeg = canon
      .join(deg.select(col("id").as("lo"), col("degree").as("__dl")), "lo")
      .join(deg.select(col("id").as("hi"), col("degree").as("__dh")), "hi")
    val oriented = withDeg.select(
      when(col("__dl") < col("__dh") ||
          (col("__dl") === col("__dh") && col("lo") < col("hi")),
        struct(col("lo").as("u"), col("hi").as("v")))
        .otherwise(struct(col("hi").as("u"), col("lo").as("v")))
        .as("__e"))
      .select(col("__e.u").as("u"), col("__e.v").as("v"))
    // for the triangle a < b < c (orientation order), only the (a, b)
    // edge sees c in N⁺(u) ∩ N⁺(v): a→c exists but c→b does not, so no
    // other edge of the triangle can close it — each triangle counts
    // once, crediting u, v, and every common neighbor w
    val adj = oriented.groupBy(col("u"))
      .agg(collect_list(col("v")).as("__nu"))
    val tris = oriented
      .join(adj, Seq("u"))
      .join(adj.select(col("u").as("v"), col("__nu").as("__nv")), Seq("v"))
      .withColumn("__common", array_intersect(col("__nu"), col("__nv")))
      .filter(size(col("__common")) > 0)
      .select(col("u"), col("v"), col("__common"))
    val perVertex = tris
      .select(col("u").as("id"), size(col("__common")).cast("long").as("__t"))
      .unionAll(tris.select(col("v").as("id"),
        size(col("__common")).cast("long").as("__t")))
      .unionAll(tris.select(explode(col("__common")).as("id"),
        lit(1L).as("__t")))
      .groupBy("id").agg(sum(col("__t")).as("triangles"))
    val out = deg.join(perVertex, Seq("id"), "left")
      .na.fill(0L, Seq("triangles"))
      .withColumn("clustering_coeff",
        when(col("degree") < 2L, lit(null))
          .otherwise((lit(2L) * col("triangles")).cast("double")
            / (col("degree") * (col("degree") - lit(1L))).cast("double")))
    releaseOrRetain(out, retainCache, canon)
  }
}
