package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference aggregation — the strength model behind
  * preference-data curation (RLHF comparisons, A/B outcomes, ranking
  * votes): given "i beat j" rows, recover a per-item strength such that
  * P(i beats j) ≈ s_i / (s_i + s_j) (Bradley-Terry 1952).
  *
  * Same determinism discipline as [[Graph]]: the minorize-maximize
  * update runs a FIXED number of rounds in int64 fixed-point with
  * integral DIV only. Scores live in units of S = `scale` (s = S ⇔
  * strength 1.0); the denominator accumulates at precision P = 1e9:
  *
  *   D_i  = Σ_j (m_ij · P) DIV max(s_i + s_j, 1)      [D ≈ (P/S)·Σ m/(v_i+v_j)]
  *   s_i' = (W_i · P) DIV D_i                         [= S · W_i / Σ m/(v_i+v_j)]
  *
  * (m_ij = comparisons between i and j in either direction, W_i = wins)
  * — every intermediate is an exact long, so the trajectory is
  * bit-identical on any engine replaying the recurrence; an oracle
  * unrolls the rounds as chained CTEs. S ≪ P is what keeps the
  * per-term floor non-degenerate: a single comparison contributes
  * P/(2S) = 500 units in round one, not 0. The classic MM
  * normalization step is intentionally skipped (it needs a float
  * geometric mean): each round's map is scale-covariant and the
  * strengths are only meaningful as RATIOS — the exported `share`
  * (one IEEE divide of exact longs) is the normalized view.
  *
  * Items that never win collapse to strength 0 after one round (the
  * MLE boundary — BT cannot rank an all-loser above anything); the
  * max(·,1) keeps later 0+0 denominators total instead of throwing.
  *
  * Scale shape: |items| score rows iterate against a symmetrized
  * |pairs| comparison list — one groupBy-sum shuffle per round, the
  * comparison list built once (never rescanned from the raw votes).
  * Int64 envelope: W_i·P and m_ij·P ≤ 9.2e18 cap per-item wins and
  * per-pair comparisons at ~9·10⁹ each. */
object Preference {

  /** Bradley-Terry strengths from a (winner, loser) comparison log.
    * Output: item, n_wins, n_comparisons, strength (fixed-point long),
    * share (strength / Σ strengths, the one IEEE divide). */
  def bradleyTerry(votes: DataFrame, winner: String, loser: String,
                   iters: Int = 3,
                   scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters out of range: $iters")
    val prec = 1000000000L
    require(scale >= 1L && scale * 1000L <= prec,
      s"need scale << precision 1e9: $scale")
    val v = votes.select(col(winner).as("__w"), col(loser).as("__l"))
      .filter(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
    // ONE scan of the raw vote log → directed pair counts (pair-sized);
    // both the symmetric comparison list and the win totals derive from
    // it, so the input is never rescanned and the only checkpointed
    // state is pair-count-sized, not vote-log-sized
    val directed = v.groupBy(col("__w").as("a"), col("__l").as("b"))
      .agg(count(lit(1)).as("m"))
      .localCheckpoint()
    // symmetric comparison list: m(a,b) = comparisons in either direction
    val m = directed
      .unionAll(directed.select(col("b").as("a"), col("a").as("b"), col("m")))
      .groupBy("a", "b").agg(sum(col("m")).as("m"))
      .localCheckpoint() // every round joins it twice
    val wins = directed.groupBy(col("a").as("id")).agg(sum(col("m")).as("w"))
    val items = m.select(col("a").as("id")).distinct()
      .join(wins, Seq("id"), "left")
      .select(col("id"), coalesce(col("w"), lit(0L)).as("wins"))
    var s = items.select(col("id"), col("wins"), lit(scale).as("s"))
    for (_ <- 1 to iters) {
      val d = m
        .join(s.select(col("id").as("a"), col("s").as("__sa")), Seq("a"))
        .join(s.select(col("id").as("b"), col("s").as("__sb")), Seq("b"))
        .select(col("a"),
          expr(s"(m * ${prec}L) DIV greatest(__sa + __sb, 1L)").as("__t"))
        .groupBy(col("a")).agg(sum(col("__t")).as("__d"))
      // cap at S·2^iters — the analytic per-round growth bound (v' ≤
      // 2·v_max), so scores can never escape the int64 term envelope
      // even on degenerate vote graphs; greatest(·,1) keeps D total
      val capS = scale * (1L << iters)
      // per-round localCheckpoint (Graph/Similarity discipline): d reads s
      // TWICE (a-side and b-side), so an unbroken lineage doubles per
      // round — the optimizer re-plans 2^iters copies of the base plan
      s = s.join(d, s("id") === d("a"))
        .select(col("id"), col("wins"),
          expr(s"least((wins * ${prec}L) DIV greatest(__d, 1L), " +
            s"${capS}L)").as("s"))
        .localCheckpoint()
    }
    val nComp = m.groupBy(col("a").as("id"))
      .agg(sum(col("m")).as("n_comparisons"))
    val total = s.agg(sum(col("s")).as("__tot"))
    s.join(nComp, Seq("id"))
      .crossJoin(broadcast(total))
      .select(col("id").as("item"), col("wins").as("n_wins"),
        col("n_comparisons"), col("s").as("strength"),
        (col("s").cast("double") / col("__tot").cast("double")).as("share"))
  }
}
