package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators for training-data curation: a corpus
  * pipeline that gates documents on a learned quality score needs to
  * measure that filter (AUC, precision/recall at candidate thresholds)
  * at corpus scale, and to audit label/metadata dependence (mutual
  * information) — all exactly, so runs are comparable across engines.
  *
  * Numeric discipline (shared with [[Stats]]): every count stays int64
  * until ONE final IEEE divide, so results are bit-identical
  * cross-engine; only the entropy-family outputs (float ln sums over
  * small key spaces) carry the r6 rounding.
  *
  * The reference pipeline has no evaluation stage at all (its quality
  * signals are unvalidated heuristics — spark_stream_batch_processor.py
  * trading signals at src/airflow/dags/scripts/spark_stream_batch_processor.py:173-213);
  * these operators are the beyond-reference completion of that gap.
  */
object Eval {

  /** Exact binary ROC AUC per group, computed as the tie-corrected
    * Mann-Whitney rank statistic:
    *
    *   AUC = (Σ_pos avgrank − n⁺(n⁺+1)/2) / (n⁺ n⁻)
    *
    * with average ranks for tied scores. Held in integers: for each
    * distinct score (count n, positives p, strictly-lower total c),
    * 2·Σ_pos avgrank accumulates p·(2c + n + 1), so the numerator
    * 2·Σ − n⁺(n⁺+1) and denominator 2·n⁺·n⁻ are exact int64 and the
    * single divide is bit-identical on any engine.
    *
    * Scale shape: the only full-data shuffle collapses rows to the
    * distinct-score frame. The strictly-lower cumulative is the
    * two-pass bucketed pattern (same as Curate.globalSortIndex, but
    * banded on the score axis like Stats.histogram, clamped edges):
    * per-(group, band) totals cumulate over ≤ `nbands` rows per group,
    * broadcast back, and the in-band window only ever sees one band's
    * distinct scores — there is NO window over a group's whole score
    * domain, so a group with billions of distinct scores still splits
    * across `nbands` tasks. Callers size (lo, hi, nbands) like a
    * histogram; scores outside [lo, hi] clamp into the edge bands
    * (band assignment only partitions the cumulative — ANY
    * order-consistent banding yields the same AUC, so clamping costs
    * skew, never correctness).
    *
    * Rows with NULL score or NULL label are dropped (counted in
    * neither class); a group with no positives or no negatives has no
    * defined ranking quality — auc is NULL there, never 0/0.
    *
    * Int64 envelope: the 2·rank-sum numerator is bounded by 2·n⁺·N per
    * group, so a single group overflows past ~2·10⁹ rows (same envelope
    * note as Curate.negativePairs) — shard the group (e.g. by a hash
    * fold, averaging fold AUCs) above that. */
  def binaryAuc(df: DataFrame, keys: Seq[String], score: Column,
                positive: Column, lo: Double, hi: Double,
                nbands: Int = 256): DataFrame = {
    require(nbands >= 1, s"nbands must be >= 1: $nbands")
    require(lo < hi, s"need lo < hi: [$lo, $hi]")
    val k = keys.map(col)
    val g = df
      .filter(score.isNotNull && positive.isNotNull)
      .groupBy((k :+ score.as("__s")): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(positive, 1L).otherwise(0L)).as("__p"))
      .withColumn("__b", Stats.binColumn(col("__s"), lo, hi, nbands))
    val bandTotals = g.groupBy((k :+ col("__b")): _*)
      .agg(sum(col("__n")).as("__bn"))
    val wOff = Window.partitionBy(k: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandTotals
      .withColumn("__off", coalesce(sum(col("__bn")).over(wOff), lit(0L)))
      .drop("__bn")
    val wIn = Window.partitionBy((k :+ col("__b")): _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.join(broadcast(offsets), keys :+ "__b")
      .withColumn("__c",
        col("__off") + coalesce(sum(col("__n")).over(wIn), lit(0L)))
      .groupBy(k: _*)
      .agg(
        sum(col("__p") * (lit(2L) * col("__c") + col("__n") + lit(1L)))
          .as("__num2"),
        sum(col("__p")).as("n_pos"),
        sum(col("__n") - col("__p")).as("n_neg"))
      .withColumn("auc",
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(
            (col("__num2") - col("n_pos") * (col("n_pos") + lit(1L)))
              .cast("double")
              / (lit(2L) * col("n_pos") * col("n_neg")).cast("double")))
      .select((k ++ Seq(col("n_pos"), col("n_neg"), col("auc"))): _*)
  }

  /** Precision / recall / F1 per (group, threshold) for a `score >= t`
    * decision rule, over a caller-provided threshold grid (the
    * operating-point sweep that picks a corpus quality cutoff).
    *
    * One pass: rows collapse to the distinct-score frame (same first
    * shuffle as [[binaryAuc]] — at 100 TB the sweep rides a frame of
    * |distinct scores| rows), which cross-joins the broadcast literal
    * grid and re-aggregates to |groups|×|thresholds| rows. Confusion
    * counts are exact int64; f1 uses the single-divide form
    * 2·tp / (2·tp + fp + fn), so every ratio is one IEEE divide of
    * exact integers. Zero-denominator points (no predicted positives /
    * no actual positives) yield NULL, never 0/0. */
  def prAtThresholds(df: DataFrame, keys: Seq[String], score: Column,
                     positive: Column, thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val k = keys.map(col)
    val g = df
      .filter(score.isNotNull && positive.isNotNull)
      .groupBy((k :+ score.as("__s")): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(positive, 1L).otherwise(0L)).as("__p"))
    val grid = explode(typedlit(thresholds.sorted)).as("threshold")
    def ratio(num: Column, den: Column): Column =
      when(den === 0L, lit(null))
        .otherwise(num.cast("double") / den.cast("double"))
    g.select((k ++ Seq(col("__s"), col("__n"), col("__p"), grid)): _*)
      .groupBy((k :+ col("threshold")): _*)
      .agg(
        sum(when(col("__s") >= col("threshold"), col("__p"))
          .otherwise(0L)).as("tp"),
        sum(when(col("__s") >= col("threshold"), col("__n") - col("__p"))
          .otherwise(0L)).as("fp"),
        sum(when(col("__s") < col("threshold"), col("__p"))
          .otherwise(0L)).as("fn"),
        sum(when(col("__s") < col("threshold"), col("__n") - col("__p"))
          .otherwise(0L)).as("tn"))
      .withColumn("precision", ratio(col("tp"), col("tp") + col("fp")))
      .withColumn("recall", ratio(col("tp"), col("tp") + col("fn")))
      .withColumn("f1", ratio(lit(2L) * col("tp"),
        lit(2L) * col("tp") + col("fp") + col("fn")))
  }

  /** Calibration (reliability) bins per group: the score axis banded on
    * the same clamped fixed-range grid as Stats.histogram, each bin
    * reporting its positive rate against its mean score — the "is 0.8
    * really 80%?" diagnostic that decides whether a quality score can be
    * thresholded directly or needs recalibration first.
    *
    * One |groups|×nbins-key aggregate. pos_rate is a single divide of
    * exact int64s; mean_score follows the exactAvg discipline (6dp-
    * rounded sum over the bin, then one divide) so both engines cut the
    * same doubles. Empty bins are absent (join against a grid downstream
    * if a dense axis is needed — same contract as histogram). */
  def calibrationBins(df: DataFrame, keys: Seq[String], score: Column,
                      positive: Column, lo: Double, hi: Double,
                      nbins: Int = 10): DataFrame = {
    require(nbins >= 1, s"nbins must be >= 1: $nbins")
    require(lo < hi, s"need lo < hi: [$lo, $hi]")
    val k = keys.map(col)
    val width = (hi - lo) / nbins
    val bin = Stats.binColumn(score, lo, hi, nbins)
    df.filter(score.isNotNull && positive.isNotNull)
      .select((k ++ Seq(bin.as("bin"), score.as("__s"),
        when(positive, 1L).otherwise(0L).as("__p"))): _*)
      .groupBy((k :+ col("bin")): _*)
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("n_pos"),
        round(sum(col("__s")), 6).as("__ssum"))
      .withColumn("bin_lo", round(lit(lo) + col("bin") * lit(width), 6))
      .withColumn("bin_hi", round(lit(lo) + (col("bin") + 1) * lit(width), 6))
      .withColumn("pos_rate",
        col("n_pos").cast("double") / col("n").cast("double"))
      .withColumn("mean_score", col("__ssum") / col("n").cast("double"))
      .drop("__ssum")
  }

  /** Mutual information between two categorical columns per group —
    * the "is my label independent of source/language?" audit. Uses the
    * identity MI = H(a) + H(b) − H(a,b) in Stats.entropy's exact-count
    * form (H = ln T − Σ n·ln n / T), which collapses to
    *
    *   MI = ln N + (Σ_ab n·ln n − Σ_a n·ln n − Σ_b n·ln n) / N
    *
    * — three ln-sums over the pair-count frame and its two marginals,
    * ONE divide, r6 at the end (same float posture as q_entropy: the
    * ln-sums run over the |a|×|b| key space, which is small by the
    * nature of categorical columns). Also emits the marginal/joint
    * entropies and the [0,1]-normalized nmi = 2·MI / (H(a)+H(b))
    * (NULL when both marginals are constant — there is no dependence
    * to measure). Scale: one shuffle to pair counts (|groups|×|a|×|b|
    * keys); marginals and ln-sums derive from that frame, the base is
    * never rescanned. */
  /** Cohen's kappa per group: chance-corrected agreement between two
    * categorical raters (two annotators, or two labeling heuristics —
    * the "are my quality rules actually measuring the same thing?"
    * audit before one of them gates a corpus).
    *
    * Held exact end-to-end via the all-integer identity
    *
    *   kappa = (N·Σ_c n_cc − Σ_c ra_c·rb_c) / (N² − Σ_c ra_c·rb_c)
    *
    * (numerator/denominator are N² × the usual (po−pe)/(1−pe)), so the
    * single divide is bit-identical cross-engine; po and pe are each
    * one exact divide too. kappa is NULL when pe = 1 (both raters
    * constant — agreement is all chance, 0/0).
    *
    * Scale: one shuffle collapses rows to the |a|×|b| contingency
    * frame per group; the diagonal, marginals, and their product-sum
    * all derive from that frame — the base is never rescanned. Rows
    * where either rating is NULL are dropped (no agreement evidence).
    *
    * Int64 envelope: N² must stay inside int64 — shard groups past
    * ~3·10⁹ rated items. */
  def cohensKappa(df: DataFrame, keys: Seq[String], a: String,
                  b: String): DataFrame = {
    val k = keys.map(col)
    val pairs = df.filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy((k ++ Seq(col(a).as("__a"), col(b).as("__b"))): _*)
      .agg(count(lit(1)).as("__n"))
    val totals = pairs.groupBy(k: _*)
      .agg(sum(col("__n")).as("n_items"),
        sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
          .as("__agree"))
    val ma = pairs.groupBy((k :+ col("__a").as("__c")): _*)
      .agg(sum(col("__n")).as("__ra"))
    val mb = pairs.groupBy((k :+ col("__b").as("__c")): _*)
      .agg(sum(col("__n")).as("__rb"))
    // inner join: a category absent from one rater contributes 0 to pe
    val prodSum = ma.join(mb, keys :+ "__c")
      .groupBy(k: _*)
      .agg(sum(col("__ra") * col("__rb")).as("__pp"))
    totals.join(prodSum, keys.toSeq, "left")
      .withColumn("__pp", coalesce(col("__pp"), lit(0L)))
      .withColumn("po",
        col("__agree").cast("double") / col("n_items").cast("double"))
      .withColumn("pe", col("__pp").cast("double")
        / (col("n_items") * col("n_items")).cast("double"))
      .withColumn("kappa",
        when(col("n_items") * col("n_items") === col("__pp"), lit(null))
          .otherwise(
            (col("n_items") * col("__agree") - col("__pp")).cast("double")
              / (col("n_items") * col("n_items") - col("__pp"))
                .cast("double")))
      .select((k ++ Seq(col("n_items"), col("po"), col("pe"),
        col("kappa"))): _*)
  }

  /** NDCG@k per group over a scored candidate list: rank by
    * (score desc, id asc — the id tiebreak makes the ranking total, so
    * both engines cut identical top-k sets), discount each candidate's
    * relevance by log2(position+1), normalize by the ideal ordering
    * (relevance desc). The retrieval-quality metric for a
    * reranker/embedding-search stage.
    *
    * ndcg = dcg / idcg, NULL when idcg = 0 (no relevant candidate —
    * there is no ranking quality to measure). rel/log2(pos+1) is a
    * per-row IEEE tree; only the cross-term dcg/idcg sums carry r6
    * (the repo-wide float-sum discipline), and the final divide runs
    * on the two rounded sums, so results are cross-engine identical.
    *
    * Scale contract: the window partitions by group and orders within
    * it, so groups are expected to be CANDIDATE SHORTLISTS (a
    * retriever's top-N, N in the hundreds) — the frame each query
    * evaluates, not a full corpus. Don't point it at billion-row
    * groups; rank those with the two-pass global-sort pattern first. */
  def ndcgAtK(df: DataFrame, keys: Seq[String], score: Column,
              rel: Column, id: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val kc = keys.map(col)
    val base = df.filter(score.isNotNull && rel.isNotNull)
      .select((kc ++ Seq(score.as("__s"), rel.cast("long").as("__r"),
        id.as("__id"))): _*)
    val wRank = Window.partitionBy(kc: _*)
      .orderBy(col("__s").desc, col("__id"))
    val wIdeal = Window.partitionBy(kc: _*)
      .orderBy(col("__r").desc, col("__id"))
    // rel/log2(p+1) written as rel·ln2/ln(p+1) with ln2 a shared
    // LITERAL (Java's Math.log(2.0)) — engine log2 implementations
    // differ more than ln, which the entropy family already leans on
    def gain(pos: Column): Column =
      col("__r").cast("double") * lit(0.6931471805599453) /
        log(pos.cast("double") + lit(1.0))
    base
      .withColumn("__p", row_number().over(wRank))
      .withColumn("__q", row_number().over(wIdeal))
      .groupBy(kc: _*)
      .agg(
        round(sum(when(col("__p") <= k, gain(col("__p")))
          .otherwise(0.0)), 6).as("dcg"),
        round(sum(when(col("__q") <= k, gain(col("__q")))
          .otherwise(0.0)), 6).as("idcg"),
        count(lit(1)).as("n_candidates"))
      .withColumn("ndcg",
        when(col("idcg") === 0.0, lit(null))
          .otherwise(col("dcg") / col("idcg")))
  }

  /** Two-proportion z-test per group: is variant B's conversion rate
    * actually different from A's, or noise? The decision gate for
    * "did the new quality filter change downstream acceptance" style
    * experiments.
    *
    *   z = (p_b − p_a) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled
    *
    * Counts are exact int64 from one aggregation; the z expression is
    * a fixed IEEE tree over those exact ints (each p is one divide),
    * so both engines cut identical doubles — no rounding needed.
    * z is NULL when either arm is empty or the pooled rate is 0 or 1
    * (zero variance — the test is undefined, not infinite). Callers
    * compare |z| to 1.96/2.58; no p-value is emitted (erf is not
    * portable across engines).
    *
    * Scale: one |groups|-key aggregate over the assignment column —
    * nothing else. */
  /** Wilson score interval per group for a success proportion — the
    * right way to RANK small-sample segments (a 3/3 segment must not
    * outrank a 970/1000 one; Wilson's lower bound encodes exactly that,
    * where the naive rate and the Wald interval both fail).
    *
    *   center = (p̂ + z²/2n) / (1 + z²/n)
    *   half   = z/(1 + z²/n) · √(p̂(1−p̂)/n + z²/4n²)
    *
    * k and n are exact int64 off one aggregate; the bounds are one fixed
    * IEEE tree each over (k, n, z) — cross-engine deterministic, rounded
    * r6 only at the surface. z defaults to 1.96 (95%); no p-values (erf
    * is not portable across engines). Scale: one |groups|-key aggregate. */
  def proportionWilson(df: DataFrame, keys: Seq[String], success: Column,
                       z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val n = col("n").cast("double")
    val p = col("k").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = (lit(z) / denom) *
      sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))
    df.filter(success.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sum(when(success, 1L).otherwise(0L)).as("k"),
        count(lit(1)).as("n"))
      .select((keys.map(col) ++ Seq(col("k"), col("n"),
        round(p, 6).as("rate"),
        round(center - half, 6).as("wilson_lo"),
        round(center + half, 6).as("wilson_hi"))): _*)
  }

  def twoProportionZ(df: DataFrame, keys: Seq[String], inB: Column,
                     success: Column): DataFrame = {
    val k = keys.map(col)
    df.filter(inB.isNotNull && success.isNotNull)
      .groupBy(k: _*)
      .agg(
        sum(when(!inB, 1L).otherwise(0L)).as("n_a"),
        sum(when(!inB && success, 1L).otherwise(0L)).as("succ_a"),
        sum(when(inB, 1L).otherwise(0L)).as("n_b"),
        sum(when(inB && success, 1L).otherwise(0L)).as("succ_b"))
      .withColumn("rate_a",
        when(col("n_a") === 0L, lit(null))
          .otherwise(col("succ_a").cast("double") / col("n_a").cast("double")))
      .withColumn("rate_b",
        when(col("n_b") === 0L, lit(null))
          .otherwise(col("succ_b").cast("double") / col("n_b").cast("double")))
      .withColumn("z",
        when(col("n_a") === 0L || col("n_b") === 0L ||
            col("succ_a") + col("succ_b") === 0L ||
            col("succ_a") + col("succ_b") === col("n_a") + col("n_b"),
          lit(null))
          .otherwise {
            val pooled = (col("succ_a") + col("succ_b")).cast("double") /
              (col("n_a") + col("n_b")).cast("double")
            (col("rate_b") - col("rate_a")) /
              sqrt(pooled * (lit(1.0) - pooled) *
                (lit(1.0) / col("n_a").cast("double") +
                  lit(1.0) / col("n_b").cast("double")))
          })
  }

  def mutualInfo(df: DataFrame, keys: Seq[String], a: String,
                 b: String): DataFrame = {
    val k = keys.map(col)
    val pairs = df.groupBy((k ++ Seq(col(a), col(b))): _*)
      .agg(count(lit(1)).as("__n"))
    val lnSum: Column =
      sum(col("__m").cast("double") * log(col("__m").cast("double")))
    def marginal(c: String, out: String): DataFrame =
      pairs.groupBy((k :+ col(c)): _*)
        .agg(sum(col("__n")).as("__m"))
        .groupBy(k: _*).agg(lnSum.as(out), count(lit(1)).as(out + "_cats"))
    val joint = pairs.select((k :+ col("__n").as("__m")): _*)
    val jointAgg = joint.groupBy(k: _*)
      .agg(sum(col("__m")).as("__t"), lnSum.as("__sab"))
    val joined = jointAgg
      .join(marginal(a, "__sa"), keys)
      .join(marginal(b, "__sb"), keys)
    val t = col("__t").cast("double")
    def h(s: Column): Column = log(t) - s / t
    val miRaw = log(t) + (col("__sab") - col("__sa") - col("__sb")) / t
    joined
      .withColumn("n_rows", col("__t"))
      .withColumn("h_a", round(h(col("__sa")), 6))
      .withColumn("h_b", round(h(col("__sb")), 6))
      .withColumn("h_ab", round(h(col("__sab")), 6))
      .withColumn("mi", round(miRaw, 6))
      .withColumn("nmi",
        when(col("__sa_cats") === 1 && col("__sb_cats") === 1, lit(null))
          .otherwise(round(lit(2.0) * miRaw
            / (h(col("__sa")) + h(col("__sb"))), 6)))
      .select((k ++ Seq(col("n_rows"), col("h_a"), col("h_b"),
        col("h_ab"), col("mi"), col("nmi"))): _*)
  }
}
