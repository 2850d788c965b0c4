package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TopK

/**
 * TF-IDF term weighting over a document corpus — the vocabulary/feature
 * step of a text training pipeline (salient-term extraction, keyword
 * labeling, sparse retrieval features).
 *
 * Shape at scale: one explode of the corpus into (doc, term) rows, one
 * aggregate for term frequencies, one constant-width aggregate for
 * document frequencies (the vocabulary table — millions of rows where the
 * corpus is billions), one broadcast-able join back. No collect, no
 * driver-side vocabulary.
 *
 * idf = ln(N / df) with df >= 1 by construction (a term in the table
 * appears in at least one doc), so no smoothing constant is needed and the
 * formula is reproducible in any engine with natural log.
 */
object TfIdf {

  /** Per-(doc, term) tf, df, and tfidf = tf * ln(N / df). `tfidf_r6` is the
    * 6-decimal-rounded score used for cross-engine-stable ordering. */
  def termScores(df: DataFrame, id: String, text: String): DataFrame = {
    val terms = df.select(col(id),
      explode(TextAnalysis.tokens(col(text))).as("term"))
    val tf = terms.groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(id)).as("n"))
    tf.join(dfreq, "term")
      .crossJoin(n)
      .withColumn("tfidf",
        col("tf").cast("double") * log(col("n").cast("double") / col("df")))
      .withColumn("tfidf_r6", round(col("tfidf"), 6))
      .select(col(id), col("term"), col("tf"), col("df"), col("tfidf"),
        col("tfidf_r6"))
  }

  /** Top-k salient terms per document, ranked by the ROUNDED score (ties on
    * the raw double differ across engines at 1 ulp; the rounded score plus
    * the term itself is a portable total order). */
  def topTerms(df: DataFrame, id: String, text: String, k: Int): DataFrame =
    TopK.topKPerGroup(termScores(df, id, text), Seq(id),
      Seq(col("tfidf_r6").desc, col("term").asc), k)
      .select(col(id), col("term"), col("tf"), col("df"), col("tfidf_r6"),
        col("rank"))

  /** Sparse TF-IDF cosine similarity between document pairs via an
    * inverted-index join — the term-partitioned formulation: weights are
    * co-located by TERM (one shuffle), per-term partial dot products
    * aggregate map-side, and no dense vector is ever materialized. Pair
    * fan-out per term is O(df²), so `maxDf` caps it exactly like
    * jaccardPairs' shingle cap (terms that frequent carry near-zero idf
    * anyway).
    *
    * Determinism at scale (the reason this engine can oracle-check it):
    * weights are FIXED-POINT — w = tf · round(ln(N/df) · idfScale), an
    * int64 — so every dot product and squared norm is an EXACT integer
    * sum, independent of aggregation order across engines and partitions.
    * A float-weighted formulation sums doubles in engine-specific order
    * and can flip a threshold or a 6-decimal rounding at the margin; the
    * int formulation cannot. The final cosine is one double expression
    * over three exact ints — bit-identical everywhere. idfScale=1000
    * keeps idf precision at 1e-3 (sub-% relative error for any term worth
    * weighting) and bounds Σw² well inside int64 for realistic tf. */
  def docSimilarity(docs: DataFrame, id: String, text: String, k: Int,
                    maxDf: Option[Int] = Some(1000),
                    idfScale: Long = 1000L): DataFrame = {
    val terms = docs.select(col(id),
      explode(TextAnalysis.tokens(col(text))).as("term"))
    val tf = terms.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(id)).as("n"))
    val pruned = maxDf.fold(tf.join(dfreq, "term"))(cap =>
      tf.join(dfreq.filter(col("df") <= cap), "term"))
    // w = 0 (df = N) contributes nothing to any dot/norm; dropping it also
    // keeps an all-ubiquitous-terms doc out of the 0/0 cosine case
    val w = pruned.crossJoin(n)
      .withColumn("w", (col("tf") *
        round(log(col("n").cast("double") / col("df")) * idfScale, 0)
          .cast("long")))
      .filter(col("w") =!= 0L)
      .select(col(id), col("term"), col("w"))
    // three consumers of `w` below: Catalyst's ReusedExchange dedups the
    // underlying tf/df aggregates within the single action
    val norms = w.groupBy(col(id)).agg(sum(col("w") * col("w")).as("ss"))
    val dots = w.select(col(id).as("id1"), col("term"), col("w").as("w1"))
      .join(w.select(col(id).as("id2"), col("term"), col("w").as("w2")),
        "term")
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(sum(col("w1") * col("w2")).as("dot"))
    val cos = dots
      .join(norms.select(col(id).as("id1"), col("ss").as("ss1")), "id1")
      .join(norms.select(col(id).as("id2"), col("ss").as("ss2")), "id2")
      .withColumn("cosine_sim", col("dot").cast("double") /
        (sqrt(col("ss1").cast("double")) * sqrt(col("ss2").cast("double"))))
      .select(col("id1"), col("id2"), col("dot"), col("cosine_sim"))
    // top-k NEIGHBORS per doc, both directions of each undirected pair —
    // bounded N·k output at any corpus size (a minSim threshold emits
    // O(N²) rows on a topically dense corpus). Exact-int dots make the
    // cosine bit-identical across engines, so ranking on the RAW double
    // (ties broken on the neighbor id) is a portable total order;
    // WindowGroupLimit caps each group's buffer at k.
    val sym = cos.union(cos.select(col("id2"), col("id1"), col("dot"),
      col("cosine_sim")))
    TopK.topKPerGroup(sym.withColumnRenamed("id1", "src_id")
        .withColumnRenamed("id2", "dst_id"),
        Seq("src_id"), Seq(col("cosine_sim").desc, col("dst_id").asc), k)
      .select(col("src_id"), col("dst_id"), col("dot"), col("cosine_sim"),
        col("rank"))
  }

  /** BM25 retrieval against a literal query term set — the standard
    * upgrade over raw TF-IDF for sparse search (length-normalized tf
    * saturation). Per matched (doc, term):
    *   idf = ln(1 + (N − df + 0.5) / (df + 0.5))           [Robertson+]
    *   s_t = idf · (tf·k1 + tf) / (tf + k1·(1 − b + b·dl/avgdl))
    * summed per doc and r6-rounded (the cross-term sum is the one
    * engine-order-dependent float path — same discipline as entropy/PSI),
    * then global top-k on (score_r6 desc, id) — TakeOrderedAndProject,
    * no global sort.
    *
    * Determinism: df/tf/dl/N are exact longs; avgdl is the exactAvg form;
    * each s_t is ONE fixed IEEE expression tree over those (numerator
    * deliberately written tf·k1 + tf, NOT tf·(k1+1): both engines must
    * build the same tree from the same literals — k1+1 pre-computed on
    * one side can differ in the last ulp). b must be dyadic (default
    * 0.75) so 1−b folds exactly.
    *
    * Scale shape: the query-term filter prunes the (doc, term) table to
    * |q| terms BEFORE any join; df comes from the full corpus; dl is one
    * |docs|-row aggregate; nothing quadratic anywhere. */
  def bm25Retrieve(docs: DataFrame, id: String, text: String,
                   queryTerms: Seq[String], k: Int = 50,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = docs.select(col(id),
      explode(TextAnalysis.tokens(col(text))).as("term"))
    val tf = terms.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dl = terms.groupBy(col(id)).agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(countDistinct(col(id)).as("n"))
      .crossJoin(dl.agg((round(sum(col("dl")), 4) / count(lit(1)))
        .as("avgdl")))
    val matched = tf.filter(col("term").isin(queryTerms: _*))
      .join(dfreq, "term")
      .join(dl, id)
      .crossJoin(broadcast(stats))
    val tfd = col("tf").cast("double")
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val sT = idf * (tfd * lit(k1) + tfd) /
      (tfd + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    matched
      .withColumn("__s", sT)
      .groupBy(col(id))
      .agg(round(sum(col("__s")), 6).as("bm25_r6"),
        count(lit(1)).as("n_matched"))
      .orderBy(col("bm25_r6").desc, col(id))
      .limit(k)
  }

  /** Rerank a candidate set by exact TF-IDF cosine against the query
    * vector — stage 2 of retrieve-then-rerank (BM25 recalls broadly,
    * the cosine re-scores the short list; the expensive similarity only
    * ever touches |candidates| docs). The query is a pseudo-doc with
    * tf = 1 per term; weights are the same int64 fixed-point as
    * [[docSimilarity]] (w = tf · round(ln(N/df)·idfScale)), so dot and
    * both squared norms are EXACT integer sums and the cosine is one
    * double expression over three exact ints — bit-identical anywhere.
    * Docs whose every term is corpus-ubiquitous (all w = 0) get NULL
    * cosine via the nullif'd norm rather than 0/0.
    *
    * `candidates` must carry `id`; its other columns pass through. */
  def rerankByCosine(docs: DataFrame, id: String, text: String,
                     candidates: DataFrame, queryTerms: Seq[String],
                     idfScale: Long = 1000L): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = docs.select(col(id),
      explode(TextAnalysis.tokens(col(text))).as("term"))
    val tf = terms.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(id)).as("n"))
    val w = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("w", (col("tf") *
        round(log(col("n").cast("double") / col("df")) * idfScale, 0)
          .cast("long")))
      .filter(col("w") =!= 0L)
      .select(col(id), col("term"), col("w"))
    // candidate-side prune FIRST: norms and dots only over the shortlist
    val cw = w.join(candidates.select(col(id)), Seq(id), "left_semi")
    val qw = dfreq.filter(col("term").isin(queryTerms: _*))
      .crossJoin(broadcast(n))
      .withColumn("qw",
        round(log(col("n").cast("double") / col("df")) * idfScale, 0)
          .cast("long"))
      .filter(col("qw") =!= 0L)
      .select(col("term"), col("qw"))
    val ssq = qw.agg(sum(col("qw") * col("qw")).as("__ssq"))
    val dots = cw.join(broadcast(qw), "term")
      .groupBy(col(id)).agg(sum(col("w") * col("qw")).as("__dot"))
    val norms = cw.groupBy(col(id)).agg(sum(col("w") * col("w")).as("__ssd"))
    candidates
      .join(dots, Seq(id), "left")
      .join(norms, Seq(id), "left")
      .crossJoin(broadcast(ssq))
      .withColumn("rerank_cosine",
        col("__dot").cast("double") /
          nullif(sqrt(col("__ssd").cast("double")) *
            sqrt(col("__ssq").cast("double")), lit(0.0)))
      .drop("__dot", "__ssd", "__ssq")
  }

  /** Vocabulary coverage curve: for each candidate vocab size N, the
    * fraction of ALL corpus token occurrences covered by the top-N
    * most-frequent terms — the tokenizer-design question ("how big must
    * the vocab be for <1% OOV"). One |vocab|×|Ns| conditional aggregate
    * over the ranked vocabulary (the corpus itself is only touched by
    * the vocabulary build); coverage is an exact-long IEEE divide. */
  def vocabCoverage(df: DataFrame, id: String, text: String,
                    topNs: Seq[Int]): DataFrame = {
    require(topNs.nonEmpty && topNs.forall(_ > 0), s"bad topNs: $topNs")
    val vocab = vocabulary(df, id, text)
    val ns = topNs.distinct.sorted
      .foldLeft(Seq.empty[Int])((a, n) => a :+ n)
    val nsDf = vocab.sparkSession.createDataFrame(
      ns.map(Tuple1(_))).toDF("top_n")
    vocab.crossJoin(broadcast(nsDf))
      .groupBy(col("top_n"))
      .agg(
        sum(when(col("freq_rank") <= col("top_n"), col("total_count"))
          .otherwise(0L)).as("covered_tokens"),
        sum(col("total_count")).as("total_tokens"),
        sum(when(col("freq_rank") <= col("top_n"), 1L).otherwise(0L))
          .as("n_vocab_terms"))
      .withColumn("coverage", col("covered_tokens").cast("double") /
        col("total_tokens").cast("double"))
  }

  /** Corpus vocabulary: every term with its document frequency and total
    * occurrence count, ranked by frequency (ties on the term itself) —
    * tokenizer/vocab construction over the corpus. Two aggregates over the
    * exploded corpus, both with constant-width partial states; the rank
    * window runs over the VOCABULARY (millions of rows at 100 TB corpus
    * scale, shuffled on a single partition-free global window — cap with
    * `topN` to keep the tail out of the sort). */
  def vocabulary(df: DataFrame, id: String, text: String,
                 topN: Option[Int] = None): DataFrame = {
    val tf = df.select(col(id),
        explode(TextAnalysis.tokens(col(text))).as("term"))
      .groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("__tf"))
    val vocab = tf.groupBy("term")
      .agg(count(lit(1)).as("doc_freq"), sum(col("__tf")).as("total_count"))
    val ranked = vocab.withColumn("freq_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("total_count").desc, col("term").asc)))
    topN.fold(ranked)(n => ranked.filter(col("freq_rank") <= n))
  }

  /** Power-law fit of the token-frequency head via the Hill estimator
    * over the top-k ranks. With D = Σ_{i≤k} ln f_i − k·ln f_{k+1}:
    *
    *   zipf_s = D / k        rank-law slope  (f_r ∝ r^−s; natural text s ≈ 1)
    *   alpha  = 1 + k / D    frequency-pdf exponent  (p(f) ∝ f^−α; α = 1 + 1/s)
    *
    * — the tokenizer-design diagnostic for how head-heavy the corpus is
    * (s drifting HIGH flags boilerplate flooding the head; both
    * conventions emitted because the literature uses both). Every ln
    * takes an exact int64 count and the ordering is the deterministic
    * (count desc, term) vocabulary rank, so the estimate is
    * engine-portable; only the Σ ln f_i float sum carries r6. Also
    * emits the top-1 token share (single divide). Cost: the
    * [[vocabulary]] aggregate + a k-row aggregate; NULL α/s on a flat
    * head (zero D); a corpus with ≤ k distinct tokens has no
    * rank-(k+1) pivot and yields zero rows. */
  def zipfTail(df: DataFrame, id: String, text: String,
               k: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val v = vocabulary(df, id, text, topN = Some(k + 1))
      .select(col("freq_rank"), col("total_count"))
    val tot = df.select(explode(TextAnalysis.tokens(col(text))).as("t"))
      .agg(count(lit(1)).as("__n_tokens"))
    val kp1 = v.filter(col("freq_rank") === k + 1)
      .select(col("total_count").as("__fk1"))
    val top1 = v.filter(col("freq_rank") === 1)
      .select(col("total_count").as("__f1"))
    val denom = sum(log(col("total_count").cast("double"))) -
      lit(k.toDouble) * log(col("__fk1").cast("double"))
    v.filter(col("freq_rank") <= k)
      .crossJoin(broadcast(kp1))
      .groupBy(col("__fk1"))
      .agg(count(lit(1)).as("__k"), round(denom, 6).as("__den"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(top1))
      .select(
        col("__k").as("k"),
        when(col("__k") < k || col("__den") <= 0.0, lit(null))
          .otherwise(round(lit(1.0) +
            lit(k.toDouble) / col("__den"), 6)).as("alpha"),
        when(col("__k") < k || col("__den") <= 0.0, lit(null))
          .otherwise(round(col("__den") / lit(k.toDouble), 6)).as("zipf_s"),
        (col("__f1").cast("double") / col("__n_tokens").cast("double"))
          .as("top1_share"),
        col("__n_tokens").as("n_tokens"))
  }

  /** PMI collocations: the top-K adjacent token pairs most associated
    * beyond chance — the phrase/multi-word-unit miner that feeds
    * tokenizer merges and boilerplate discovery.
    *
    *   pmi  = ln n_ab − ln T_pairs − ln n_a − ln n_b + 2·ln T_tokens
    *   npmi = pmi / (ln T_pairs − ln n_ab)            ∈ [−1, 1]
    *
    * Every ln takes an exact int64 count and the term order is fixed, so
    * the doubles are bit-identical cross-engine and raw `pmi` is a
    * portable sort key (same discipline as rerankByCosine's cosine).
    *
    * Scale shape: bigrams come from a per-row array zip — NO shuffle, no
    * per-doc window, no positional self-join; the only shuffles are the
    * two count aggregates. The `minCount` support cut applies to the
    * pair frame BEFORE either unigram join (rare-pair noise — PMI's
    * known failure mode — never reaches a join), and the final top-K is
    * TakeOrderedAndProject. */
  def collocations(df: DataFrame, id: String, text: String,
                   minCount: Long = 5L, topK: Int = 100): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val toks = df.select(TextAnalysis.tokens(col(text)).as("__ts"))
    val uni = toks.select(explode(col("__ts")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("__nt"))
    val pairsAll = toks
      .withColumn("__w1", slice(col("__ts"), lit(1),
        greatest(size(col("__ts")) - 1, lit(0))))
      .withColumn("__w2", slice(col("__ts"), lit(2),
        greatest(size(col("__ts")) - 1, lit(0))))
      .select(explode(arrays_zip(col("__w1"), col("__w2"))).as("__bg"))
      .select(col("__bg.__w1").as("w1"), col("__bg.__w2").as("w2"))
    val totals = toks.agg(
      sum(size(col("__ts"))).as("__tu"),
      sum(greatest(size(col("__ts")) - 1, lit(0))).as("__tp"))
    val pairs = pairsAll.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val lnOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => log(c.cast("double"))
    val pmi = lnOf(col("n_ab")) - lnOf(col("__tp")) - lnOf(col("n_a")) -
      lnOf(col("n_b")) + lit(2.0) * lnOf(col("__tu"))
    pairs
      .join(uni.select(col("term").as("w1"), col("__nt").as("n_a")), "w1")
      .join(uni.select(col("term").as("w2"), col("__nt").as("n_b")), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", pmi)
      // a pair that IS the whole pair stream has ln(Tp/n_ab) = 0 — npmi's
      // normalizer vanishes (degenerate one-bigram corpus), not a divide
      .withColumn("npmi",
        when(col("n_ab") === col("__tp"), lit(null))
          .otherwise(col("pmi") / (lnOf(col("__tp")) - lnOf(col("n_ab")))))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("pmi"), 6).as("pmi"), round(col("npmi"), 6).as("npmi"))
  }
}
