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
}
