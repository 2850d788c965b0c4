package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bigram language-model scoring: train token-bigram counts on a corpus,
 * score each document by its average bigram log-likelihood under the
 * add-alpha-smoothed model — the classic "does this text look like the
 * corpus" quality signal (the cheap stand-in for a KenLM perplexity
 * filter) used to rank/filter pre-training documents.
 *
 *   logP(doc) / |bigrams| ,  P(w2|w1) = (c(w1,w2) + a) / (c(w1·) + a·V)
 *
 * where c(w1·) counts w1 as a bigram PREFIX and V is the distinct-prefix
 * vocabulary — both derived from the same bigram table, so the model is
 * self-consistent and every count is reproducible in ANSI SQL.
 *
 * Scale: the bigram explode is narrow; counts are two groupBys (map-side
 * combined); scoring joins each doc bigram to the count tables on the
 * token pair. String join keys keep the operator oracle-checkable at test
 * scale; at 100 TB swap the keys for xxhash64 pairs exactly as the dedup
 * family does with NGramHashes (same plan shape, 8-byte shuffle keys).
 */
object LangModel {

  /** One row per in-order bigram occurrence: (id, w1, w2). Documents with
    * fewer than 2 tokens contribute nothing. */
  def bigrams(df: DataFrame, id: String, text: String): DataFrame = {
    val t = TextAnalysis.tokens(col(text))
    df.select(col(id), t.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(id), explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1))).as("__bg"))
      .select(col(id), col("__bg").getField("0").as("w1"),
        col("__bg").getField("1").as("w2"))
  }

  /** Per-document average bigram log-likelihood under the corpus model
    * (trained on `train`, scored over `df` — pass the same frame for the
    * usual self-scored corpus ranking). Output: (id, n_bigrams,
    * avg_logprob), higher = more corpus-like. */
  def scoreDocs(df: DataFrame, train: DataFrame, id: String, text: String,
                alpha: Double = 0.4): DataFrame = {
    val corpus = bigrams(train, id, text)
    val c2 = corpus.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // prefix counts derive from the bigram table by summation — exactly
    // equal to re-counting, without a second tokenize/explode of the corpus
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    bigrams(df, id, text)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", log(
        (coalesce(col("c2"), lit(0L)) + lit(alpha)) /
        (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v"))))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(col("__lp")).as("avg_logprob"))
  }
}
