package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Subword/tokenizer-design statistics: the first iteration of byte-pair
 * encoding (Sennrich et al. 2016) as a corpus aggregate — adjacent
 * character-pair frequencies weighted by word frequency, ranked to give
 * the merge table a BPE trainer would learn first.
 *
 * Scale shape: word explode -> groupBy(word) — the vocabulary table, tiny
 * relative to the corpus (Heaps' law), so every later stage runs on the
 * vocab, not the corpus: per-word character pairs explode a <=word-length
 * factor of a small table, and the pair aggregate is a second small
 * shuffle. This is why BPE training is feasible at 100 TB at all — one
 * corpus-sized shuffle, then everything is vocabulary-sized.
 */
object Subword {

  /** Top-k BPE merge candidates: (pair, freq), freq = total corpus
    * occurrences of the adjacent character pair (within words), ordered by
    * freq desc then pair asc (total order — deterministic at the cut). */
  def bpePairStats(docs: DataFrame, textCol: String, topK: Int = 20): DataFrame = {
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(length(col("w")) >= 2)
    words
      .select(col("n"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"), col("w"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("n"))
      .groupBy("pair").agg(sum(col("n")).as("freq"))
      .orderBy(col("freq").desc, col("pair").asc)
      .limit(topK)
  }
}
