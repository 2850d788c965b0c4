package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag training documents that share any word
 * n-gram with a held-out evaluation set, the standard guard against test-set
 * leakage into a pre-training corpus (GPT-3 §C / PaLM-style 8-gram overlap).
 *
 * Scale shape: the EVAL side is small by contract (benchmarks are KBs–MBs,
 * the corpus is the 100 TB side), so its distinct gram set is broadcast and
 * the corpus is never shuffled — the whole check is one corpus scan with a
 * map-side hash probe, then a partial-aggregated per-doc count. Grams are
 * compared as md5 hashes (16 bytes) rather than strings so the broadcast
 * table and the probe keys stay compact regardless of n.
 */
object Decontaminate {

  /** md5 over each word n-gram of `textCol`, lowercased whitespace tokens. */
  private def gramHashes(textCol: String, n: Int) =
    transform(
      TextAnalysis.wordNGrams(TextAnalysis.tokens(lower(col(textCol))), n),
      g => md5(g))

  /** Per-document count of DISTINCT eval n-grams the document contains.
    * Documents with no overlap are absent (inner join) — use
    * [[flagContamination]] for the full left-joined corpus view. */
  def contaminationCounts(docs: DataFrame, evalSet: DataFrame,
                          textCol: String, idCol: String,
                          n: Int = 8): DataFrame = {
    val dg = docs.select(col(idCol),
      explode(gramHashes(textCol, n)).as("__gram"))
    val eg = evalSet.select(explode(gramHashes(textCol, n)).as("__gram"))
      .distinct()
    dg.join(broadcast(eg), "__gram")
      .groupBy(idCol)
      .agg(countDistinct(col("__gram")).as("n_contaminated_grams"))
  }

  /** Every corpus document with its eval-overlap gram count and a 0/1
    * contamination flag (>= `minHits` overlapping distinct grams). The
    * flag is an int, not a boolean, so downstream sums read as doc counts. */
  def flagContamination(docs: DataFrame, evalSet: DataFrame,
                        textCol: String, idCol: String,
                        n: Int = 8, minHits: Int = 1): DataFrame = {
    val counts = contaminationCounts(docs, evalSet, textCol, idCol, n)
    docs.join(counts, Seq(idCol), "left")
      .withColumn("n_contaminated_grams",
        coalesce(col("n_contaminated_grams"), lit(0L)))
      .withColumn("contaminated",
        (col("n_contaminated_grams") >= minHits).cast("int"))
  }
}
