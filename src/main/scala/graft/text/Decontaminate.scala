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

  /** FUZZY decontamination: verified near-duplicate (corpus doc, eval
    * doc) pairs at word-n-gram Jaccard >= `minJaccard` — the
    * paraphrased / partially-rewritten leakage the exact-gram overlap
    * above misses (one changed word breaks every n-gram through it).
    * Reuses the dedup engine's MinHash-LSH machinery with the EVAL SET
    * as the query batch: both sides band under the SAME signature
    * family ([[graft.dedup.FuzzyDedup]]), candidates are (corpus,
    * eval) band collisions ONLY — never corpus x corpus — and each
    * candidate verifies with exact shingle-set Jaccard.
    *
    * Scale shape: the eval side is small by contract (benchmarks are
    * KBs-MBs), so its banded buckets, sizes, and shingle sets all
    * BROADCAST; the corpus is scanned once (shingles persist across
    * the signature/size/verify consumers) and only candidate docs'
    * shingle sets reach the verify join — the candidate space is
    * bounded by the eval side, so no df/bucket caps are needed and the
    * output is oracle-exact. Recall contract (the
    * q_dedup_minhash_verified shape): with `bands` bands of
    * numPerm/bands rows a true pair at jaccard j bands with
    * probability 1-(1-j^(numPerm/bands))^bands — at the default 32
    * bands of 2 rows and j >= 0.7 the miss probability is < 1e-9, so
    * the verified output IS the exact cross pair set. */
  def fuzzyContamination(docs: DataFrame, evalSet: DataFrame,
                         textCol: String, idCol: String,
                         n: Int = 3, minJaccard: Double = 0.7,
                         numPerm: Int = 64, bands: Int = 32,
                         seed: Long = 42L): DataFrame = {
    import graft.dedup.FuzzyDedup
    val dsh = FuzzyDedup.shingleHashes(docs, idCol, textCol, n)
      .select(col(idCol).as("id"), col("h64"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val esh = FuzzyDedup.shingleHashes(evalSet, idCol, textCol, n)
      .select(col(idCol).as("eval_id"), col("h64"))
    val dBuckets = FuzzyDedup.lshBuckets(
      FuzzyDedup.minhashSignaturesFromShingles(dsh, numPerm, seed),
      "id", bands)
    val eBuckets = FuzzyDedup.lshBuckets(
      FuzzyDedup.minhashSignaturesFromShingles(
        esh.withColumnRenamed("eval_id", "id"), numPerm, seed),
      "id", bands).withColumnRenamed("id", "eval_id")
    val cand = dBuckets
      .join(broadcast(eBuckets), Seq("band_idx", "band_hash"))
      .select(col("id"), col("eval_id")).distinct()
    val dSizes = dsh.groupBy("id").agg(count(lit(1)).as("n_doc"))
    val eSizes = esh.groupBy("eval_id").agg(count(lit(1)).as("n_eval"))
    // exact length prefilter: J <= min/max of the set sizes, so a
    // size-mismatched candidate can never verify — dropped before its
    // shingle set is shuffled into the verify join
    val candF = cand.join(dSizes, "id").join(broadcast(eSizes), "eval_id")
      .filter(least(col("n_doc"), col("n_eval")).cast("double") /
        greatest(col("n_doc"), col("n_eval")) >= minJaccard)
    val docsInCand = candF.select("id").distinct()
    val out = candF
      .join(dsh.join(docsInCand, "id"), "id")
      .join(broadcast(esh), Seq("eval_id", "h64"))
      .groupBy("id", "eval_id", "n_doc", "n_eval")
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n_doc") + col("n_eval") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id").as(idCol), col("eval_id"), col("n_common"),
        col("n_doc"), col("n_eval"), col("jaccard"))
      .localCheckpoint()
    dsh.unpersist(false)
    out
  }
}
