package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-level duplicated-span removal — the distributed approximation of
 * exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
 * Makes Language Models Better"): a token k-gram that appears in >= minDf
 * distinct documents is boilerplate; every token covered by a flagged
 * k-gram is dropped and the document is rebuilt from the surviving tokens
 * (C4 does the same at line granularity; with no line structure in the
 * corpus, the k-gram grid is the granularity).
 *
 * Scale shape (the only one that works at 100 TB):
 *   1. one scan -> per-doc token array (no shuffle);
 *   2. exploded k-grams -> groupBy(gram) doc-frequency — THE inherent
 *      shuffle of corpus dedup, keyed on the gram so it distributes over
 *      the full cluster with no hot keys (grams are near-uniform);
 *   3. flagged grams (df >= threshold) joined back to the exploded grams
 *      on the gram key — reuses the same hash partitioning, and AQE
 *      broadcasts the flagged side when it is small (it is: boilerplate
 *      is by definition the thin head of the df distribution);
 *   4. flagged start-positions grouped per doc (second shuffle, by doc),
 *      then the rebuild is pure array arithmetic on the driver-free path:
 *      filter(toks, (tok, i) => no flagged start covers i).
 * Nothing is ever collected; no O(n^2) pair join exists anywhere.
 *
 * The df threshold scales with the corpus (max(minDf, nDocs/1000)) via a
 * broadcast scalar join — an absolute cutoff that is right at SF 0.001
 * would flag every gram at 1000x the corpus.
 */
object Boilerplate {

  /** Per-doc result: `n_tokens`, `n_dropped`, and `clean_text` rebuilt
    * without the tokens covered by any corpus-duplicated k-gram. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 4, minDf: Int = 3,
                      dfPerDocs: Int = 1000): DataFrame = {
    require(k >= 2, s"k-gram size must be >= 2: $k")
    val toks = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("toks"))

    // grams[i] (0-based start) = toks[i..i+k-1]; guarded: sequence() would
    // run DESCENDING for size < k and emit phantom grams
    val gramArr = when(size(col("toks")) >= k,
      transform(sequence(lit(0), size(col("toks")) - k),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
    val grams = toks.select(col(idCol), posexplode(gramArr).as(Seq("gpos", "g")))

    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val flagged = grams.groupBy("g")
      .agg(countDistinct(col(idCol)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= greatest(lit(minDf.toLong),
        expr(s"n_docs div $dfPerDocs")))
      .select("g")

    val flaggedPos = grams.join(flagged, "g")
      .groupBy(idCol)
      .agg(sort_array(collect_set(col("gpos"))).as("fpos"))

    toks.join(flaggedPos, Seq(idCol), "left")
      .select(col(idCol), col("toks"),
        coalesce(col("fpos"), array().cast("array<int>")).as("fpos"))
      .select(col(idCol),
        size(col("toks")).as("n_tokens"),
        filter(col("toks"), (_, i) =>
          !exists(col("fpos"), gp => i >= gp && i <= gp + (k - 1)))
          .as("kept"))
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).as("n_dropped"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }
}
