package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
 * MOSS algorithm): hash every character k-gram, slide a window of w
 * consecutive hashes, and record the minimum hash of each window (rightmost
 * position on ties). The selected (position, hash) set is a provably
 * density-guaranteed fingerprint — any shared substring of length
 * >= w + k - 1 between two documents is caught by at least one shared
 * fingerprint, at ~2/(w+1) the storage of the full hash sequence.
 *
 * Spark-first shape: the k-gram hash is a closed-form polynomial over k
 * fixed character reads (pure codegen'd projection in the scan stage — the
 * text column is dropped before anything shuffles), and the per-window
 * argmin-with-rightmost-tie is ONE window aggregate: minimizing the packed
 * key h * 2^21 + (2^21 - 1 - pos) is exactly lexicographic (h asc, pos
 * desc), so no self-join and no second pass. The only shuffle is the
 * hash-partition by doc for the window — embarrassingly parallel at any
 * scale. All arithmetic is integer, so the oracle replays it bit-for-bit.
 */
object Winnow {

  val Base = 131L
  val Mod = 1000003L // > 2^19, < 2^21: packed key fits a long with room
  private val PosSpan = 1L << 21

  /** Per-doc fingerprint summary: n_grams, n_fp (selected fingerprints),
    * and an exact integer checksum (sum of h * Mod + pos over the distinct
    * fingerprint set) that pins the full selection, keeping the output
    * doc-sized rather than fingerprint-sized. */
  def fingerprintSummary(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 4, w: Int = 5): DataFrame =
    fingerprints(docs, idCol, textCol, k, w)
      .groupBy(idCol)
      .agg(max(col("n_grams")).as("n_grams"),
        count(lit(1)).as("n_fp"),
        sum(col("h") * Mod + col("p")).as("fp_checksum"))

  /** The distinct selected fingerprints: (id, p, h, n_grams), p = 1-based
    * k-gram start. Windows are full windows only (starts 1..n_grams-w+1). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, w: Int): DataFrame = {
    require(k >= 2 && w >= 2, s"need k,w >= 2: k=$k w=$w")
    val t = col(textCol)
    // positions 1..len-k+1; sequence() runs DESCENDING on len < k — guard
    val posArr = when(length(t) >= k, sequence(lit(1), length(t) - (k - 1)))
      .otherwise(array().cast("array<int>"))
    val hashed = docs.select(col(idCol),
      (length(t) - (k - 1)).as("n_grams"),
      explode(posArr).as("p"),
      (0 until k).map(j =>
          ascii(t.substr(col("p") + j, lit(1))) *
            lit(pow(Base, k - 1 - j)))
        .reduce(_ + _).%(Mod).as("h"))

    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("p")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    hashed
      .withColumn("win_min",
        min(col("h") * PosSpan + (lit(PosSpan - 1) - col("p"))).over(win))
      .filter(col("p") <= col("n_grams") - (w - 1)) // full windows only
      .select(col(idCol), col("n_grams"),
        (lit(PosSpan - 1) - col("win_min") % PosSpan).as("p"),
        expr(s"win_min div $PosSpan").as("h"))
      .distinct()
  }

  private def pow(b: Long, e: Int): Long = (0 until e).foldLeft(1L)((a, _) => a * b)
}
