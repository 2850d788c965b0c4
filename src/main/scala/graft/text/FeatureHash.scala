package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hashing trick (Weinberger et al., ICML 2009): bag-of-words
  * features in a FIXED k-dimensional space with no vocabulary pass at
  * all — each token hashes straight to a bucket, with a ±1 sign drawn
  * from an independent hash bit so colliding tokens cancel in
  * expectation instead of piling up. THE featurizer for 100 TB text:
  * zero global state, zero dictionary broadcast, dimensionality chosen
  * up front, and the output merges across shards by plain addition.
  *
  * Determinism: bucket = first 8 md5 hex digits (base-16) mod k, sign =
  * parity of the 9th digit — both engine-replayable string/integer
  * arithmetic; weights are exact int64 sums of ±count.
  *
  * Scale shape: two input-sized grouped aggregations, both map-side
  * partial — (id, term) term frequency, then (id, bucket) signed sums
  * onto a ≤ k-wide key space per document. Exact zero-weight features
  * (sign-cancelled collisions) are dropped — the sparse convention. */
object FeatureHash {

  /** Long-format hashed features: (id, bucket ∈ [0, k), w ≠ 0). */
  def hashedFeatures(df: DataFrame, id: String, text: String,
                     k: Int): DataFrame = {
    require(k >= 2 && k <= (1 << 24), s"bucket count out of range: $k")
    val tf = df
      .select(col(id), explode(TextAnalysis.tokens(col(text))).as("term"))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("__cnt"))
    val h = md5(col("term"))
    tf
      .withColumn("bucket",
        (conv(substring(h, 1, 8), 16, 10).cast("long") % k).cast("int"))
      .withColumn("__sign",
        when(conv(substring(h, 9, 1), 16, 10).cast("long") % 2 === 0L, 1L)
          .otherwise(-1L))
      .groupBy(col(id), col("bucket"))
      .agg(sum(col("__sign") * col("__cnt")).as("w"))
      .filter(col("w") =!= 0L)
  }
}
