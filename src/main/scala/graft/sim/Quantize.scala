package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType}

/**
 * Symmetric per-vector int8 quantization for embedding columns — the
 * storage/shuffle lever for similarity search at corpus scale: a 64-dim
 * float32 embedding is 256 bytes on the wire; its int8 twin plus one
 * float scale is 68 — a 3.8x cut in the dominant byte volume of every
 * ANN shuffle, cache, and index artifact. Cosine similarity is scale-
 * invariant, so per-vector scaling loses only rounding precision (the
 * recall cost is checked by q_sim_quantized's invariant, not assumed).
 *
 * Determinism contract (cross-engine oracle-checkable, unlike learned
 * codebooks): scale = max|x| / 127 with max computed in FLOAT (exact ops:
 * abs, max), quantize = floor(x/scale + 0.5) in DOUBLE (explicit
 * half-up — Spark round() HALF_UPs via BigDecimal, DuckDB round()
 * half-aways via C rint-ish paths; floor(+0.5) is the same IEEE op
 * sequence on both engines), clamped to [-127, 127].
 */
object Quantize {

  /** Add `qCol` (array<int> in [-127, 127]) and `scaleCol` (double) for
    * `vec`. Zero vectors quantize to all-zero with scale 0 (guarded — no
    * NaN). transform/array_max are interpreted (CodegenFallback), which is
    * the right trade at ingest: this runs once per corpus row, not once
    * per candidate pair. */
  def quantizeInt8(df: DataFrame, vec: String, qCol: String = "q_vec",
                   scaleCol: String = "q_scale"): DataFrame = {
    val maxabs = array_max(transform(col(vec), x => abs(x)))
    val scale = maxabs.cast(DoubleType) / lit(127.0)
    df.withColumn(scaleCol, scale)
      .withColumn(qCol,
        when(col(scaleCol) === 0.0,
          transform(col(vec), _ => lit(0).cast(IntegerType)))
        .otherwise(transform(col(vec), x =>
          greatest(lit(-127.0), least(lit(127.0),
            floor(x.cast(DoubleType) / col(scaleCol) + lit(0.5))))
            .cast(IntegerType))))
  }

  /** Reconstruct a float vector from `qCol` × `scaleCol` — the read path
    * of a quantized index. */
  def dequantize(df: DataFrame, qCol: String, scaleCol: String,
                 out: String): DataFrame =
    df.withColumn(out,
      transform(col(qCol),
        x => (x.cast(DoubleType) * col(scaleCol)).cast(FloatType)))

  /** Brute-force cosine top-k over int8-quantized vectors: quantize both
    * sides, dequantize, and rank with the exact kernel ([[Similarity
    * .bruteForceTopK]] — query side broadcast, corpus never shuffled).
    * The point at scale is that the corpus scan reads the 68-byte
    * quantized column instead of the 256-byte float column; the ranking
    * math is unchanged. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                    cId: String, qVec: String, cVec: String,
                    k: Int): DataFrame = {
    val q = dequantize(quantizeInt8(queries, qVec), "q_vec", "q_scale", "__dq")
      .select(col(qId), col("__dq").as(qVec))
    val c = dequantize(quantizeInt8(corpus, cVec), "q_vec", "q_scale", "__dc")
      .select(col(cId), col("__dc").as(cVec))
    Similarity.bruteForceTopK(q, c, qId, cId, qVec, cVec, k)
  }
}
