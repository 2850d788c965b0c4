package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Spectral analytics over an embedding column: the exact Gram matrix
  * XᵀX as one aggregate, and the top principal component for corpus
  * diagnostics (dominant-direction drift, anisotropy checks, 1-D
  * curriculum ordering) — PCA's moment step done Spark-shaped.
  *
  * The Gram is computed in FIXED-POINT int64 (each coordinate quantized
  * to q = ⌊x·2^bits + ½⌋ once, globally — NOT the per-row scale of
  * Quantize.quantizeInt8, which would destroy cross-row additivity):
  * every G[i,j] = Σ q_i·q_j is an exact integer, bit-identical on any
  * engine, mergeable across partitions/days, and DuckDB-checkable. With
  * unit-scale floats and the default 12 bits, |q| ≤ 4096, so a Gram
  * entry overflows int64 only past ~5·10¹¹ rows — shard beyond that.
  *
  * Scale shape: the d(d+1)/2 upper-triangle products expand PER ROW from
  * one array (the coOccurrenceEdges narrow-expansion discipline — no
  * positional self-join of the exploded corpus), then ONE aggregate over
  * a d²-sized key space. The eigenvector step runs on the driver over
  * the collected d×d matrix — d² doubles, constant in the corpus — and
  * the projection rides back as a broadcast literal dot product. */
object Spectral {

  /** Upper-triangle exact Gram: one row per (i ≤ j) with
    * g = Σ_rows q[i]·q[j] in fixed-point int64. */
  def gramFixedPoint(df: DataFrame, vec: String,
                     scaleBits: Int = 12): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 20, s"bad scaleBits: $scaleBits")
    val scale = (1L << scaleBits).toDouble
    val q = df.select(transform(col(vec), x =>
      floor(x.cast("double") * lit(scale) + lit(0.5)).cast("long"))
      .as("__q"))
    q.select(explode(expr(
        "flatten(transform(__q, (x, i) -> " +
          "transform(slice(__q, i + 1, size(__q) - i), " +
          "(y, j0) -> struct(i AS i, i + j0 AS j, x * y AS p))))"))
        .as("__t"))
      .select(col("__t.i").as("i"), col("__t.j").as("j"), col("__t.p").as("p"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("p")).as("g"))
  }

  /** Top eigenvector of the collected Gram by power iteration — a
    * driver-side O(d²·iters) step on constant-size data, single-threaded
    * fixed-order arithmetic (deterministic for a given Gram; the Gram
    * itself is exact, so the whole path is reproducible). Sign is fixed
    * by making the largest-|coordinate| entry positive. */
  def topComponent(gram: Seq[Row], dim: Int, iters: Int = 100): Array[Double] = {
    require(dim > 0 && iters > 0)
    val g = Array.ofDim[Double](dim, dim)
    gram.foreach { r =>
      val (i, j, v) = (r.getAs[Int]("i"), r.getAs[Int]("j"), r.getAs[Long]("g"))
      g(i)(j) = v.toDouble; g(j)(i) = v.toDouble
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var k = 0
    while (k < iters) {
      val w = Array.tabulate(dim)(i => {
        var s = 0.0; var j = 0
        while (j < dim) { s += g(i)(j) * v(j); j += 1 }; s
      })
      val n = math.sqrt(w.map(x => x * x).sum)
      if (n == 0.0) return v // degenerate all-zero Gram: keep the start
      v = w.map(_ / n)
      k += 1
    }
    val amax = v.indices.maxBy(i => math.abs(v(i)))
    if (v(amax) < 0) v.map(-_) else v
  }

  /** Corpus projection onto the top principal direction of its own Gram:
    * adds `pc1_score` = ⟨x, pc1⟩. Two actions: the Gram aggregate
    * (collected — d² rows) and the narrow projection pass with the
    * eigenvector as a broadcast literal. */
  def principalProjection(df: DataFrame, vec: String, dim: Int,
                          scaleBits: Int = 12, iters: Int = 100,
                          out: String = "pc1_score"): DataFrame = {
    val pc = topComponent(gramFixedPoint(df, vec, scaleBits).collect()
      .toSeq, dim, iters)
    df.withColumn(out,
      aggregate(zip_with(col(vec).cast("array<double>"), typedlit(pc),
        (x, w) => x * w), lit(0.0), (acc, t) => acc + t))
  }
}
