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
    * g = Σ_rows q[i]·q[j] in fixed-point int64.
    *
    * This is the one place mapPartitions earns its keep: the natural
    * declarative form (explode d²/2 products per row → aggregate) ships
    * |rows|·d²/2 struct rows into the exchange — 2·10¹² at a billion
    * rows — when the sufficient statistic is a CONSTANT d²/2-long
    * accumulator per partition. Each partition folds its rows into that
    * local array (long adds are order-free, so partitioning never
    * changes the result) and emits it once; the final aggregate
    * combines |partitions| rows. State: d(d+1)/2 longs ≈ 16 KB at
    * d = 64, regardless of data volume. */
  def gramFixedPoint(df: DataFrame, vec: String,
                     scaleBits: Int = 12): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 20, s"bad scaleBits: $scaleBits")
    val scale = (1L << scaleBits).toDouble
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.filter(col(vec).isNotNull)
      .select(col(vec).cast("array<float>")).as[Seq[Float]]
    val partials = vecs.mapPartitions { it =>
      var acc: Array[Long] = null
      var d = 0
      it.foreach { v =>
        if (acc == null) { d = v.length; acc = new Array[Long](d * (d + 1) / 2) }
        require(v.length == d, s"ragged vectors: $d vs ${v.length}")
        val q = new Array[Long](d)
        var i = 0
        while (i < d) { q(i) = math.floor(v(i).toDouble * scale + 0.5).toLong; i += 1 }
        var k = 0; i = 0
        while (i < d) {
          var j = i
          while (j < d) { acc(k) += q(i) * q(j); j += 1; k += 1 }
          i += 1
        }
      }
      if (acc == null) Iterator.empty
      else {
        var k = 0
        val out = new Array[(Int, Int, Int, Long)](acc.length)
        var i = 0
        while (i < d) {
          var j = i
          while (j < d) { out(k) = (d, i, j, acc(k)); j += 1; k += 1 }
          i += 1
        }
        out.iterator
      }
    }.toDF("d", "i", "j", "p")
    // the per-partition ragged require only sees ITS partition's first
    // vector — two internally-consistent partitions with different dims
    // would otherwise merge silently into a corrupt Gram. Each partial
    // carries its dim; mixing surfaces as min != max on a shared (i, j).
    partials.groupBy(col("i"), col("j"))
      .agg(sum(col("p")).as("g"), min(col("d")).as("__dlo"),
        max(col("d")).as("__dhi"))
      .filter(isnull(assert_true(col("__dlo") === col("__dhi"),
        lit("ragged vectors across partitions: mixed embedding dims"))))
      .select(col("i"), col("j"), col("g"))
  }

  /** Signed random projection (Achlioptas/JL sketch): project each
    * vector from its native dimension down to `k` output dims through a
    * ±1 matrix derived from md5(pos, j) parity — no stored matrix, no
    * randomness to seed, the "transform" IS the hash. Dot products are
    * preserved in expectation (E[⟨y_a, y_b⟩] = k·⟨a, b⟩), which is all a
    * downstream LSH / coarse search needs; exact int64 output (the
    * global 2^bits quantization convention above) merges across shards
    * and replays bit-for-bit in an oracle.
    *
    * Scale shape: the sign matrix is |dims|·k rows built from the DATA's
    * own distinct positions (broadcast); the projection is one
    * posexplode + broadcast join + (id, j) partial-aggregated sum —
    * input×k work, never a pair join. */
  def signedProjection(df: DataFrame, id: String, vec: String, k: Int,
                       scaleBits: Int = 12): DataFrame = {
    require(k >= 1 && k <= 4096, s"output dims out of range: $k")
    require(scaleBits >= 1 && scaleBits <= 20, s"bad scaleBits: $scaleBits")
    val scale = (1L << scaleBits).toDouble
    val q = df.filter(col(vec).isNotNull)
      .select(col(id), posexplode(col(vec)).as(Seq("pos", "__x")))
      .withColumn("__q",
        floor(col("__x").cast("double") * lit(scale) + lit(0.5))
          .cast("long"))
    val sgn = q.select(col("pos")).distinct()
      .select(col("pos"),
        explode(array((0 until k).map(lit): _*)).as("j"))
      .withColumn("__s",
        when(conv(substring(md5(concat(lit("proj"),
            col("pos").cast("string"), lit("_"), col("j").cast("string"))),
            1, 1), 16, 10).cast("long") % 2 === 0L, 1L)
          .otherwise(-1L))
    q.join(broadcast(sgn), "pos")
      .groupBy(col(id), col("j"))
      .agg(sum(col("__q") * col("__s")).as("y"))
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
