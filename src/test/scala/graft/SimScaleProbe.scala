package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.{Quantize, SemDedup, Similarity}

/** Scale evidence for the ANN / embedding-similarity family: replicate the
  * embeddings corpus N× (copy 0 verbatim; later copies perturb every
  * component with deterministic ±0.25 noise, putting variants at ~0.65
  * cosine to their base — distinct points, not a duplicate flood) and
  * price the family's scale paths against the brute-force ground truth:
  *
  *  - brute-force top-5 for 10 fixed queries (the linear baseline AND the
  *    recall reference);
  *  - IVF top-5 at nlist=64 / nProbe=8 (cell-bucketed search space);
  *  - int8-quantized top-5 (linear scan over the 4×-smaller column);
  *  - multi-table SRP-LSH near-dup pairs (bucketed candidate generation,
  *    verify on candidates only);
  *  - SemDedup at cos ≥ 0.9 (sign-cell-bounded quadratic).
  *
  * Print-and-judge probe (walls + recalls recorded in BASELINE.md), not an
  * assertion. Usage: Test/runMain graft.SimScaleProbe [sfDir] [copies]
  */
object SimScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("sim-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").filter(col("embedding").isNotNull)
    val n0 = emb0.count()
    val corpus = (0 until copies).map { i =>
      val shifted = emb0
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
      if (i == 0) shifted
      else shifted.withColumn("embedding",
        // deterministic per-(vector, component) noise: xxhash64 → [0,1)
        // → ±amp. Default amp 0.25 puts unit-norm variants at ~0.65
        // cosine (distinct points); every 16th base vector instead gets
        // ±0.02 (cos ≈ 0.997) — a PLANTED near-dup family of `copies`
        // members, so the pair-listing legs verify real positives with
        // bounded family size instead of scanning a dup-free corpus
        transform(col("embedding"), (x, j) =>
          (x + (pmod(xxhash64(col("vec_id"), j), lit(1000))
            .cast("double") / lit(1000.0) - lit(0.5)) *
            when(pmod(col("vec_id"), lit(10000000L)) % 16 === 0,
              lit(0.04)).otherwise(lit(0.5)))
            .cast("float")))
    }.reduce(_.unionByName(_)).persist()
    println(s"[probe] corpus: ${corpus.count()} vectors ($copies x $n0)")
    val queries = emb0.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

    val bf = t("brute-force top-5 (10 queries)") {
      Similarity.bruteForceTopK(queries, corpus, "q_id", "vec_id",
          "q_vec", "embedding", k = 5)
        .select("query_id", "neighbor_id").collect()
    }
    val bfSet = bf.map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]): Double =
      bfSet.intersect(rows.map(r => (r.getLong(0), r.getLong(1))).toSet)
        .size.toDouble / bfSet.size

    val ivf = t("ivfTopK nlist=64 nProbe=8") {
      Similarity.ivfTopK(queries, corpus, "q_id", "vec_id", "q_vec",
          "embedding", k = 5, nlist = 64, nProbe = 8)
        .select("query_id", "neighbor_id").collect()
    }
    println(f"[probe] ivf recall@5: ${recall(ivf)}%.3f")

    val qt = t("quantizedTopK int8") {
      Quantize.quantizedTopK(queries, corpus, "q_id", "vec_id", "q_vec",
          "embedding", k = 5)
        .select("query_id", "neighbor_id").collect()
    }
    println(f"[probe] quantized recall@5: ${recall(qt)}%.3f")

    val nLsh = t("lsh pairs (nbits=14, 8 tables, cos>=0.85)") {
      Similarity.lshNearDupPairsMulti(corpus, "vec_id", "embedding",
        dim = 64, minCosine = 0.85, nbits = 14, nTables = 8).count()
    }
    println(s"[probe] lsh pairs: $nLsh")

    val nSem = t("semanticDedup (signBits=10, cos>=0.9)") {
      SemDedup.semanticDedup(corpus, "vec_id", "embedding",
        minCosine = 0.9, signBits = 10).count()
    }
    println(s"[probe] semantic survivors: $nSem of ${n0 * copies}")
    spark.stop()
  }
}
