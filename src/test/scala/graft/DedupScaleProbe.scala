package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the dedup/similarity family (VERDICT r2 #6 adapted: no
  * sf1 testdata exists, so stress with a DERIVED corpus): replicate the
  * sf0.1 documents 8x with offset ids — an adversarial shape where every
  * shingle's document frequency multiplies and every near-dup family gains
  * 8 copies, so candidate-pair structure grows superlinearly. The probe
  * answers: do the df caps and banding keep wall time bounded? Run with
  *   sbt 'Test/runMain graft.DedupScaleProbe [sfDir] [copies]'
  * Prints wall seconds per stage; a human judges (timing asserts flake).
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = (0 until copies).map { i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
    }.reduce(_.union(_)).cache()
    val nDocs = docs.count()

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"DEDUP_PROBE $name docs=$nDocs rows=$rows wall=$sec%.1fs" +
        f" docs_per_s=${nDocs / sec}%.0f")
    }

    time("exact_dedup") {
      graft.dedup.FuzzyDedup.exactDupGroups(docs, "doc_id", "text").count()
    }
    // THE 100 TB path: star edges (linear in duplicate multiplicity) ->
    // connected components -> apply. Pair-LISTING stages below are gated:
    // their output is Ω(f²) per duplicate family (a 64× replication makes
    // every family ≥64 copies, so the pair set itself grows ~64× past the
    // 8× probe — an output-size fact, not an implementation bug), which is
    // exactly why the cluster path exists.
    val sh = graft.dedup.FuzzyDedup.shingleHashes(docs, "doc_id", "text", 3)
      .select(col("doc_id").as("id"), col("h64")).cache()
    sh.count()
    time("minhash_star_cluster_apply") {
      val edges = graft.dedup.FuzzyDedup.minhashClusterEdges(sh)
      graft.dedup.FuzzyDedup.applyDedup(docs, "doc_id", edges).count()
    }
    if (copies <= 8) {
      time("jaccard_pairs_0.5") {
        graft.dedup.FuzzyDedup.jaccardPairs(docs, "doc_id", "text",
          block = "lang", n = 3, minJaccard = 0.5).count()
      }
      time("minhash_banded_candidates") {
        graft.dedup.FuzzyDedup.minhashCandidates(docs, "doc_id", "text",
          n = 3).count()
      }
    } else {
      println(s"DEDUP_PROBE pair-listing stages SKIPPED at ${copies}x: " +
        "all-pairs output is quadratic in duplicate multiplicity " +
        "(measure the cluster path above; see minhashClusterEdges doc)")
    }

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = (0 until copies).map { i =>
      emb0.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
    }.reduce(_.union(_)).cache()
    val nVecs = emb.count()
    time(s"semantic_dedup_${nVecs}_vecs") {
      graft.sim.SemDedup.semanticDedup(emb, "vec_id", "embedding",
        minCosine = 0.42, signBits = 6).count()
    }
    spark.stop()
  }
}
