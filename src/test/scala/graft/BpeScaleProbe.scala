package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.Subword

/** Scale evidence for BPE training: the corpus is touched ONCE (the
  * word-frequency shuffle); every merge round after runs on the
  * vocabulary, which Heaps' law keeps near-flat as the corpus grows —
  * so k-round training cost should grow far slower than corpus size,
  * and the per-round marginal cost (train k=16 minus train k=4, 12
  * extra rounds) should be roughly scale-INDEPENDENT. Replicating the
  * same documents N× grows the corpus without growing the vocabulary
  * at all — the pure separation of the two cost terms.
  *
  * Usage: Test/runMain graft.BpeScaleProbe [sfDir] [copies]
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("bpe-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val n0 = docs0.count()
    Seq(1, copies).foreach { c =>
      val docs = (0 until c).map(i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_.unionByName(_)).cache()
      val n = docs.count()
      val (m4, t4) = time { Subword.bpeTrain(docs, "text", 4).count() }
      val (m16, t16) = time { Subword.bpeTrain(docs, "text", 16).count() }
      println(f"BPE_PROBE copies=$c docs=$n train_k4=$t4%.1fs " +
        f"train_k16=$t16%.1fs marginal_12_rounds=${t16 - t4}%.1fs " +
        f"merges=$m4/$m16")
      docs.unpersist()
    }
    // k=64 storage leg: each round localCheckpoints a vocab snapshot,
    // and the SUPERSEDED round's blocks must unpersist as the next
    // round lands — peak cached storage stays ~2 vocab snapshots at
    // ANY k, and after training only the final snapshot lingers.
    // Before the round-10 unpersist, all k snapshots accumulated
    // (cleanup deferred to GC-driven ContextCleaner): the cached-RDD
    // count after a k=64 train read ~64, not ~1.
    def storage(): (Int, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.length,
        infos.map(i => i.memSize + i.diskSize).sum >> 20)
    }
    val docs = docs0.cache()
    docs.count()
    val (baseRdds, baseMb) = storage()
    val peakMb = new java.util.concurrent.atomic.AtomicLong(0L)
    val peakRdds = new java.util.concurrent.atomic.AtomicLong(0L)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sampler = new Thread(() => {
      while (!stop.get) {
        val (r, mb) = storage()
        if (mb > peakMb.get) peakMb.set(mb)
        if (r > peakRdds.get) peakRdds.set(r)
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val (m64, t64) = time { Subword.bpeTrain(docs, "text", 64).count() }
    stop.set(true)
    sampler.join()
    val (endRdds, endMb) = storage()
    println(f"BPE_PROBE_K64 merges=$m64 train_k64=$t64%.1fs " +
      f"baseline_rdds=$baseRdds baseline_mb=$baseMb " +
      f"peak_rdds=${peakRdds.get} peak_mb=${peakMb.get} " +
      f"residual_rdds=$endRdds residual_mb=$endMb")
    docs.unpersist()
    spark.stop()
  }
}
