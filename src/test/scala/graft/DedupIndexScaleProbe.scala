package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.DedupIndex
import graft.ops.VersionedTable

/** Scale probe for the CDC-maintained LSH index: the claim under test is
  * that keeping near-dedup CURRENT costs O(|changed docs|), not
  * O(|corpus|) — i.e. the incremental refresh's wall is flat as the
  * corpus grows while the full build's grows linearly. Corpus = sf0.1
  * documents replicated 1x/4x/8x with offset ids; at each size: build
  * the index (full), upsert a FIXED 500-doc batch, refresh
  * (incremental), probe candidates for the batch. Run with
  *   sbt 'Test/runMain graft.DedupIndexScaleProbe [sfDir] [maxCopies]'
  * Prints wall seconds per stage; a human judges (timing asserts flake).
  */
object DedupIndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxCopies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val batch = docs0.orderBy("doc_id").limit(500)
      .withColumn("doc_id", col("doc_id") + lit(900000000L)).cache()
    batch.count()

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    Seq(1, math.max(2, maxCopies / 2), maxCopies).distinct.foreach { c =>
      val stage = java.nio.file.Files
        .createTempDirectory(s"graft_idxprobe_$c").toString
      val (src, idx) = (s"$stage/src", s"$stage/idx")
      val corpus = (0 until c).map(i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_.union(_))
      VersionedTable.upsert(spark, src, corpus, Seq("doc_id", "lang"),
        Seq("lang"))
      val n = VersionedTable.read(spark, src).count()
      val (_, buildS) = time {
        DedupIndex.create(spark, idx, src, "doc_id", "text",
          shingleN = 3, numPerm = 64, bands = 32)
      }
      VersionedTable.upsert(spark, src, batch, Seq("doc_id", "lang"),
        Seq("lang"))
      val (_, refreshS) = time { DedupIndex.refresh(spark, idx) }
      require(!DedupIndex.lastRefreshRebuild &&
        DedupIndex.lastRefreshDocs == 500,
        s"refresh not incremental at ${c}x")
      val ((pairs, _), probeS) = time {
        val p = DedupIndex.verifiedPairs(spark, idx, batch, 0.7).count()
        (p, ())
      }
      println(f"DEDUPINDEX_PROBE copies=$c docs=$n " +
        f"build=$buildS%.1fs refresh_500=$refreshS%.1fs " +
        f"probe_500=$probeS%.1fs pairs=$pairs")
    }
    spark.stop()
  }
}
