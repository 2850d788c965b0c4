package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable
import graft.sim.AnnIndex

/** Scale probe for the CDC-maintained IVF index — the same claim as
  * DedupIndexScaleProbe on the similarity side: refreshing the index
  * after a FIXED 500-vector batch costs O(|batch|) however large the
  * corpus, and a probe at nProbe < nlist reads only the probed cells'
  * partition dirs. Corpus = sf0.1 embeddings replicated 1x/4x/8x with
  * offset ids. Run with
  *   sbt 'Test/runMain graft.AnnIndexScaleProbe [sfDir] [maxCopies]'
  * Prints wall seconds per stage; a human judges (timing asserts flake).
  */
object AnnIndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxCopies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        pmod(col("vec_id"), lit(8)).cast("int").as("grp"))
    val batch = emb0.orderBy("vec_id").limit(500)
      .withColumn("vec_id", col("vec_id") + lit(900000000L)).cache()
    batch.count()
    val queries = emb0.orderBy("vec_id").limit(32)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .cache()
    queries.count()

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def dataBytes(root: String): Long = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var b = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) b += f.getLen
      }
      b
    }

    Seq(1, math.max(2, maxCopies / 2), maxCopies).distinct.foreach { c =>
      val stage = java.nio.file.Files
        .createTempDirectory(s"graft_annprobe_$c").toString
      val (src, idx, idxQ) = (s"$stage/src", s"$stage/idx", s"$stage/idxq")
      val corpus = (0 until c).map(i =>
        emb0.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
        .reduce(_.union(_))
      VersionedTable.upsert(spark, src, corpus, Seq("vec_id", "grp"),
        Seq("grp"))
      val n = VersionedTable.read(spark, src).count()
      val (_, buildS) = time {
        AnnIndex.create(spark, idx, src, "vec_id", "embedding",
          nlist = 32, kmeansIters = 1)
      }
      val (_, buildQS) = time {
        AnnIndex.create(spark, idxQ, src, "vec_id", "embedding",
          nlist = 32, kmeansIters = 1, quantized = true)
      }
      VersionedTable.upsert(spark, src, batch, Seq("vec_id", "grp"),
        Seq("grp"))
      val (_, refreshS) = time { AnnIndex.refresh(spark, idx) }
      require(!AnnIndex.lastRefreshRebuild &&
        AnnIndex.lastRefreshVectors == 500,
        s"refresh not incremental at ${c}x")
      val (_, refreshQS) = time { AnnIndex.refresh(spark, idxQ) }
      require(!AnnIndex.lastRefreshRebuild &&
        AnnIndex.lastRefreshVectors == 500,
        s"quantized refresh not incremental at ${c}x")
      val (floatTop, probeS) = time {
        AnnIndex.topK(spark, idx, queries, "q_id", "q_vec", k = 10,
          nProbe = 4).collect()
      }
      val (quantTop, probeQS) = time {
        AnnIndex.topK(spark, idxQ, queries, "q_id", "q_vec", k = 10,
          nProbe = 4).collect()
      }
      // recall of the int8-stored index vs the float index at the SAME
      // nProbe (both approximate the brute-force truth identically
      // except for quantization at the shortlist boundary)
      val fSet = floatTop.map(r => (r.getLong(0), r.getLong(1))).toSet
      val qSet = quantTop.map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (fSet intersect qSet).size.toDouble / fSet.size
      // bytes compare identical lifecycles (1 build + 1 refresh each)
      val ratio = dataBytes(idx).toDouble / dataBytes(idxQ)
      println(f"ANNINDEX_PROBE copies=$c vectors=$n " +
        f"build=$buildS%.1fs refresh_500=$refreshS%.1fs " +
        f"probe32_np4=$probeS%.1fs rows=${floatTop.length}")
      println(f"ANNINDEX_PROBE_Q copies=$c vectors=$n " +
        f"build=$buildQS%.1fs refresh_500=$refreshQS%.1fs " +
        f"probe32_np4=$probeQS%.1fs recall_vs_float=$recall%.3f " +
        f"float_over_int8_bytes=$ratio%.2f")
    }
    spark.stop()
  }
}
