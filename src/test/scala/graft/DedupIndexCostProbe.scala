package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** Wall attribution for q_dedup_index's five phases at sf0.1. */
object DedupIndexCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("dedup-index-cost").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"[probe] === rep $rep")
      val stage = s"/tmp/graft_didx_probe/$rep"
      val (src, idx) = (s"$stage/src", s"$stage/idx")
      val p = new org.apache.hadoop.fs.Path("/tmp/graft_didx_probe/" + rep)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"))
      val batch = docs.filter(col("doc_id") % 10 === 0)
      t("upsert corpus 90%") {
        VersionedTable.upsert(spark, src, docs.filter(col("doc_id") % 10 =!= 0),
          Seq("doc_id", "lang"), Seq("lang"))
      }
      t("DedupIndex.create") {
        graft.dedup.DedupIndex.create(spark, idx, src, "doc_id", "text",
          shingleN = 3, numPerm = 64, bands = 32)
      }
      t("upsert batch 10%") {
        VersionedTable.upsert(spark, src, batch, Seq("doc_id", "lang"), Seq("lang"))
      }
      t("refresh (incremental)") {
        graft.dedup.DedupIndex.refresh(spark, idx)
      }
      t("verifiedPairs + collect") {
        graft.dedup.DedupIndex.verifiedPairs(spark, idx, batch, 0.7)
          .filter(col("corpus_id") % 10 =!= 0).count()
      }
    }
    spark.stop()
  }
}
