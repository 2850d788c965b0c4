package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{MatView, VersionedTable}

/** Scale evidence for incremental view maintenance: at growing source
  * sizes (1×, N×), price (a) the initial full build, (b) a delta-only
  * refresh after a FIXED-size change batch, (c) a min/max recompute
  * refresh after the same batch. The claim under test: refresh cost
  * tracks the CHANGE volume, not the table volume — (b) and (c) should
  * stay near-flat while (a) grows with the corpus. Print-and-judge
  * probe (results recorded in BASELINE.md), not an assertion.
  *
  * Usage: Test/runMain graft.MatViewScaleProbe [sfDir] [copies]
  */
object MatViewScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("matview-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = "/tmp/graft_matview_probe"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars")
    val n0 = docs0.count()

    Seq(1, copies).foreach { mult =>
      val tag = s"${mult}x"
      val (src, viewD, viewM) =
        (s"$base/$tag/src", s"$base/$tag/view_delta", s"$base/$tag/view_mm")
      val docs = (0 until mult).map(i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_.unionByName(_))
      println(s"[probe] --- source $tag: ${n0 * mult} rows ---")
      t(s"$tag source build") {
        VersionedTable.upsert(spark, src, docs, Seq("doc_id", "lang"),
          Seq("lang"), statsCols = Seq("doc_id"), fileRows = Some(20000))
      }
      t(s"$tag view full build (delta-only)") {
        MatView.create(spark, viewD, src, Seq("doc_id", "lang"),
          Seq("source"), sums = Seq(("chars", "n_chars")),
          countAlias = Some("n"))
      }
      t(s"$tag view full build (min/max)") {
        MatView.create(spark, viewM, src, Seq("doc_id", "lang"),
          Seq("source"), mins = Seq(("lo", "n_chars")),
          maxs = Seq(("hi", "n_chars")), countAlias = Some("n"))
      }
      // FIXED-size change: 2000 updates + 500 inserts whatever the scale
      val batch = docs0.limit(2500).withColumn("doc_id",
          when(col("doc_id") % 5 === 0, col("doc_id") + lit(900000000L))
            .otherwise(col("doc_id")))
        .withColumn("n_chars", col("n_chars") + lit(17))
      VersionedTable.upsert(spark, src, batch, Seq("doc_id", "lang"),
        Seq("lang"), statsCols = Seq("doc_id"))
      t(s"$tag delta refresh (fixed 2.5k-row change)") {
        MatView.refresh(spark, viewD)
      }
      t(s"$tag min/max refresh (same change)") {
        MatView.refresh(spark, viewM)
      }
      val served = MatView.read(spark, viewD)
        .agg(sum("n")).collect().head.getLong(0)
      println(s"[probe] $tag served row-count ${served} " +
        s"(expect ${n0 * mult + 500})")
    }
    spark.stop()
  }
}
