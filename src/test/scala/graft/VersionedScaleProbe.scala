package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** Scale evidence for the versioned-table index family: replicate the
  * documents corpus N×, build the table with stats + bloom indexes, and
  * price (a) a full scan, (b) a clustered-range readWhere, (c) a bloom
  * point readWhereEq, (d) an index-targeted deleteWhere — with the skip
  * ratios that explain the walls. Print-and-judge probe (results recorded
  * in BASELINE.md), not an assertion.
  *
  * Usage: Test/runMain graft.VersionedScaleProbe [sfDir] [copies]
  */
object VersionedScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("versioned-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val root = "/tmp/graft_versioned_probe/table"
    val p = new org.apache.hadoop.fs.Path("/tmp/graft_versioned_probe")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    // copies× the corpus with shifted ids (distinct logical docs)
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars")
    val n0 = docs0.count()
    val docs = (0 until copies).map(i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
      .reduce(_.unionByName(_))
    println(s"[probe] corpus: ${n0 * copies} rows ($copies x $n0)")

    t(s"build (stats n_chars, bloom doc_id)") {
      VersionedTable.upsert(spark, root, docs, Seq("doc_id", "lang"),
        Seq("lang"), statsCols = Seq("n_chars"), fileRows = Some(2000),
        bloomCols = Seq("doc_id"))
    }
    val fsP = new org.apache.hadoop.fs.Path(root)
    val fsys = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sizeOf(n: String): Long =
      try fsys.getFileStatus(new org.apache.hadoop.fs.Path(root, n)).getLen
      catch { case _: Throwable => -1L }
    println(s"[probe] manifest ${sizeOf("_manifest.0")} B, " +
      s"index blocks ${sizeOf("_idx.0")} B, " +
      s"bloom sidecar ${sizeOf("_bloomx.0")} B " +
      "(refs in the manifest, payload in the sidecar)")
    val full = t("full scan count") {
      VersionedTable.read(spark, root).count()
    }
    val (rk, rt) = VersionedTable.skipStats(spark, root, "n_chars", 100, 200)
    println(s"[probe] range skip: scan $rk of $rt files")
    val nRange = t("readWhere n_chars in [100,200]") {
      VersionedTable.readWhere(spark, root, "n_chars", 100, 200).count()
    }
    val needle = 3L * 10000000L + 42L // copy 3's doc 42
    val (ek, et) = VersionedTable.skipStatsEq(spark, root, "doc_id", needle)
    println(s"[probe] bloom skip: scan $ek of $et files")
    val nEq = t("readWhereEq doc_id needle") {
      VersionedTable.readWhereEq(spark, root, "doc_id", needle).count()
    }
    val tFullFilter = t("full-scan filter (same predicates)") {
      val r = VersionedTable.read(spark, root)
      r.filter(col("n_chars") >= 100 && col("n_chars") <= 200).count() +
        r.filter(col("doc_id") === needle).count()
    }
    t("deleteWhere n_chars in [150,160]") {
      VersionedTable.deleteWhere(spark, root, "n_chars", 150, 160)
    }
    val after = VersionedTable.read(spark, root).count()
    println(s"[probe] rows: full $full, range $nRange, eq $nEq, " +
      s"post-delete $after (fullFilter probe $tFullFilter)")
    // metadata-only family: manifest arithmetic vs the scans above
    val fc = t("fastCount (metadata only)") {
      VersionedTable.fastCount(spark, root)
    }
    val fmm = t("fastMinMax n_chars (metadata only)") {
      VersionedTable.fastMinMax(spark, root, "n_chars")
    }
    println(s"[probe] fastCount: $fc (scan count was $after), " +
      s"fastMinMax: $fmm")
    val restored = t("restore to v0 (zero-copy)") {
      VersionedTable.restore(spark, root, 0)
    }
    println(s"[probe] restored v$restored; rows now " +
      s"${VersionedTable.fastCount(spark, root).getOrElse(-1L)}")
    // merge-on-read vs rewrite: the SAME delete window priced both ways
    // (the rewrite wall is above; the restore put the rows back)
    val vDv = t("deleteWhereDV n_chars in [150,160]") {
      VersionedTable.deleteWhereDV(spark, root, "n_chars", 150, 160)
    }
    val dvRows = VersionedTable.dvStats(spark, root).map(_._2).sum
    println(s"[probe] dv sidecar ${sizeOf(s"_dvx.$vDv")} B for " +
      s"$dvRows deleted rows across " +
      s"${VersionedTable.dvStats(spark, root).size} files")
    val afterDv = t("post-DV full scan count") {
      VersionedTable.read(spark, root).count()
    }
    println(s"[probe] post-DV rows $afterDv " +
      s"(rewrite delete gave $after), fastCount post-DV " +
      s"${VersionedTable.fastCount(spark, root)}")
    spark.stop()
  }
}
