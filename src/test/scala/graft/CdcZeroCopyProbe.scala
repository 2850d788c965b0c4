package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.VersionedTable

/** Scale evidence for the zero-copy CDC initial load: attach a
  * graft-cdc stream to a table and drain the bootstrap batch, against
  * a CLEAN manifest (zero-copy: the batch serves the table's own
  * files), against the same data carrying one deletion vector (round
  * 11: ALSO zero-copy — the DV file reads row-path with its deleted
  * positions skipped in-plan), and against a staged-path control (a
  * renamed column, which genuinely needs the read path) whose
  * checkpoint bytes grow with the TABLE. Both zero-copy legs' stay
  * flat at metadata size — the separation that makes a 100 TB attach
  * read its data exactly once, deletion vectors or not.
  *
  * Usage: Test/runMain graft.CdcZeroCopyProbe [sfDir] [copies]
  */
object CdcZeroCopyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("cdc-zerocopy-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def duBytes(p: java.nio.file.Path): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong(0L)
      Files.walk(p).forEach(f =>
        if (Files.isRegularFile(f)) total.addAndGet(Files.size(f)))
      total.get
    }

    def drainWall(table: String, ckpt: String): (Double, Long) = {
      val rows = new java.util.concurrent.atomic.AtomicLong(0L)
      val t0 = System.nanoTime()
      val q = spark.readStream.format("graft-cdc")
        .option("table", table).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          rows.addAndGet(b.count()); ()
        }.start()
      assert(q.awaitTermination(300000), "drain timed out")
      ((System.nanoTime() - t0) / 1e9, rows.get)
    }

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    Seq(1, copies).foreach { c =>
      val base = Files.createTempDirectory(s"graft_cdczc_$c")
      val docs = (0 until c).map(i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_.unionByName(_))
      val n = docs.count()
      // CLEAN table: the initial load is zero-copy (columnar)
      val cleanRoot = base.resolve("clean").toString
      VersionedTable.upsert(spark, cleanRoot, docs,
        Seq("doc_id", "lang"), Seq("lang"))
      spark.sql(s"CREATE TABLE cdczc_clean_$c USING graft " +
        s"LOCATION '$cleanRoot'")
      val ckptC = base.resolve("ckptC")
      val (wallC, rowsC) = drainWall(s"cdczc_clean_$c", ckptC.toString)
      val bytesC = duBytes(ckptC)
      // SAME data + deletion vectors: STILL zero-copy (round 11) — DV
      // files read row-path with positions skipped; the checkpoint must
      // stay metadata-sized and the rows must equal the read path's
      val dvRoot = base.resolve("dv").toString
      VersionedTable.upsert(spark, dvRoot, docs,
        Seq("doc_id", "lang"), Seq("lang"))
      VersionedTable.deleteWhereDV(spark, dvRoot, "doc_id", 0L, 4L)
      spark.sql(s"CREATE TABLE cdczc_dv_$c USING graft " +
        s"LOCATION '$dvRoot'")
      val ckptD = base.resolve("ckptD")
      val (wallD, rowsD) = drainWall(s"cdczc_dv_$c", ckptD.toString)
      val bytesD = duBytes(ckptD)
      val expectD = VersionedTable.read(spark, dvRoot).count()
      assert(rowsD == expectD,
        s"DV zero-copy delivered $rowsD rows, read path has $expectD")
      // SERVED-DIR DV FALLBACK (round 12): a DV that lands on dirs
      // appended INSIDE the drain window is the one case the
      // append-only zero-copy diff must refuse (it serves whole files
      // as inserts and carries no positions). The fallback takes the
      // general read-path diff — which must stage CHANGE-sized bytes,
      // not table-sized: the appended slice is FIXED while the table
      // scales, so the incremental checkpoint delta must stay flat
      // 1x -> 8x.
      val fbRoot = base.resolve("fallback").toString
      VersionedTable.upsert(spark, fbRoot, docs,
        Seq("doc_id", "lang"), Seq("lang"))
      spark.sql(s"CREATE TABLE cdczc_fb_$c USING graft " +
        s"LOCATION '$fbRoot'")
      val ckptF = base.resolve("ckptF")
      val (_, rowsF0) = drainWall(s"cdczc_fb_$c", ckptF.toString)
      assert(rowsF0 == n, s"fallback leg bootstrap: $rowsF0 of $n")
      val bytesF0 = duBytes(ckptF)
      // fixed-size append into BRAND-NEW dirs + a DV on those same dirs
      // before the next drain — the (from, to] window has DVs on served
      // new dirs, so rawAppendDiffFiles must fall back
      val slice = docs0.filter(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + lit(900000000L))
        .withColumn("lang", concat(lit("zz-"), col("lang")))
      val sliceN = slice.count()
      VersionedTable.upsert(spark, fbRoot, slice,
        Seq("doc_id", "lang"), Seq("lang"))
      VersionedTable.deleteWhereDV(spark, fbRoot, "doc_id",
        900000000L, 900000000L + 2000L)
      val deleted = sliceN - VersionedTable.read(spark, fbRoot)
        .filter(col("doc_id") >= 900000000L).count()
      assert(deleted > 0, "fallback leg: the DV deleted nothing")
      val (wallF, rowsF) = drainWall(s"cdczc_fb_$c", ckptF.toString)
      val bytesF = (duBytes(ckptF) - bytesF0).max(0L)
      assert(rowsF == sliceN - deleted,
        s"fallback delivered $rowsF, expected ${sliceN - deleted} " +
          "(new-dir survivors only)")
      println(f"CDC_ZEROCOPY_PROBE copies=$c FALLBACK slice=$sliceN " +
        f"dv_deleted=$deleted wall=$wallF%.1fs staged_delta_kb=" +
        f"${bytesF / 1024}")
      spark.sql(s"DROP TABLE cdczc_fb_$c")
      // STAGED control (a renamed column genuinely needs the read
      // path): its checkpoint carries a full snapshot copy — the
      // growth the DV leg no longer pays
      val stRoot = base.resolve("staged").toString
      VersionedTable.upsert(spark, stRoot, docs,
        Seq("doc_id", "lang"), Seq("lang"))
      VersionedTable.renameColumn(spark, stRoot, "text", "body")
      spark.sql(s"CREATE TABLE cdczc_st_$c USING graft " +
        s"LOCATION '$stRoot'")
      val ckptS = base.resolve("ckptS")
      val (wallS, _) = drainWall(s"cdczc_st_$c", ckptS.toString)
      val bytesS = duBytes(ckptS)
      println(f"CDC_ZEROCOPY_PROBE copies=$c rows=$n " +
        f"zero_copy_wall=$wallC%.1fs zero_copy_ckpt_kb=${bytesC / 1024} " +
        f"dv_zero_copy_wall=$wallD%.1fs dv_ckpt_kb=${bytesD / 1024} " +
        f"dv_rows=$rowsD " +
        f"staged_wall=$wallS%.1fs staged_ckpt_kb=${bytesS / 1024}")
      assert(rowsC == n, s"clean leg delivered $rowsC of $n rows")
      spark.sql(s"DROP TABLE cdczc_clean_$c")
      spark.sql(s"DROP TABLE cdczc_dv_$c")
      spark.sql(s"DROP TABLE cdczc_st_$c")
    }
    spark.stop()
  }
}
