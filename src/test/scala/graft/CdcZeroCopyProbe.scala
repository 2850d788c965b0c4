package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.VersionedTable

/** Scale evidence for the zero-copy CDC initial load: attach a
  * graft-cdc stream to a table and drain the bootstrap batch, once
  * against a CLEAN manifest (zero-copy: the batch serves the table's
  * own files) and once against the same data carrying one deletion
  * vector (fidelity fallback: the batch stages a full snapshot copy
  * under the checkpoint). The staged leg's checkpoint bytes grow with
  * the TABLE; the zero-copy leg's stay flat at metadata size — the
  * separation that makes a 100 TB attach read its data exactly once.
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
    import spark.implicits._

    def duBytes(p: java.nio.file.Path): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong(0L)
      Files.walk(p).forEach(f =>
        if (Files.isRegularFile(f)) total.addAndGet(Files.size(f)))
      total.get
    }

    def drainWall(table: String, ckpt: String): Double = {
      val t0 = System.nanoTime()
      val q = spark.readStream.format("graft-cdc")
        .option("table", table).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select(count(lit(1))).collect(); ()
        }.start()
      assert(q.awaitTermination(300000), "drain timed out")
      (System.nanoTime() - t0) / 1e9
    }

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    Seq(1, copies).foreach { c =>
      val base = Files.createTempDirectory(s"graft_cdczc_$c")
      val docs = (0 until c).map(i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_.unionByName(_))
      val n = docs.count()
      // CLEAN table: the initial load is zero-copy
      val cleanRoot = base.resolve("clean").toString
      VersionedTable.upsert(spark, cleanRoot, docs,
        Seq("doc_id", "lang"), Seq("lang"))
      spark.sql(s"CREATE TABLE cdczc_clean_$c USING graft " +
        s"LOCATION '$cleanRoot'")
      val ckptC = base.resolve("ckptC")
      val wallC = drainWall(s"cdczc_clean_$c", ckptC.toString)
      val bytesC = duBytes(ckptC)
      // SAME data + ONE deletion vector: fidelity fallback stages the
      // whole snapshot under the checkpoint
      val dvRoot = base.resolve("dv").toString
      VersionedTable.upsert(spark, dvRoot, docs,
        Seq("doc_id", "lang"), Seq("lang"))
      VersionedTable.deleteWhereDV(spark, dvRoot, "doc_id", 0L, 0L)
      spark.sql(s"CREATE TABLE cdczc_dv_$c USING graft " +
        s"LOCATION '$dvRoot'")
      val ckptD = base.resolve("ckptD")
      val wallD = drainWall(s"cdczc_dv_$c", ckptD.toString)
      val bytesD = duBytes(ckptD)
      println(f"CDC_ZEROCOPY_PROBE copies=$c rows=$n " +
        f"zero_copy_wall=$wallC%.1fs zero_copy_ckpt_kb=${bytesC / 1024} " +
        f"staged_wall=$wallD%.1fs staged_ckpt_kb=${bytesD / 1024}")
      spark.sql(s"DROP TABLE cdczc_clean_$c")
      spark.sql(s"DROP TABLE cdczc_dv_$c")
    }
    spark.stop()
  }
}
