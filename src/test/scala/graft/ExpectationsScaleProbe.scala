package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Expectations, VersionedTable}

/** Scale evidence for the expectation gate: its cost is priced by the
  * DELTA (one localCheckpointed flag pass + per-violation quarantine
  * rows), never by the table. At growing TABLE sizes (1×, N×), a
  * FIXED-size gated batch (2.5k rows, ~500 violations) should cost the
  * same to ingest — and an ungated table of the same size prices the
  * baseline commit so the gate's surcharge is visible in isolation.
  * Print-and-judge probe (results in BASELINE.md), not an assertion.
  *
  * Usage: Test/runMain graft.ExpectationsScaleProbe [sfDir] [copies]
  */
object ExpectationsScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("expectations-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = "/tmp/graft_expectations_probe"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val n0 = docs0.count()
    // fixed gated batch: 2.5k rows, ~1/5 violating (n_chars bumped high)
    val batch = docs0.limit(2500)
      .withColumn("doc_id", col("doc_id") + lit(900000000L))
      .withColumn("n_chars",
        when(col("doc_id") % 5 === 0, lit(99999999L))
          .otherwise(col("n_chars"))).cache()
    val nViolations = batch.filter(col("n_chars") === 99999999L).count()

    Seq(1, copies).foreach { mult =>
      val tag = s"${mult}x"
      val (gated, plain, quar) =
        (s"$base/$tag/gated", s"$base/$tag/plain", s"$base/$tag/quar")
      val corpus = (0 until mult).map(i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_.unionByName(_))
      println(s"[probe] --- table $tag: ${n0 * mult} rows, " +
        s"batch fixed 2.5k ($nViolations violations) ---")
      VersionedTable.upsert(spark, gated, corpus, Seq("doc_id", "lang"),
        Seq("lang"))
      VersionedTable.upsert(spark, plain, corpus, Seq("doc_id", "lang"),
        Seq("lang"))
      Expectations.add(spark, gated, "chars_cap", "n_chars < 1000000",
        Expectations.QuarantineRows, Some(quar))
      t(s"$tag ungated ingest (baseline commit)") {
        VersionedTable.upsert(spark, plain, batch, Seq("doc_id", "lang"),
          Seq("lang"))
      }
      t(s"$tag gated ingest (gate + quarantine route)") {
        VersionedTable.upsert(spark, gated, batch, Seq("doc_id", "lang"),
          Seq("lang"))
      }
      val counted = Expectations.lastGateCounts("chars_cap")
      val quarRows = VersionedTable.read(spark, quar).count()
      println(s"[probe] $tag gate counted $counted, quarantine $quarRows " +
        s"(expect $nViolations/$nViolations)")
    }
    spark.stop()
  }
}
