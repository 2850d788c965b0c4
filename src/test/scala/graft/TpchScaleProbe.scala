package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the TPC-H query family (same adaptation as
  * DedupScaleProbe: no sf1 testdata exists, so stress with a DERIVED
  * lake): replicate the sf0.1 fact tables `copies`x — orders and lineitem
  * with offset orderkeys so the order/lineitem relationship stays intact,
  * dimensions (customer/part/supplier/nation/region) UNCHANGED so every
  * dim key fans out `copies`x — then run the ACTUAL graded SparkEntry
  * queries against the derived directory. This is the realistic growth
  * shape: facts grow, dimensions don't, per-key join fan-out multiplies.
  * The probe answers: do the heavy TPC-H plans (dual correlation,
  * having-threshold, correlated avg, 5-table star) scale ~linearly in the
  * fact size, or does something quadratic/driver-bound hide at sf0.1?
  * Run with
  *   sbt 'Test/runMain graft.TpchScaleProbe [sfDir] [copies]'
  * Prints wall seconds per query; a human judges (timing asserts flake).
  */
object TpchScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft_tpch_probe").toString
    val keyOffset = 1000000000L
    def replicate(name: String, keys: Seq[String]): Unit = {
      val t0 = spark.read.parquet(s"$sfDir/$name.parquet")
      (0 until copies).map { i =>
        keys.foldLeft(t0) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * keyOffset))
        }
      }.reduce(_.union(_))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    // facts: replicated with consistent orderkey offsets
    replicate("orders", Seq("o_orderkey"))
    replicate("lineitem", Seq("l_orderkey"))
    // dimensions: copied unchanged (per-key fan-out grows `copies`x)
    Seq("customer", "supplier", "part", "nation", "region").foreach { n =>
      spark.read.parquet(s"$sfDir/$n.parquet")
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val nLine = spark.read.parquet(s"$dir/lineitem.parquet").count()

    // graph family included: the co-occurrence graph (orders × parts)
    // grows copies× in EDGES (each replica re-pairs against unchanged
    // part keys), so this also probes the LPA/PageRank iteration shape
    val queries = Seq("q_tpch_q1", "q_tpch_q3", "q_tpch_q5", "q_tpch_q8",
      "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q17", "q_tpch_q18",
      "q_tpch_q19", "q_tpch_q21", "q_tpch_q22", "q_tpch_q4",
      "q_pagerank", "q_label_prop", "q_triangles")
    queries.foreach { name =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TPCH_PROBE $name lineitem=$nLine rows=$rows wall=$sec%.1fs" +
        f" line_rows_per_s=${nLine / sec}%.0f")
    }
    spark.stop()
  }
}
