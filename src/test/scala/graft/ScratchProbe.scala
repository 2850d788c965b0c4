package graft

import org.apache.spark.sql.SparkSession

/** Scratch: end-to-end timing for q_multimodal_dedup via SparkEntry. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("scratch").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val out = SparkEntry.queries("q_multimodal_dedup")(spark, dir)
      val n = out.count()
      println(f"REP $rep rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
