package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected queries so scan
  * pushdown (PushedFilters/ReadSchema), broadcast vs shuffle joins, and
  * WholeStageCodegen spans can be reviewed. Usage:
  *   runMain graft.PlanDump <sfDir> [queryName ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else
      Seq("q_tpch_q1", "q_join_multiway", "q_agg_ohlc_window", "q_topk",
        "q_project_subset")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
