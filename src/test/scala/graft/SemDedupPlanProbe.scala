package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for the round-12 SemDedup collapse cuts (commit 694a0c1).
  *
  * The declared q_semantic_dedup / q_multimodal_dedup plans cannot show
  * the collapse window: the removal list flows through
  * FuzzyDedup.connectedComponents' driver union-find fast path, so the
  * final plan is an anti-join against a LocalTableScan, and the windowed
  * frame itself is materialized via localCheckpoint (plan hygiene — its
  * three consumers span separate query executions). This probe rebuilds
  * the collapse frame EXACTLY as SemDedup.semanticDedup does (same
  * expressions, same order) and prints explain("formatted") for the OLD
  * (r11) and NEW (r12) spellings side by side, so the two plan claims are
  * checkable offline:
  *
  *   1. window key (xxhash64(vec), vec) instead of the bare float array —
  *      the bare key goes through NormalizeFloatingNumbers' interpreted
  *      transform() on every sort comparison;
  *   2. norm² filter via the codegen'd DotProduct node instead of the
  *      aggregate() HOF (CodegenFallback — breaks the WholeStageCodegen
  *      span around the filter).
  *
  * Usage: Test/runMain graft.SemDedupPlanProbe [sfDir]
  */
object SemDedupPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("semdedup-plan-probe").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

    println("========== collapse frame, r11 spelling (bare-array window " +
      "key + aggregate() HOF norm2) ==========")
    val norm2Old =
      expr("aggregate(vec, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    val wOld = org.apache.spark.sql.expressions.Window.partitionBy(col("vec"))
    df.filter(col("vec").isNotNull)
      .filter(norm2Old > lit(0d) && !isnan(norm2Old))
      .withColumn("__rep", min(col("id")).over(wOld))
      .explain("formatted")

    println("========== collapse frame, r12 spelling ((xxhash64(vec), vec) " +
      "window key + DotProduct norm2) ==========")
    val norm2New = graft.functions.VectorFunctions.vecDot(col("vec"), col("vec"))
    val wNew = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col("vec")), col("vec"))
    df.filter(col("vec").isNotNull)
      .filter(norm2New > lit(0d) && !isnan(norm2New))
      .withColumn("__rep", min(col("id")).over(wNew))
      .explain("formatted")

    spark.stop()
  }
}
