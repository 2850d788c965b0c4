package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Scratch profiler for q_multimodal_dedup's stages (round 11). */
object MmDedupProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("mmdedup-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val assets = Multimodal.asAssets(docs, "doc_id", "text", "source", "text")
    t("assets.count")(println(assets.count()))
    t("feats16.count")(println(
      Multimodal.extractFeatures(assets, dim = 16).count()))
    t("feats256.count")(println(
      Multimodal.extractFeatures(assets, dim = 256).count()))
    t("feats256+center.count")(println(
      Multimodal.extractFeatures(assets, dim = 256)
        .withColumn("__tot",
          expr("aggregate(features, 0D, (a, y) -> a + CAST(y AS DOUBLE))"))
        .withColumn("centered",
          expr("transform(features, x -> CAST(x AS DOUBLE) - __tot / 256.0D)"))
        .count()))
    val feats = t("featurize+checkpoint") {
      Multimodal.perceptualFeatures(assets, dim = 256)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    }
    t("count")(println(feats.count()))
    Seq(1, 8).foreach { g =>
      val pairs = t(s"cellPairs grid=$g") {
        graft.sim.SemDedup.cellNearDupPairs(feats, "asset_id", "centered",
          minCosine = 0.995, signBits = 16, signOffset = 97, grid = g)
          .localCheckpoint()
      }
      t(s"pairCount grid=$g")(println(pairs.count()))
    }
    // semanticDedup internals, staged
    val norm2 = "aggregate(centered, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    val collapsible = t("collapsible.count") {
      val c = feats.filter(col("centered").isNotNull)
        .filter(expr(norm2) > lit(0d) && !isnan(expr(norm2)))
      println(c.count()); c
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("centered"))
    val withRep = collapsible.withColumn("__rep", min(col("asset_id")).over(w))
    t("withRep.count")(println(withRep.count()))
    val reps = t("reps.checkpoint") {
      withRep.filter(col("asset_id") === col("__rep")).drop("__rep")
        .localCheckpoint()
    }
    Seq(1, 8).foreach { g =>
      t(s"pairs-on-reps grid=$g") {
        println(graft.sim.SemDedup.cellNearDupPairs(reps, "asset_id",
          "centered", 0.995, 16, 97, g).count())
      }
    }
    Seq(1, 8).foreach { g =>
      val out = t(s"semanticDedup e2e grid=$g") {
        graft.sim.SemDedup.semanticDedup(feats, "asset_id", "centered",
          minCosine = 0.995, signBits = 16, signOffset = 97, grid = g)
          .select("asset_id")
      }
      t(s"collect grid=$g")(println(out.count()))
    }
    spark.stop()
  }
}
