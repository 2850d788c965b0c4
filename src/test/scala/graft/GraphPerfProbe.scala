package graft

import org.apache.spark.sql.SparkSession

/** Perf probe for the graph family (VERDICT r3 #4): separates the shared
  * co-occurrence edge-build cost from the per-iteration loop cost of
  * PageRank / label propagation / triangles, so optimization effort lands
  * on the stage that actually dominates. Run with
  *   sbt 'Test/runMain graft.GraphPerfProbe [sfDir]'
  * Not a ScalaTest: timing asserts are flaky; this prints, a human judges.
  */
object GraphPerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n1 = f
      val w = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f; f
      val s = (System.nanoTime() - t1) / 2e9
      println(f"GRAPH_PROBE $name%-22s rows=$n1%8d warm1=$w%6.2fs steady=$s%6.2fs")
    }

    time("edge_build") {
      graft.ops.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey").count()
    }
    val edges = graft.ops.Graph
      .coOccurrenceEdges(li, "l_orderkey", "l_partkey").localCheckpoint()
    edges.count()
    time("pagerank_on_edges") {
      graft.ops.Graph.pageRankFixedPoint(edges, iters = 3).count()
    }
    time("lpa_on_edges") {
      graft.ops.Graph.labelPropagation(edges, iters = 3).count()
    }
    time("triangles_on_edges") {
      graft.ops.Graph.triangleStats(edges).count()
    }
    spark.stop()
  }
}
