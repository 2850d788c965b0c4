package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** Per-commit wall attribution for the versioned lake (round 11): the
  * lifecycle bench queries are commit-count-priced, so the fixed cost
  * of ONE small upsert commit is the unit that prices ~52s of the
  * sf0.1 steady. Times a chain of small upserts against one table.
  *
  * Usage: Test/runMain graft.CommitCostProbe [sfDir] [commits]
  */
object CommitCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("commit-cost-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // count Spark jobs + stages per commit: the fixed overhead is
    // ~(jobs x scheduling) + driver-side manifest I/O
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val jobStartAt = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val sites = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
          jobStartAt.put(j.jobId, System.nanoTime())
          sites.add(j.stageInfos.map(_.name).mkString(" | "))
          if (sys.env.contains("PROBE_DETAILS"))
            j.stageInfos.foreach { si =>
              val lines = si.details.split("\n")
              val graftLines = lines.filter(l =>
                l.contains("graft") || l.contains("Merge") ||
                  l.contains("VersionedTable"))
              val shown =
                if (graftLines.nonEmpty) graftLines.take(3)
                else lines.take(6)
              sites.add(s"    stage ${si.stageId} [${si.name}]: " +
                shown.mkString(" <= "))
            }
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks.incrementAndGet()
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(jobStartAt.remove(e.jobId)).foreach(t0 =>
            jobNanos.addAndGet(System.nanoTime() - t0))
      })
    if (sys.env.contains("PROBE_PLAN"))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            if (funcName == "save" || funcName == "command")
              println(s"[plan] funcName=$funcName\n" +
                qe.executedPlan.treeString.linesIterator
                  .map("[plan] " + _).mkString("\n"))
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    def resetCounts(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); jobNanos.set(0) }
    def counts(): String =
      f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
        f"jobWall=${jobNanos.get / 1e9}%.2f s"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val root = "/tmp/graft_commit_cost/t"
    val fs = VersionedTable.fsFor(spark, root)
    fs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_commit_cost"), true)
    // v0: the corpus; then n small upserts (1/50th each), the lifecycle
    // fixture shape
    var t0 = System.nanoTime()
    VersionedTable.upsert(spark, root, docs, Seq("doc_id", "lang"),
      Seq("lang"))
    println(f"[probe] v0 full upsert ${(System.nanoTime() - t0) / 1e9}%.2f s")
    (1 to n).foreach { i =>
      val batch = docs.filter(col("doc_id") % 50 === i)
      resetCounts()
      t0 = System.nanoTime()
      VersionedTable.upsert(spark, root, batch, Seq("doc_id", "lang"),
        Seq("lang"))
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener drain
      println(f"[probe] v$i small upsert $w%.2f s  ${counts()}")
      if (i == n) {
        import scala.jdk.CollectionConverters._
        sites.asScala.foreach(s => println(s"[probe]   job: $s"))
      }
      sites.clear()
    }
    spark.stop()
  }
}
