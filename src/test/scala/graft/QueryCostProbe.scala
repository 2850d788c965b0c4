package graft

import org.apache.spark.sql.SparkSession

/** Per-JOB wall attribution for one declared query, under the exact
  * Bench session config (same shuffle partitions, object-hash fallback
  * threshold, FAIR-off single pool): runs the query `reps` times and on
  * the LAST rep prints every Spark job's wall, task count, and call
  * site — the instrument that says where a multi-commit lifecycle
  * query's seconds actually go (scheduling round-trips vs data).
  *
  * Usage: Test/runMain graft.QueryCostProbe <queryName> [sfDir] [reps]
  */
object QueryCostProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dedup_index")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .appName("query-cost-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", false)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var record = false
    val rows = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Long, String)]())
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val tasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (record) {
            val site = j.stageInfos.map(_.name).distinct.mkString(" | ")
            starts.put(j.jobId, (System.nanoTime(), site))
            tasks.put(j.jobId, new java.util.concurrent.atomic.AtomicInteger)
            j.stageInfos.foreach(si => stageJob.put(si.stageId, j.jobId))
          }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          Option(stageJob.get(t.stageId))
            .flatMap(id => Option(tasks.get(id)))
            .foreach(_.incrementAndGet())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(starts.remove(e.jobId)).foreach { case (t0, site) =>
            rows.add((e.jobId, System.nanoTime() - t0, site)) }
      })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      if (rep == reps) record = true
      SparkEntry.resetFixtureClock()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rep $rep rows=$n wall=$w%.2f s " +
        f"fixture=${SparkEntry.fixtureSeconds}%.2f s")
    }
    record = false
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(_._1)
    println(f"[probe] last rep: ${all.size} jobs, " +
      f"summed job wall ${all.map(_._2).sum / 1e9}%.2f s")
    all.foreach { case (id, ns, site) =>
      val nt = Option(tasks.get(id)).map(_.get).getOrElse(0)
      println(f"[probe]   job $id%3d ${ns / 1e9}%6.3f s  $nt%4d tasks  " +
        site.take(110))
    }
    spark.stop()
  }
}
