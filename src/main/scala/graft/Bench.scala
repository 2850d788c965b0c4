package graft

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // TypedImperativeAggregate (minhash/simhash sketches) runs in
      // ObjectHashAggregate, which falls back to sort-based aggregation
      // after 128 in-memory groups by default -- far too conservative for
      // 512-byte sketch buffers.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      // the events table carries int64-nanos timestamps; set at session
      // build so no query constructor mutates global conf mid-run
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // queries run PAR-at-a-time as independent jobs; FIFO would let one
      // whale stage starve every query queued behind it, inflating their
      // wall times. FAIR + one pool per query round-robins the 32 slots.
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev controls: SPARK_GRAFT_ONLY=q_a,q_b restricts the run;
    // SPARK_GRAFT_REPS=n repeats each query (min time reported);
    // SPARK_GRAFT_PAR=n sets in-flight query concurrency.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val par = sys.env.getOrElse("SPARK_GRAFT_PAR", "4").toInt
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    // Untimed warmup: exercise the scan/codegen/shuffle machinery once so
    // per-query times measure the engine, not first-touch JIT.
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }

    // Queries are independent jobs; running a few in flight keeps the 32
    // scheduler slots busy through each query's single-threaded
    // planning/codegen phase (the cold-run bottleneck). Per-query values
    // are each query's own wall time; "value" is the wall clock of the
    // whole run, not the sum.
    val pool = Executors.newFixedThreadPool(par)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val t0 = System.nanoTime()
    val futures = selected.toSeq.map { case (name, fn) =>
      Future {
        // own FAIR pool per query (local property sticks to this worker
        // thread for the duration of the query's jobs)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        // A failing query must be distinguishable from a fast one: record
        // the first failure message and surface it in an "errors" map
        // instead of letting a crash report a tiny wall time.
        var failure: Option[String] = None
        val times = (1 to reps).map { _ =>
          val s = System.nanoTime()
          try { fn(spark, sfDir).count() } catch {
            case t: Throwable if failure.isEmpty =>
              failure = Some(Option(t.getMessage).getOrElse(t.getClass.getName)
                .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
            case _: Throwable => ()
          }
          (System.nanoTime() - s) / 1e9
        }
        (name, times.min, failure)
      }
    }
    val results = futures.map(f => Await.result(f, Duration.Inf))
    val total = (System.nanoTime() - t0) / 1e9
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":\"" + e + "\"" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    pool.shutdown()
    spark.stop()
  }
}
