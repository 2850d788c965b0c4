package graft
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Queries run a few
  * in flight (independent jobs, distinct output dirs) to cut the gate's
  * wall time; failures stay per-query and never abort the dump. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
      // write timestamps as standard INT64 micros, not legacy INT96:
      // INT96 footers carry no usable statistics, so the versioned
      // tables\' footer-based stats collection (zero-job commits) would
      // fall back to read-back scans for timestamp stat columns
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    if (orphanOracles.nonEmpty)
      System.err.println(
        s"[verify] WARNING: oracleSql keys without queries: $orphanOracles")

    val pool = Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_PAR", "4").toInt)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    // Dev control (same as Bench): SPARK_GRAFT_ONLY=q_a,q_b restricts the
    // dump to a subset while iterating; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // the RESULT dumps keep legacy INT96 timestamps: the driver's DuckDB
    // compare reads INT96 as a naive TIMESTAMP (matching oracle output),
    // while INT64-micros parquet reads back as TIMESTAMPTZ and every
    // timestamp-bearing query would string-mismatch on the "+00:00"
    // rendering. The SESSION stays on TIMESTAMP_MICROS (footer-based
    // stats for the engine's own versioned writes); only this dump
    // writer re-binds onto an INT96 clone.
    val dumpSession = org.apache.spark.sql.graftbridge.SessionBridge
      .cloneWithConf(spark,
        Map("spark.sql.parquet.outputTimestampType" -> "INT96"))
    val futures = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq.map { case (name, fn) =>
      Future {
        try org.apache.spark.sql.graftbridge.SessionBridge
          .rebind(dumpSession, fn(spark, sfDir)).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    futures.foreach(f => Await.result(f, Duration.Inf))
    pool.shutdown()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
