package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, Test/fork=true). */
object SparkSpec {
  // A wedged claim (crashed writer, never publishes) makes upsert wait for
  // the winner's commit marker before rethrowing; tests exercise that path
  // deliberately and must not stall 30 s per occurrence.
  sys.props("graft.versioned.claimWaitMs") = "500"

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // standard INT64-micros timestamps (INT96 footers carry no usable
      // stats — the versioned tables' footer-based stats collection
      // would fall back to read-back scans); same conf as Bench/Verify
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}
