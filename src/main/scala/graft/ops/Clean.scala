package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Projections, filters, casts, scalar cleaning (SURVEY §2.2 P1-P7 and §2.9
 * F1-F6, F10-F13). All pure Column-expression compositions: everything stays
 * inside whole-stage codegen and pushes down to the parquet scan where
 * Catalyst can prove it.
 */
object Clean {

  /** F2 + P3: parse a percent-ish string column ("1.23%") to double.
    * Null-tolerant: the reference's change_percent is pervasively null
    * because of the producer/schema field-name skew (SURVEY §8.1). */
  def parsePercent(c: Column): Column =
    regexp_replace(c, "%", "").cast(DoubleType)

  /** Reference tick cleaning (spark_stream_processor.py:138-144):
    * ISO string -> timestamp, percent strip, volume to long. */
  def castTicks(df: DataFrame): DataFrame =
    df.withColumn("timestamp", to_timestamp(col("timestamp")))
      .withColumn("price", col("price").cast(DoubleType))
      .withColumn("change", col("change").cast(DoubleType))
      .withColumn("change_percent", parsePercent(col("change_percent")))
      .withColumn("volume", col("volume").cast(LongType))

  /** P4: conjunctive NOT NULL filter over required columns.
    * Reference: airflow analytics processor:111-113. */
  def filterNotNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))

  /** P5: data-quality counters — rows failing a range predicate.
    * Reference (declared QA): README.md:686-693. */
  def qualityCounts(df: DataFrame, nonPositive: Column, future: Column): DataFrame =
    df.agg(
      count(when(nonPositive, 1)).as("n_nonpositive"),
      count(when(future, 1)).as("n_future"),
      count(lit(1)).as("n_total"))

  /** P6: subset to a fixed warehouse column list, in order.
    * Reference: load_to_snowflake.py:157-167. */
  def subset(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** Fail-fast schema-presence validation: the loaders' dynamic
    * column-presence checks (reference: load_stream_to_snowflake.py:184-213,
    * README.md:676-694). Returns the frame unchanged when every required
    * column exists (case-insensitive, matching Spark's default resolution);
    * throws naming each missing column otherwise — at 100 TB you want the
    * schema break at submit time, not three shuffle stages in. */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val have = df.columns.map(_.toLowerCase).toSet
    val missing = required.filterNot(c => have.contains(c.toLowerCase))
    require(missing.isEmpty,
      s"missing required column(s): ${missing.mkString(", ")}; " +
        s"present: ${df.columns.mkString(", ")}")
    df
  }

  /** F11: null imputation — 0 for numerics, "unknown" for strings.
    * Reference: load_stream_to_snowflake.py:207-212. */
  def impute(df: DataFrame, numeric: Seq[String], strings: Seq[String]): DataFrame =
    df.na.fill(0, numeric).na.fill("unknown", strings)

  /** Spark's sample stddev returns NaN for single-row groups where ANSI SQL
    * (and the DuckDB oracle) return NULL; normalize so downstream consumers
    * and the oracle agree. */
  def nanToNull(c: Column): Column =
    when(isnan(c), lit(null).cast(DoubleType)).otherwise(c)

  /** Explode a JSON-object string column into (key, value) rows — the
    * dynamic-properties pattern (event props, feature bags) where keys are
    * data, not schema. from_json to MAP keeps the parse single-pass and
    * codegen-adjacent; the explode is narrow (fan-out = object size), and
    * rows whose JSON fails to parse are dropped (from_json yields null map,
    * explode emits nothing) — pair with readJsonlAudited upstream when
    * malformed rows must be quarantined instead. */
  def explodeJsonMap(df: DataFrame, json: String, valueType: String,
                     keyOut: String = "prop_key",
                     valOut: String = "prop_val"): DataFrame =
    df.select(df.columns.map(col).toSeq :+
      explode(from_json(col(json), org.apache.spark.sql.types.DataType
        .fromDDL(s"map<string, $valueType>")
        .asInstanceOf[org.apache.spark.sql.types.MapType]))
        .as(Seq(keyOut, valOut)): _*)
      .drop(json)
}
