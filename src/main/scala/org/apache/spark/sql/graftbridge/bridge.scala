package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column <-> Expression converters so
  * graft's native Catalyst expressions can be exposed as Columns. Lives in
  * the org.apache.spark.sql namespace purely for access; no Spark code is
  * modified or shadowed. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Same access trick for logical plans: build a DataFrame from a custom
  * LogicalPlan node (Dataset.ofRows is private[sql]) and read a frame's
  * analyzed plan. */
object PlanBridge {
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}

/** Bridge into Spark's file-source execution internals so a DSv2
  * [[org.apache.spark.sql.connector.read.streaming.MicroBatchStream]]
  * (graft-cdc) can serve staged parquet through Spark's OWN partition
  * planning and vectorized parquet reader instead of hand-rolled row
  * readers — the pieces ([[org.apache.spark.sql.execution.datasources
  * .FilePartition]], [[org.apache.spark.sql.execution.datasources.v2
  * .parquet.ParquetPartitionReaderFactory]]) are private[sql]. */
object FileStreamBridge {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.connector.read.{InputPartition,
    PartitionReaderFactory}
  import org.apache.spark.sql.execution.datasources.{FilePartition,
    PartitionedFile}
  import org.apache.spark.sql.types.StructType

  /** Pack `(path, length, modificationTime)` parquet files into Spark's
    * standard bin-packed [[FilePartition]]s (openCostInBytes /
    * maxPartitionBytes rules — small staged files coalesce, large ones
    * parallelize across the cluster). */
  def parquetPartitions(spark: SparkSession,
                        files: Seq[(String, Long, Long)])
      : Array[InputPartition] = {
    val pfiles = files.map { case (path, len, mtime) =>
      PartitionedFile(
        org.apache.spark.sql.catalyst.InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPathString(path),
        0L, len, Array.empty, mtime, len)
    }
    FilePartition.getFilePartitions(spark, pfiles,
        FilePartition.maxSplitBytes(spark, files.map(_._2).sum))
      .toArray
  }

  /** Spark's own vectorized/columnar parquet reader factory over a flat
    * schema (no partition columns, no pushed filters) — the executor
    * side of serving staged micro-batch parquet. */
  def parquetReaderFactory(spark: SparkSession, schema: StructType)
      : PartitionReaderFactory = {
    import org.apache.spark.sql.execution.datasources.parquet.{
      ParquetOptions, ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.execution.datasources.v2.parquet
      .ParquetPartitionReaderFactory
    import org.apache.spark.sql.internal.SQLConf
    val sqlConf = spark.sessionState.conf
    // the same executor-side conf ParquetScan.createReaderFactory
    // prepares — without it the row-based reader has no ReadSupport
    // class and every file read NPEs
    val hadoopConf = spark.sessionState.newHadoopConf()
    hadoopConf.set(
      org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    hadoopConf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA,
      schema.json)
    hadoopConf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, schema.json)
    hadoopConf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key,
      sqlConf.sessionLocalTimeZone)
    hadoopConf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sqlConf.nestedSchemaPruningEnabled)
    hadoopConf.setBoolean(SQLConf.CASE_SENSITIVE.key,
      sqlConf.caseSensitiveAnalysis)
    ParquetWriteSupport.setSchema(schema, hadoopConf)
    hadoopConf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlConf.isParquetBinaryAsString)
    hadoopConf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlConf.isParquetINT96AsTimestamp)
    hadoopConf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.legacyParquetNanosAsLong)
    hadoopConf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      sqlConf.parquetFieldIdReadEnabled)
    hadoopConf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.parquetInferTimestampNTZEnabled)
    ParquetPartitionReaderFactory(
      sqlConf,
      spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(hadoopConf)),
      schema, schema, new StructType(), Array.empty, None,
      new ParquetOptions(Map.empty[String, String], sqlConf))
  }
}
