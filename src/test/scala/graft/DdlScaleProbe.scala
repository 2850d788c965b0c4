package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** Scale evidence for the round-7 engine legs: a partitioned versioned
  * table at P and 8·P partitions (constant rows per partition, so the
  * table grows 8×), timing
  *
  *   1. the clause-matrix MERGE with a source touching 3 FIXED
  *      partitions (claim: O(|touched dirs|) — wall flat as the table
  *      grows),
  *   2. ALTER COLUMN TYPE widening (claim: metadata-only — no data
  *      rewrite; the index re-block is O(files) metadata I/O),
  *   3. INSERT OVERWRITE with a constant-size frame (claim: the write
  *      prices the NEW content, dropping the old mapping is free),
  *   4. TRUNCATE (claim: one empty-mapping metadata commit, flat).
  *
  * Print-and-judge probe (results recorded in BASELINE.md).
  *
  * Usage: Test/runMain graft.DdlScaleProbe [rowsPerPart] [parts]
  */
object DdlScaleProbe {
  def main(args: Array[String]): Unit = {
    val rowsPerPart = args.headOption.map(_.toInt).getOrElse(3000)
    val baseParts = args.lift(1).map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder()
      .appName("ddl-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-34s $s%.3f s"); s
    }
    def cycle(tag: String, parts: Int): Unit = {
      val root = s"/tmp/graft_ddl_probe/$tag/table"
      val p = new org.apache.hadoop.fs.Path(s"/tmp/graft_ddl_probe/$tag")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      val n = parts.toLong * rowsPerPart
      val df = spark.range(n).select(
        col("id").cast("int").as("id"),
        concat(lit("p"), (col("id") % parts)).as("part"),
        pmod(xxhash64(col("id")), lit(1000)).cast("int").as("v"))
      VersionedTable.upsert(spark, root, df, Seq("id", "part"),
        Seq("part"), statsCols = Seq("v"), fileRows = Some(4096))
      println(s"[probe] --- $tag: $parts partitions, $n rows ---")
      // clause-matrix MERGE touching 3 FIXED partitions
      df.filter(col("part").isin("p0", "p1", "p2"))
        .filter(col("id") % 7 === 0)
        .withColumn("v", col("v") + 1)
        .createOrReplaceTempView(s"ddl_src_$tag")
      t("merge matrix (3 touched dirs)") {
        spark.sql(
          s"""MERGE INTO graft.`$root` t USING ddl_src_$tag s
             |ON t.id = s.id AND t.part = s.part
             |WHEN MATCHED AND s.v % 2 = 0 THEN DELETE
             |WHEN MATCHED THEN UPDATE SET v = s.v
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      }
      t("widen v -> bigint (metadata)") {
        spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN v TYPE BIGINT")
          .collect()
      }
      // constant-size overwrite: 3 partitions' worth of fresh rows
      spark.range(3L * rowsPerPart).select(
        col("id").cast("int").as("id"),
        concat(lit("q"), (col("id") % 3)).as("part"),
        col("id").cast("long").as("v"))
        .createOrReplaceTempView(s"ddl_ow_$tag")
      t("insert overwrite (constant frame)") {
        spark.sql(s"INSERT OVERWRITE graft.`$root` " +
          s"SELECT * FROM ddl_ow_$tag").collect()
      }
      // rebuild content so truncate prices a FULL table's metadata
      VersionedTable.upsert(spark, root,
        df.withColumn("v", col("v").cast("long")),
        Seq("id", "part"), Seq("part"))
      t("truncate (metadata)") {
        spark.sql(s"TRUNCATE TABLE graft.`$root`").collect()
      }
    }
    cycle("warm", baseParts) // JIT/codegen warmup, untimed in spirit
    cycle("x1", baseParts)
    cycle("x8", baseParts * 8)
    spark.stop()
  }
}
