package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import java.net.URI
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * MERGE upsert as a composition (SURVEY §2.4 J4): matched rows take the
 * update, unmatched target rows survive — expressed as
 * target ANTI-JOIN updates  UNION ALL  updates.
 *
 * The reference does this in the warehouse (Snowflake MERGE,
 * load_to_snowflake.py:212-231); with plain parquet tables the equivalent is
 * this composition plus an atomic directory swap. No Delta/Iceberg assumed.
 *
 * Scale note: the anti-join shuffles on the merge key. When the update batch
 * is small relative to the target (the normal case: daily increment vs years
 * of history) Catalyst/AQE broadcasts the update side, so the target is
 * never shuffled — only scanned and rewritten. Partition the target by a key
 * prefix (e.g. date) and the rewrite touches only affected partitions.
 */
object Merge {

  /** Pure-dataframe MERGE: keys identify a row; update rows win. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val survivors = target.join(updates.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    updates.unionByName(survivors)
  }

  /** Ordered CDC apply: `changes` carries an op column (I/U = upsert,
    * D = tombstone) and an ordering column; the LAST change per key wins
    * (keep-last over `order`, which must totally order changes within a
    * key — a log sequence number in a real CDC feed). Keys whose final op
    * is D disappear; I/U keys take the change row; untouched target rows
    * survive. Rows with a NULL or unrecognized op are DROPPED BEFORE the
    * keep-last (they neither upsert nor delete — without the guard a NULL
    * op would fail the =!= "D" filter yet still anti-join its key away, a
    * silent delete from a malformed feed). One shuffle for keep-last, one
    * anti-join on the touched key set — cost scales with
    * |changes| + |target|, never |changes|·|target|. */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
               order: Seq[String], opCol: String = "op"): DataFrame = {
    val wellFormed = changes.filter(col(opCol).isin("I", "U", "D"))
    val last = WindowAnalytics.keepLast(wellFormed, keys, order)
    val upserts = last.filter(col(opCol) =!= "D")
      .drop((opCol +: order.filterNot(target.columns.contains)): _*)
    val survivors = target.join(last.select(keys.map(col): _*), keys,
      "left_anti")
    upserts.unionByName(survivors)
  }

  /** Snapshot diff between two corpus versions: which keys were added,
    * removed, or changed (null-safe comparison over `compareCols`) — the
    * dataset-versioning primitive behind incremental re-training ("what
    * moved since the last corpus cut?"). Unchanged rows are dropped before
    * anything else happens, so downstream work scales with the CHANGE
    * volume, not the corpus. One shuffle (the full outer join on the key);
    * at 100 TB partition both snapshots by the same key layout (bucketed
    * writes) and the join is exchange-free. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String],
                   changeCol: String = "change"): DataFrame = {
    import org.apache.spark.sql.functions._
    // presence markers, not key nullness: a legitimately-null key would
    // otherwise read as "absent" and a removed null-keyed row would be
    // labeled added
    val o = oldDf.select(keys.map(c => col(c).as(s"__old_$c")) ++
      compareCols.map(c => col(c).as(s"__old_$c")) :+
      lit(true).as("__old_present"): _*)
    val n = newDf.select((keys ++ compareCols).map(col) :+
      lit(true).as("__new_present"): _*)
    val joinCond = keys.map(k => col(k) <=> col(s"__old_$k")).reduce(_ && _)
    val sameContent = compareCols.map(c => col(c) <=> col(s"__old_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val oldKeyPresent = col("__old_present").isNotNull
    val newKeyPresent = col("__new_present").isNotNull
    n.join(o, joinCond, "full_outer")
      .withColumn(changeCol,
        when(!oldKeyPresent, lit("added"))
          .when(!newKeyPresent, lit("removed"))
          .when(!sameContent, lit("changed")))
      .filter(col(changeCol).isNotNull)
      .select(keys.map(k => coalesce(col(k), col(s"__old_$k")).as(k)) :+
        col(changeCol): _*)
  }

  /** SCD2 history build: turn a change log (key, ts, attributes...) into
    * slowly-changing-dimension rows with validity intervals —
    * effective_from = the change's own timestamp, effective_to = the next
    * change's timestamp for the key (NULL = current row, is_current flag).
    * One window pass per key (single shuffle on the key); `orderCols`
    * must total-order changes within a key (add a sequence column when
    * timestamps can tie, or the interval endpoints are nondeterministic).
    */
  def scd2(changes: DataFrame, keys: Seq[String], ts: String,
           tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((ts +: tieBreak).map(col): _*)
    changes
      .withColumn("effective_from", col(ts))
      .withColumn("effective_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Canonical Hive directory names for a set of partition values, computed
    * by the same code path that writes them: a one-row-per-value scratch
    * write partitioned by `partCol`, then a directory listing. This
    * sidesteps re-implementing Spark's partition-path escaping/formatting
    * (dates, timestamps, %-escaped specials) — whatever the real write
    * would name the directory, this names it identically. Cost: one tiny
    * single-task job over |touched partitions| rows, noise next to the
    * merge itself. */
  private[ops] def partitionDirNames(spark: SparkSession, values: DataFrame,
                                     partCol: String,
                                     scratch: String): Seq[String] = {
    val fs = FileSystem.get(URI.create(scratch),
      spark.sparkContext.hadoopConfiguration)
    values.select(col(partCol)).distinct()
      .withColumn("__one", org.apache.spark.sql.functions.lit(1))
      .coalesce(1)
      .write.mode("overwrite").partitionBy(partCol).parquet(scratch)
    val names = fs.listStatus(new Path(scratch)).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(partCol + "="))
    fs.delete(new Path(scratch), true)
    names
  }

  /** Partition-pruned MERGE into a Hive-partitioned parquet table
    * (directories `partCol=value`): only partitions whose value appears in
    * the update set are READ, and only those are REWRITTEN — the daily
    * increment against years of history touches O(|delta partitions|) I/O,
    * not O(|table|) (the reference's warehouse MERGE on (symbol, date),
    * load_to_snowflake.py:212-231, has the same property via micro-
    * partition pruning).
    *
    * Read side: touched directories are resolved BY NAME
    * ([[partitionDirNames]]) and scanned with `basePath`, so pruning is
    * exact regardless of partition-type inference; the scanned partition
    * column is then cast to the update side's type before merging.
    * Write side: Spark's dynamic partition overwrite publishes only the
    * partitions present in the merged delta — untouched directories are
    * never listed, read, or renamed (their files keep byte- and
    * mtime-identity; asserted in OpsSpec). The merged delta is staged to a
    * side path first because Spark refuses to overwrite a path it is
    * reading from.
    *
    * Crash story: per-partition old-or-new via the committer's staging
    * renames — a crash mid-publish can leave a PREFIX of touched
    * partitions updated (each individually consistent). For table-level
    * all-or-nothing on rename-less object stores, use [[VersionedTable]].
    * `partCol` must be one of `keys` and non-null in `updates`. */
  def upsertParquetPruned(spark: SparkSession, tablePath: String,
                          updates: DataFrame, keys: Seq[String],
                          partCol: String): Unit = {
    require(keys.contains(partCol),
      s"partition column $partCol must be part of the merge key")
    val fs = FileSystem.get(URI.create(tablePath),
      spark.sparkContext.hadoopConfiguration)
    val target = new Path(tablePath)
    if (!fs.exists(target)) {
      updates.write.partitionBy(partCol).parquet(tablePath)
      return
    }
    val touched = partitionDirNames(spark, updates, partCol,
      tablePath + ".__merge_names").toSet
    val livePaths = fs.listStatus(target).toSeq.map(_.getPath)
      .filter(p => touched.contains(p.getName))
    val merged =
      if (livePaths.isEmpty) updates // all update partitions are new
      else {
        val pType = updates.schema(partCol).dataType
        val pruned = spark.read.option("basePath", tablePath)
          .parquet(livePaths.map(_.toString): _*)
          .withColumn(partCol, col(partCol).cast(pType))
        upsert(pruned, updates, keys)
      }
    val stage = tablePath + ".__merge_stage"
    merged.write.mode("overwrite").parquet(stage)
    // repartition on the partition column: one writer task per touched
    // partition, so each directory gets one file per merge instead of
    // (parallelism × partitions) tiny files — small-files hygiene that
    // matters as much at 100 TB as it does here
    spark.read.parquet(stage)
      .repartition(col(partCol))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(tablePath)
    fs.delete(new Path(stage), true)
  }

  /** MERGE into a parquet table path with a rename swap: write the merged
    * result next to the table, back the old table up, rename the new one
    * in. The swap is two renames, so a crash between them can leave the
    * table path briefly absent — recovered on the next call by restoring
    * the backup before merging (readers therefore see old, new, or a
    * retryable not-found; never a partial table). On object stores where
    * rename is copy-based (S3A), use [[VersionedTable]] instead (rename-
    * free manifest commit). Rewrites the whole table — prefer
    * [[upsertParquetPruned]] for partitioned targets.
    */
  def upsertParquet(spark: SparkSession, tablePath: String, updates: DataFrame,
                    keys: Seq[String]): Unit = {
    val fs = FileSystem.get(URI.create(tablePath), spark.sparkContext.hadoopConfiguration)
    val target = new Path(tablePath)
    val tmp = new Path(tablePath + ".__merge_tmp")
    val oldBak = new Path(tablePath + ".__merge_old")
    // Hadoop rename reports most failures by RETURNING FALSE, not throwing;
    // continuing past a failed rename here could delete the only remaining
    // copy of the table, so every rename is checked.
    def renameOrFail(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"rename $from -> $to failed")
    // crash recovery: a previous attempt may have renamed the table away
    // without completing the swap -- restore the backup first
    if (!fs.exists(target) && fs.exists(oldBak)) renameOrFail(oldBak, target)
    val merged =
      if (fs.exists(target)) upsert(spark.read.parquet(tablePath), updates, keys)
      else updates
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(oldBak)) fs.delete(oldBak, true)
    if (fs.exists(target)) renameOrFail(target, oldBak)
    renameOrFail(tmp, target)
    // only now is the backup redundant
    fs.delete(oldBak, true)
  }
}
