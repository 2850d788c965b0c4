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

  /** MERGE into a parquet table path with a rename swap: write the merged
    * result next to the table, back the old table up, rename the new one
    * in. The swap is two renames, so a crash between them can leave the
    * table path briefly absent — recovered on the next call by restoring
    * the backup before merging (readers therefore see old, new, or a
    * retryable not-found; never a partial table). On object stores where
    * rename is copy-based (S3A), front this with a metadata layer instead.
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
