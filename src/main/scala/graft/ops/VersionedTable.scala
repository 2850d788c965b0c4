package graft.ops

import java.net.URI
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * A minimal versioned parquet table: partition-pruned MERGE with a
 * RENAME-FREE, table-level-atomic commit — the metadata-layer answer to the
 * reference's warehouse MERGE (Snowflake MERGE on (symbol, date),
 * load_to_snowflake.py:212-231) for object stores where directory rename is
 * copy-based and non-atomic (S3A). The same idea Delta/Iceberg implement at
 * production depth, cut down to the piece the engine needs: immutable data
 * generations + a manifest + a commit marker.
 *
 * Layout under `root`:
 * {{{
 *   gen<N>/<partCol>=<value>/part-*.parquet   immutable data, never renamed
 *   _manifest.<N>                             lines "<partDirName>\tgen<M>"
 *   _commit.<N>                               empty marker; its existence
 *                                             IS the commit of version N
 * }}}
 *
 * Every write creates fresh objects (data files, manifest, marker) — nothing
 * is ever renamed or overwritten, so each step is a plain object PUT, atomic
 * on S3 and every HDFS-like store. Readers resolve `max N with _commit.<N>
 * present` and go through manifest N; a crash at ANY point of an unpublished
 * upsert leaves only orphan objects (unreferenced gen dirs / a manifest with
 * no marker) that readers never look at — old version stays current, no
 * partial state is observable (crash-injection test in OpsSpec). Concurrent
 * writers are out of scope (single-writer discipline, like a single MERGE
 * job per table — the reference's loader runs one MERGE at a time too).
 *
 * MERGE cost: only partitions named in the update set are read (resolved by
 * directory name via [[Merge.partitionDirNames]]) and only those get new
 * data files in gen<N+1>; untouched partitions stay mapped to their old
 * generation — O(|delta|) I/O per upsert at any table size. `vacuum` deletes
 * generations no longer referenced by the current manifest.
 */
object VersionedTable {

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    FileSystem.get(URI.create(root), spark.sparkContext.hadoopConfiguration)

  /** Highest committed version, if any: max N over `_commit.<N>` markers. */
  def currentVersion(spark: SparkSession, root: String): Option[Int] = {
    val fs = fsFor(spark, root)
    if (!fs.exists(new Path(root))) return None
    val vs = fs.listStatus(new Path(root)).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_commit.") =>
        n.stripPrefix("_commit.").toInt }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** partDirName -> generation dir name, from the committed manifest. */
  private def readManifest(fs: FileSystem, root: String,
                           version: Int): Map[String, String] = {
    val in = fs.open(new Path(root, s"_manifest.$version"))
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    text.split("\n").filter(_.nonEmpty).map { line =>
      val Array(part, gen) = line.split("\t")
      part -> gen
    }.toMap
  }

  /** All committed versions, ascending — the time-travel index. */
  def history(spark: SparkSession, root: String): Seq[Int] = {
    val fs = fsFor(spark, root)
    if (!fs.exists(new Path(root))) return Seq.empty
    fs.listStatus(new Path(root)).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_commit.") =>
        n.stripPrefix("_commit.").toInt }.sorted
  }

  /** Current table contents: per-generation basePath scans (partition
    * column restored from the directory names) unioned by name. Touches
    * only directories the manifest references — orphans from crashed
    * upserts are invisible.
    *
    * Time travel: pass `asOfVersion` to read any still-committed older
    * version — generations are immutable and a version's manifest pins
    * exactly the directories that made it up, so every un-vacuumed
    * version reproduces bit-identically ([[vacuum]] retires old
    * manifests/markers; snapshot reads you need to keep must happen
    * before vacuuming, the same contract as any retention window). */
  def read(spark: SparkSession, root: String,
           asOfVersion: Option[Int] = None): DataFrame = {
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(s"no committed version at $root"))
    val v = asOfVersion.getOrElse(cur)
    val fs = fsFor(spark, root)
    if (!fs.exists(new Path(root, s"_commit.$v")))
      throw new java.io.FileNotFoundException(
        s"version $v at $root is not committed (current: $cur, " +
          s"history: ${history(spark, root).mkString(",")})")
    val mapping = readManifest(fs, root, v)
    // an upsert of an EMPTY update set on a fresh table commits a valid
    // but partition-less version; surface that as a clear error (there
    // is no schema to synthesize an empty frame from) instead of the
    // bare empty.reduceLeft a reduce would throw
    if (mapping.isEmpty)
      throw new IllegalStateException(
        s"$root@v$v is committed but holds no partitions (empty table)")
    mapping.toSeq.groupBy(_._2).map { case (gen, parts) =>
      spark.read.option("basePath", s"$root/$gen")
        .parquet(parts.map { case (p, _) => s"$root/$gen/$p" }: _*)
    }.reduce(_.unionByName(_))
  }

  /** Stage version `current+1`: write merged data for TOUCHED partitions
    * into a fresh generation dir and write the new manifest — everything
    * except the commit marker. Returns the staged version number. Split
    * from [[publish]] so the crash-injection test can stop between the
    * two steps; production callers use [[upsert]]. */
  private[graft] def prepare(spark: SparkSession, root: String,
                             updates: DataFrame, keys: Seq[String],
                             partCol: String): Int = {
    require(keys.contains(partCol),
      s"partition column $partCol must be part of the merge key")
    val fs = fsFor(spark, root)
    val cur = currentVersion(spark, root)
    val next = cur.map(_ + 1).getOrElse(0)
    val genDir = s"gen$next"
    // a crashed earlier stage of this same version left unpublished
    // orphans (no marker => unreferenced); clear them before restaging
    fs.delete(new Path(s"$root/$genDir"), true)
    fs.delete(new Path(root, s"_manifest.$next"), false)
    val prior: Map[String, String] =
      cur.map(readManifest(fs, root, _)).getOrElse(Map.empty)
    val touched = Merge.partitionDirNames(spark, updates, partCol,
      s"$root/.names$next").toSet
    val touchedLive = prior.filter { case (p, _) => touched.contains(p) }
    val merged =
      if (touchedLive.isEmpty) updates
      else {
        val pType = updates.schema(partCol).dataType
        val byGen = touchedLive.toSeq.groupBy(_._2).map { case (gen, parts) =>
          spark.read.option("basePath", s"$root/$gen")
            .parquet(parts.map { case (p, _) => s"$root/$gen/$p" }: _*)
        }.reduce(_.unionByName(_))
        Merge.upsert(byGen.withColumn(partCol, col(partCol).cast(pType)),
          updates, keys)
      }
    // one writer per partition (see Merge.upsertParquetPruned note)
    merged.repartition(col(partCol))
      .write.partitionBy(partCol).parquet(s"$root/$genDir")
    val written = fs.listStatus(new Path(s"$root/$genDir")).toSeq
      .map(_.getPath.getName).filter(_.startsWith(partCol + "="))
    val mapping = prior ++ written.map(_ -> genDir)
    val manifest = mapping.toSeq.sorted.map { case (p, g) => s"$p\t$g" }
      .mkString("", "\n", "\n")
    val out = fs.create(new Path(root, s"_manifest.$next"), false)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    next
  }

  /** Commit a staged version: create its empty `_commit.<N>` marker — one
    * fresh-object PUT, the single atomic step readers key on. */
  private[graft] def publish(spark: SparkSession, root: String,
                             version: Int): Unit = {
    val out = fsFor(spark, root).create(new Path(root, s"_commit.$version"),
      false)
    out.close()
  }

  /** Partition-pruned MERGE as an atomic table-version bump. */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
             keys: Seq[String], partCol: String): Unit =
    publish(spark, root, prepare(spark, root, updates, keys, partCol))

  /** Delete generation dirs, manifests, and markers no longer reachable
    * from the current version (crashed/unpublished stages included).
    * Single-writer discipline makes this safe: nothing references them. */
  def vacuum(spark: SparkSession, root: String): Unit = {
    val fs = fsFor(spark, root)
    currentVersion(spark, root).foreach { v =>
      val live = readManifest(fs, root, v).values.toSet
      fs.listStatus(new Path(root)).toSeq.map(_.getPath).foreach { p =>
        val n = p.getName
        val stale =
          (n.startsWith("gen") && !live.contains(n)) ||
          (n.startsWith("_manifest.") &&
            n.stripPrefix("_manifest.").toInt != v) ||
          (n.startsWith("_commit.") && n.stripPrefix("_commit.").toInt != v) ||
          n.startsWith(".names") // scratch left by a crashed prepare()
        if (stale) fs.delete(p, true)
      }
    }
  }
}
