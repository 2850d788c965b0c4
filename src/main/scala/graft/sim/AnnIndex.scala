package graft.sim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{SpecFile, VersionedTable}

/**
 * A PERSISTED IVF approximate-nearest-neighbor index over a versioned
 * embeddings table, maintained INCREMENTALLY from its change feed —
 * [[graft.dedup.DedupIndex]]'s similarity twin, and the structure that
 * makes embedding search continuous at 100 TB:
 *
 *  - Centroids (the coarse quantizer, nlist × dim — small by contract)
 *    train at build and FREEZE; after that, every refresh reads only
 *    the CHANGE FEED — removed ids' cell rows erase through the
 *    bloom-probed key-list delete, inserted/updated vectors assign to
 *    the frozen centroids and upsert — so keeping the index current
 *    costs O(|changed vectors|) however large the corpus. (Standard
 *    IVF practice: cell balance degrades slowly as the distribution
 *    drifts; a rebuild retrains.)
 *  - The index IS a versioned table: (cell, id, vec), PARTITIONED BY
 *    cell — a top-k probe of nProbe cells reads exactly those partition
 *    dirs — with stats+bloom on the id column for the erase path, and
 *    the exactly-once txn watermark replaying crashed refreshes
 *    idempotently.
 *  - Centroid files are VERSIONED BY the source txn that trained them
 *    (`_anncentroids.<v>`), and readers pick the newest file at or
 *    below the index's SYNCED version — so a rebuild's new centroids
 *    are never paired with the previous assignment's rows: until the
 *    rebuild COMMITS, its centroid file is above the watermark and
 *    invisible, and a crashed rebuild replays deterministically (same
 *    corpus → same training) over its own orphan.
 *  - [[topK]] assigns queries to their nProbe nearest frozen centroids
 *    (a shuffle-free projection — centroids inline as literals) and
 *    ranks only the probed cells' vectors; nProbe = nlist degenerates
 *    to exact brute force, which is how the oracle pins the whole
 *    persisted-index path.
 *
 * A refresh whose change set exceeds `spark.graft.annindex.idCap`
 * (default 100k) falls back to ONE full rebuild commit — centroids
 * retrain from the current corpus (the matview fallback discipline).
 * The erase and the re-assign are two commits: a reader BETWEEN them
 * sees the changed ids absent (transiently stale, never wrong rows);
 * a crash between them replays idempotently.
 */
object AnnIndex {

  case class Spec(srcRoot: String, idCol: String, vecCol: String,
                  nlist: Int, kmeansIters: Int,
                  quantized: Boolean = false)

  private val StreamPrefix = "annindex:"
  private val CentroidPrefix = "_anncentroids."
  private[graft] def specPath(indexRoot: String) =
    new Path(indexRoot, "_annindex")
  /** The txn stream id the index's sync cursor rides — for DESCRIBE. */
  private[graft] def streamId(srcRoot: String): String =
    StreamPrefix + srcRoot
  private def centroidsPath(indexRoot: String, v: Long) =
    new Path(indexRoot, CentroidPrefix + v)

  private def idCap(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.annindex.idCap")
      .map(_.toInt).getOrElse(100000)

  private val lastDocs = new ThreadLocal[java.lang.Long] {
    override def initialValue: java.lang.Long = -1L
  }
  private val lastRebuild = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }
  /** Vectors the LAST [[refresh]] processed (feed-sized on the
    * incremental path, the corpus count on builds/rebuilds) and whether
    * it retrained — per-thread observability, the MatView convention. */
  private[graft] def lastRefreshVectors: Long = lastDocs.get
  private[graft] def lastRefreshRebuild: Boolean = lastRebuild.get

  /** Define the index, train + freeze centroids, run the initial build.
    * Returns the index table version. */
  def create(spark: SparkSession, indexRoot: String, srcRoot: String,
             idCol: String, vecCol: String, nlist: Int = 16,
             kmeansIters: Int = 2, quantized: Boolean = false): Int = {
    val spec = Spec(srcRoot, idCol, vecCol, nlist, kmeansIters, quantized)
    SpecFile.writeExclusive(spark, specPath(indexRoot), render(spec))
    try refresh(spark, indexRoot)
    catch { case t: Throwable =>
      try {
        val fs = SpecFile.fs(spark, specPath(indexRoot))
        fs.delete(specPath(indexRoot), false)
        listCentroidFiles(spark, indexRoot).foreach(v =>
          fs.delete(centroidsPath(indexRoot, v), false))
      } catch { case c: Throwable => t.addSuppressed(c) }
      throw t
    }
  }

  private def trainCentroids(spark: SparkSession, spec: Spec,
                             corpus: DataFrame): DataFrame =
    if (spec.kmeansIters > 0)
      Similarity.ivfCentroidsKMeans(corpus, spec.idCol, spec.vecCol,
        spec.nlist, spec.kmeansIters)
    else Similarity.ivfCentroids(corpus, spec.idCol, spec.vecCol,
      spec.nlist)

  private def listCentroidFiles(spark: SparkSession,
                                indexRoot: String): Seq[Long] = {
    val dir = new Path(indexRoot)
    val fs = SpecFile.fs(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(CentroidPrefix))
      .flatMap(_.stripPrefix(CentroidPrefix).toLongOption)
  }

  /** Persist centroids for the rebuild that will commit txn version
    * `atVersion`: one `cell\tf1,f2,...` line per cell. A replayed
    * rebuild (crash before its commit) rewrites the SAME deterministic
    * content over its own orphan. Float.toString round-trips exactly. */
  private def writeCentroids(spark: SparkSession, indexRoot: String,
                             centroids: DataFrame,
                             atVersion: Long): Unit = {
    val p = centroidsPath(indexRoot, atVersion)
    val lines = centroids.select(col("cell").cast("int"), col("centroid"))
      .collect().sortBy(_.getInt(0)).map { r =>
        s"${r.getInt(0)}\t${r.getSeq[Float](1).mkString(",")}"
      }.mkString("#graft-anncentroids\t1\n", "\n", "\n")
    SpecFile.fs(spark, p).delete(p, false) // replayed rebuild's orphan
    SpecFile.writeExclusive(spark, p, lines)
  }

  /** The frozen centroids PAIRED with the index's committed state: the
    * newest centroid file at or below the synced source version — a
    * rebuild's new file stays invisible until its commit publishes the
    * watermark. `atVersion` pins the pairing to a snapshot the caller
    * already resolved (topK reads rows AND centroids from one version,
    * so a rebuild committing mid-query cannot mismatch them). */
  private[graft] def readCentroids(spark: SparkSession, indexRoot: String,
                                   spec: Spec,
                                   atVersion: Option[Int] = None)
      : DataFrame = {
    val synced = VersionedTable.currentVersion(spark, indexRoot)
      .flatMap { cur =>
        atVersion match {
          case Some(v) => VersionedTable.lastTxnAt(spark, indexRoot,
            StreamPrefix + spec.srcRoot, v)
          case None => VersionedTable.lastTxn(spark, indexRoot,
            StreamPrefix + spec.srcRoot)
        }
      }
      .getOrElse(throw new java.io.FileNotFoundException(
        s"ann index at $indexRoot has no committed build"))
    val v = listCentroidFiles(spark, indexRoot).filter(_ <= synced)
      .sorted.lastOption.getOrElse(
        throw new java.io.FileNotFoundException(
          s"no centroids at or below synced version $synced at " +
            s"$indexRoot (vacuumed?)"))
    val text = SpecFile.readText(spark, centroidsPath(indexRoot, v),
      s"no centroids at $indexRoot")
    val rows = text.split("\n").filter(_.nonEmpty).drop(1).toSeq.map { l =>
      val Array(c, vs) = l.split("\t", 2)
      (c.toInt, vs.split(",").toSeq.map(_.toFloat))
    }
    import spark.implicits._
    rows.toDF("cell", "centroid")
  }

  /** Index content rows. Float mode stores the vector verbatim;
    * quantized mode stores the int8 codes (`__qv`, array<tinyint>) plus
    * the per-row scale (`__qs`) — ~4× smaller rows, the 100 TB storage
    * lever ([[Quantize.quantizeInt8]]'s deterministic scheme). Cell
    * ASSIGNMENT always uses the float vector: quantization must not
    * move a row across cells. */
  private def assignRows(spec: Spec, docs: DataFrame,
                         centroids: DataFrame): DataFrame = {
    val assigned = Similarity.ivfAssign(
      docs.select(col(spec.idCol), col(spec.vecCol)),
      spec.idCol, spec.vecCol, centroids, nProbe = 1)
    if (!spec.quantized)
      assigned.select(col("cell"), col(spec.idCol), col(spec.vecCol))
    else Quantize.quantizeInt8(assigned, spec.vecCol, "__qv0", "__qs0")
      .select(col("cell"), col(spec.idCol),
        col("__qv0").cast("array<tinyint>").as("__qv"),
        col("__qs0").cast("float").as("__qs"))
  }

  private def commitRows(spark: SparkSession, indexRoot: String,
                         spec: Spec, rows: DataFrame, srcVersion: Int,
                         replaceAll: Boolean): Int =
    VersionedTable.upsert(spark, indexRoot, rows,
      keys = Seq("cell", spec.idCol), partCols = Seq("cell"),
      statsCols = Seq(spec.idCol), bloomCols = Seq(spec.idCol),
      txn = Some((StreamPrefix + spec.srcRoot, srcVersion.toLong)),
      replaceAll = replaceAll)

  /** Advance the index to the source's current version. Returns the
    * index table version. */
  def refresh(spark: SparkSession, indexRoot: String): Int = {
    lastDocs.set(-1L)
    lastRebuild.set(false)
    val spec = readSpec(spark, indexRoot)
    val srcCur = VersionedTable.currentVersion(spark, spec.srcRoot)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version at ${spec.srcRoot}"))
    val streamId = StreamPrefix + spec.srcRoot
    val synced = VersionedTable.currentVersion(spark, indexRoot)
      .flatMap(_ => VersionedTable.lastTxn(spark, indexRoot, streamId))
    def rebuild(): Int = {
      // smallQuery at the SOURCE frame (scan leaves carry real byte
      // estimates): the count, centroid training, and assignment rows
      // all inherit the static session when the corpus is small
      val corpus = VersionedTable.smallQuery(
        VersionedTable.read(spark, spec.srcRoot, Some(srcCur))
          .select(col(spec.idCol), col(spec.vecCol))).persist()
      try {
        lastDocs.set(corpus.count())
        lastRebuild.set(true)
        val centroids = trainCentroids(spark, spec, corpus)
        // centroids FIRST (invisible above the watermark until the
        // commit publishes it), assignment from the SAME frame (never
        // re-read mid-rebuild), then the one content commit
        writeCentroids(spark, indexRoot, centroids, srcCur.toLong)
        val v = commitRows(spark, indexRoot, spec,
          assignRows(spec, corpus, centroids), srcCur,
          replaceAll = synced.isDefined)
        // retire superseded centroid files (keep this one and the
        // previous, for readers mid-flight on the old watermark)
        val keep = listCentroidFiles(spark, indexRoot)
          .filter(_ <= srcCur.toLong).sorted.takeRight(2).toSet
        listCentroidFiles(spark, indexRoot)
          .filter(c => c < srcCur.toLong && !keep.contains(c))
          .foreach(c => SpecFile.fs(spark, specPath(indexRoot))
            .delete(centroidsPath(indexRoot, c), false))
        v
      } finally corpus.unpersist()
    }
    synced match {
      case Some(v) if v >= srcCur =>
        VersionedTable.currentVersion(spark, indexRoot).get
      case None => rebuild()
      case Some(from) =>
        // source-frame smallQuery: see rebuild's note
        val feed = VersionedTable.smallQuery(
          VersionedTable.changeFeed(spark, spec.srcRoot,
            Seq(spec.idCol), from.toInt, srcCur)).persist()
        try {
          val cap = idCap(spark)
          val changedIds = VersionedTable.smallQuery(
            feed.select(col(spec.idCol)).distinct()
              .limit(cap + 1)).collect().map(_.get(0)).toSeq
          if (changedIds.length > cap) rebuild()
          else {
            lastDocs.set(changedIds.length.toLong)
            val centroids = readCentroids(spark, indexRoot, spec)
            if (changedIds.nonEmpty)
              VersionedTable.deleteWhereIn(spark, indexRoot, spec.idCol,
                changedIds)
            val current = feed.filter(col("op") =!= "delete")
              .select(col(spec.idCol), col(spec.vecCol))
            commitRows(spark, indexRoot, spec,
              assignRows(spec, current, centroids), srcCur,
              replaceAll = false)
          }
        } finally feed.unpersist()
    }
  }

  /** Top-k cosine neighbors for a `queries` (qId, qVec) batch through
    * the persisted index: queries assign to their nProbe nearest frozen
    * centroids (shuffle-free), ONLY those cells' partition dirs are
    * read, and ranking runs over the probed rows — (query_id,
    * neighbor_id, cosine_sim, rank), the [[Similarity.ivfTopK]] shape.
    * nProbe = nlist probes every cell (exact brute force). Query column
    * names may collide with the index's (the natural self-query case):
    * the index side is internally aliased. */
  def topK(spark: SparkSession, indexRoot: String, queries: DataFrame,
           qId: String, qVec: String, k: Int, nProbe: Int = 4): DataFrame =
    topK(spark, indexRoot, readSpec(spark, indexRoot), queries, qId,
      qVec, k, nProbe)

  /** [[topK]] with an already-read spec (the SQL TVF reads it once for
    * the column names and passes it through). */
  private[graft] def topK(spark: SparkSession, indexRoot: String,
                          spec: Spec, queries: DataFrame, qId: String,
                          qVec: String, k: Int, nProbe: Int): DataFrame = {
    // ONE pinned snapshot for the whole probe: rows AND centroids
    // resolve from the same committed version, so a rebuild committing
    // mid-query cannot pair old centroids with new-assignment rows
    val cur = VersionedTable.currentVersion(spark, indexRoot)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"ann index at $indexRoot has no committed build"))
    // pin the probe assignment ONCE (localCheckpoint: materialized,
    // lineage truncated, no cache-manager entry to leak): it feeds the
    // probed-cell collect AND the join — re-executing a
    // non-deterministic query source between the two could assign rows
    // to cells the constrained read pruned. Size = |queries| × nProbe.
    val probes = VersionedTable.smallQuery(
      Similarity.ivfAssign(queries, qId, qVec,
          readCentroids(spark, indexRoot, spec, Some(cur)),
          nProbe = nProbe)
        .withColumn("__qn2", Similarity.norm(col(qVec))))
      .localCheckpoint()
    // the probed CELL SET is at most nlist values (tiny by contract) —
    // collect it and read the index CONSTRAINED on the partition
    // column, so only the probed cells' dirs are listed/scanned (a
    // plain join would read every partition; no DPP reaches the custom
    // scan). With nProbe = nlist this degenerates to the full read, as
    // exactness requires.
    val probedCells = VersionedTable.smallQuery(
      probes.select(col("cell")).distinct())
      .collect().map(_.get(0)).toSeq
    val idxRaw = VersionedTable.readConstrained(spark, indexRoot,
        Seq(VersionedTable.ColConstraint("cell", None, None, None,
          inSet = Some(probedCells))), Some(cur))
    // quantized rows dequantize in-plan (int8 × per-row scale → float):
    // the scan reads the ~4× smaller codes, the ranking kernel is
    // unchanged
    val idx =
      if (!spec.quantized)
        idxRaw.select(col("cell"), col(spec.idCol).as("__c_id"),
          col(spec.vecCol).as("__c_vec"))
      else idxRaw.select(col("cell"), col(spec.idCol).as("__c_id"),
        transform(col("__qv"), x =>
          (x.cast("double") * col("__qs")).cast("float")).as("__c_vec"))
    val scored = probes
      .join(idx.withColumn("__cn2", Similarity.norm(col("__c_vec"))),
        Seq("cell"))
      .filter(col(qId) =!= col("__c_id"))
      .withColumn("cosine_sim",
        Similarity.dot(col(qVec), col("__c_vec")) /
          (col("__qn2") * col("__cn2")))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine_sim").desc, col("__c_id").asc)
    val ranked =
      if (!spec.quantized) scored
      else {
        // float re-rank on the shortlist: the int8 ranking picks
        // refine ≫ k candidates per query, their TRUE vectors come
        // from the SOURCE pinned at the index's synced version (id
        // IN-probes through the source's indexes when the candidate
        // set fits, broadcast semi join past it), and the served
        // cosine is float-exact — quantization error can only cost
        // recall at the shortlist boundary, never wrong similarities
        val refine = math.max(4 * k, k + 10)
        val short = VersionedTable.smallQuery(
          scored.withColumn("__ar", row_number().over(w))
            .filter(col("__ar") <= refine)
            .select(col(qId), col(qVec), col("__qn2"), col("__c_id")))
          .localCheckpoint()
        val syncedSrc = VersionedTable.lastTxnAt(spark, indexRoot,
          StreamPrefix + spec.srcRoot, cur).getOrElse(
            throw new IllegalStateException(
              s"ann index at $indexRoot has no synced source version"))
          .toInt
        val cap = idCap(spark)
        val ids = VersionedTable.smallQuery(
          short.select(col("__c_id")).distinct().limit(cap + 1))
          .collect().map(_.get(0)).toSeq
        val candSrc =
          if (ids.length <= cap)
            VersionedTable.readConstrained(spark, spec.srcRoot,
              Seq(VersionedTable.ColConstraint(spec.idCol, None, None,
                None, inSet = Some(ids))), Some(syncedSrc))
          else VersionedTable.read(spark, spec.srcRoot, Some(syncedSrc))
            .join(broadcast(short.select(col("__c_id").as(spec.idCol))
              .distinct()), Seq(spec.idCol), "left_semi")
        val cand = candSrc.select(col(spec.idCol).as("__c_id"),
            col(spec.vecCol).as("__f_vec"))
          .withColumn("__fn2", Similarity.norm(col("__f_vec")))
        short.join(cand, Seq("__c_id"))
          .withColumn("cosine_sim",
            Similarity.dot(col(qVec), col("__f_vec")) /
              (col("__qn2") * col("__fn2")))
      }
    VersionedTable.smallQuery(
      ranked.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col(qId).as("query_id"), col("__c_id").as("neighbor_id"),
          col("cosine_sim"), col("rank")))
  }

  private def render(spec: Spec): String =
    s"#graft-annindex\t1\n" +
      s"#src\t${SpecFile.b64e(spec.srcRoot)}\n" +
      s"#id\t${SpecFile.b64e(spec.idCol)}\n" +
      s"#vec\t${SpecFile.b64e(spec.vecCol)}\n" +
      s"#nlist\t${spec.nlist}\n" +
      s"#kmeans\t${spec.kmeansIters}\n" +
      s"#quant\t${if (spec.quantized) 1 else 0}\n"

  private[graft] def readSpec(spark: SparkSession,
                              indexRoot: String): Spec = {
    val tags = SpecFile.tagged(
      SpecFile.readText(spark, specPath(indexRoot),
        s"no ann index at $indexRoot (missing _annindex)"),
      "#graft-annindex\t1", indexRoot)
    Spec(SpecFile.b64d(tags("src")), SpecFile.b64d(tags("id")),
      SpecFile.b64d(tags("vec")), tags("nlist").toInt,
      tags("kmeans").toInt,
      // absent on pre-quantization specs: float mode
      quantized = tags.get("quant").contains("1"))
  }
}
