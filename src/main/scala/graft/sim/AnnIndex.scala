package graft.sim

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/**
 * A PERSISTED IVF approximate-nearest-neighbor index over a versioned
 * embeddings table, maintained INCREMENTALLY from its change feed —
 * [[graft.dedup.DedupIndex]]'s similarity twin, and the structure that
 * makes embedding search continuous at 100 TB:
 *
 *  - Centroids (the coarse quantizer, nlist × dim — small by contract)
 *    train ONCE at build and are FROZEN in a sidecar file; after that,
 *    every refresh reads only the CHANGE FEED — removed ids' cell rows
 *    erase through the bloom-probed key-list delete, inserted/updated
 *    vectors assign to the frozen centroids and upsert — so keeping the
 *    index current costs O(|changed vectors|) however large the corpus.
 *    (Standard IVF practice: cell balance degrades slowly as the
 *    distribution drifts; a rebuild retrains.)
 *  - The index IS a versioned table: (cell, id, vec), PARTITIONED BY
 *    cell — a top-k probe of nProbe cells reads exactly those partition
 *    dirs and nothing else (the same directory pruning every
 *    partitioned read gets), with stats+bloom on the id column for the
 *    erase path. The exactly-once txn watermark makes crashed refreshes
 *    replay idempotently.
 *  - [[topK]] assigns queries to their nProbe nearest frozen centroids
 *    (a shuffle-free projection — centroids inline as literals) and
 *    ranks only the probed cells' vectors; nProbe = nlist degenerates
 *    to exact brute force, which is how the oracle pins the whole
 *    persisted-index path.
 *
 * A refresh whose change set exceeds `spark.graft.annindex.idCap`
 * (default 100k) falls back to ONE full rebuild commit — centroids
 * retrain from the current corpus (the matview fallback discipline).
 */
object AnnIndex {

  case class Spec(srcRoot: String, idCol: String, vecCol: String,
                  nlist: Int, kmeansIters: Int)

  private val StreamPrefix = "annindex:"
  private def specPath(indexRoot: String) = new Path(indexRoot, "_annindex")
  private def centroidsPath(indexRoot: String) =
    new Path(indexRoot, "_anncentroids")
  private def b64e(s: String) = java.util.Base64.getEncoder
    .encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def b64d(s: String) = new String(
    java.util.Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  private def idCap(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.annindex.idCap")
      .map(_.toInt).getOrElse(100000)

  private val lastDocs = new ThreadLocal[java.lang.Long] {
    override def initialValue: java.lang.Long = -1L
  }
  private val lastRebuild = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }
  private[graft] def lastRefreshVectors: Long = lastDocs.get
  private[graft] def lastRefreshRebuild: Boolean = lastRebuild.get

  /** Define the index, train + freeze centroids, run the initial build.
    * Returns the index table version. */
  def create(spark: SparkSession, indexRoot: String, srcRoot: String,
             idCol: String, vecCol: String, nlist: Int = 16,
             kmeansIters: Int = 2): Int = {
    val spec = Spec(srcRoot, idCol, vecCol, nlist, kmeansIters)
    val fs = specPath(indexRoot).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = VersionedTable.createExclusive(fs, specPath(indexRoot))
    try out.write(render(spec).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try refresh(spark, indexRoot)
    catch { case t: Throwable =>
      try {
        fs.delete(specPath(indexRoot), false)
        fs.delete(centroidsPath(indexRoot), false)
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

  /** Persist centroids: one `cell\tf1,f2,...` line per cell, staged and
    * renamed over (rebuilds replace them atomically-enough — a reader
    * sees old or new, never a torn file). Float.toString round-trips
    * exactly, so a reloaded centroid is bit-identical. */
  private def writeCentroids(spark: SparkSession, indexRoot: String,
                             centroids: DataFrame): Unit = {
    val p = centroidsPath(indexRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lines = centroids.select(col("cell").cast("int"), col("centroid"))
      .collect().sortBy(_.getInt(0)).map { r =>
        s"${r.getInt(0)}\t${r.getSeq[Float](1).mkString(",")}"
      }.mkString("#graft-anncentroids\t1\n", "\n", "\n")
    val tmp = new Path(p.getParent,
      p.getName + ".tmp." + java.util.UUID.randomUUID().toString)
    val out = VersionedTable.createExclusive(fs, tmp)
    try out.write(lines.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent centroid write raced at $indexRoot")
    }
  }

  /** The frozen centroids as the (cell, centroid) frame
    * [[Similarity.ivfAssign]] consumes. */
  private[graft] def readCentroids(spark: SparkSession,
                                   indexRoot: String): DataFrame = {
    val p = centroidsPath(indexRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw new java.io.FileNotFoundException(
      s"no centroids at $indexRoot (index never built?)")
    val in = fs.open(p)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val rows = text.split("\n").filter(_.nonEmpty).drop(1).toSeq.map { l =>
      val Array(c, vs) = l.split("\t", 2)
      (c.toInt, vs.split(",").toSeq.map(_.toFloat))
    }
    import spark.implicits._
    rows.toDF("cell", "centroid")
  }

  private def assignRows(spark: SparkSession, indexRoot: String,
                         spec: Spec, docs: DataFrame): DataFrame =
    Similarity.ivfAssign(docs.select(col(spec.idCol), col(spec.vecCol)),
        spec.idCol, spec.vecCol, readCentroids(spark, indexRoot),
        nProbe = 1)
      .select(col("cell"), col(spec.idCol), col(spec.vecCol))

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
      val corpus = VersionedTable.read(spark, spec.srcRoot, Some(srcCur))
        .select(col(spec.idCol), col(spec.vecCol)).persist()
      try {
        lastDocs.set(corpus.count())
        lastRebuild.set(true)
        writeCentroids(spark, indexRoot,
          trainCentroids(spark, spec, corpus))
        commitRows(spark, indexRoot, spec,
          assignRows(spark, indexRoot, spec, corpus), srcCur,
          replaceAll = synced.isDefined)
      } finally corpus.unpersist()
    }
    synced match {
      case Some(v) if v >= srcCur =>
        VersionedTable.currentVersion(spark, indexRoot).get
      case None => rebuild()
      case Some(from) =>
        val feed = VersionedTable.changeFeed(spark, spec.srcRoot,
          Seq(spec.idCol), from.toInt, srcCur).persist()
        try {
          val cap = idCap(spark)
          val changedIds = feed.select(col(spec.idCol)).distinct()
            .limit(cap + 1).collect().map(_.get(0)).toSeq
          if (changedIds.length > cap) rebuild()
          else {
            lastDocs.set(changedIds.length.toLong)
            if (changedIds.nonEmpty)
              VersionedTable.deleteWhereIn(spark, indexRoot, spec.idCol,
                changedIds)
            val current = feed.filter(col("op") =!= "delete")
              .select(col(spec.idCol), col(spec.vecCol))
            commitRows(spark, indexRoot, spec,
              assignRows(spark, indexRoot, spec, current), srcCur,
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
    * nProbe = nlist probes every cell (exact brute force). */
  def topK(spark: SparkSession, indexRoot: String, queries: DataFrame,
           qId: String, qVec: String, k: Int, nProbe: Int = 4): DataFrame = {
    val spec = readSpec(spark, indexRoot)
    val probes = Similarity.ivfAssign(queries, qId, qVec,
        readCentroids(spark, indexRoot), nProbe = nProbe)
      .withColumn("__qn2", Similarity.norm(col(qVec)))
    val idx = VersionedTable.read(spark, indexRoot)
      .withColumn("__cn2", Similarity.norm(col(spec.vecCol)))
    val joined = probes.join(idx, Seq("cell"))
      .filter(col(qId) =!= col(spec.idCol))
      .withColumn("cosine_sim",
        Similarity.dot(col(qVec), col(spec.vecCol)) /
          (col("__qn2") * col("__cn2")))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine_sim").desc, col(spec.idCol).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId).as("query_id"), col(spec.idCol).as("neighbor_id"),
        col("cosine_sim"), col("rank"))
  }

  private def render(spec: Spec): String =
    s"#graft-annindex\t1\n" +
      s"#src\t${b64e(spec.srcRoot)}\n" +
      s"#id\t${b64e(spec.idCol)}\n" +
      s"#vec\t${b64e(spec.vecCol)}\n" +
      s"#nlist\t${spec.nlist}\n" +
      s"#kmeans\t${spec.kmeansIters}\n"

  private[graft] def readSpec(spark: SparkSession,
                              indexRoot: String): Spec = {
    val p = specPath(indexRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw new java.io.FileNotFoundException(
      s"no ann index at $indexRoot (missing ${p.getName})")
    val in = fs.open(p)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    require(lines.headOption.exists(_.startsWith("#graft-annindex\t1")),
      s"unrecognized ann index spec at $indexRoot")
    def one(tag: String): String = lines.collectFirst {
      case l if l.startsWith(s"#$tag\t") => l.split("\t", -1)(1)
    }.getOrElse(throw new IllegalStateException(
      s"ann index spec at $indexRoot lacks #$tag"))
    Spec(b64d(one("src")), b64d(one("id")), b64d(one("vec")),
      one("nlist").toInt, one("kmeans").toInt)
  }
}
