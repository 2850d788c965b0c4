package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque binary columns
 * with typed metadata, plus decode / feature-extract / frame-sample stages.
 *
 * The Spark-side shape is real and tested — schema, partitioning, batched
 * per-partition processing (the Scala analogue of mapInPandas batch
 * semantics). The codec itself is a clearly marked STUB: this container has
 * no image/audio libraries, so `decodeStub` produces deterministic fake
 * features from the raw bytes. Swapping in a real decoder changes only the
 * body of that one function.
 */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("n_bytes", LongType),
      StructField("content_md5", StringType))))))

  /** Wrap a string column as an opaque binary asset table (in production the
    * payload comes from binaryFile / blob storage readers). */
  def asAssets(df: DataFrame, id: String, payloadText: String, source: String,
               modality: String): DataFrame =
    df.select(
      col(id).cast(LongType).as("asset_id"),
      lit(modality).as("modality"),
      col(payloadText).cast(BinaryType).as("payload"),
      struct(
        col(source).as("source"),
        octet_length(col(payloadText).cast(BinaryType)).cast(LongType).as("n_bytes"),
        md5(col(payloadText).cast(BinaryType)).as("content_md5")).as("meta"))

  /** Decoded fake features (deterministic functions of payload bytes). */
  final case class DecodedAsset(
      asset_id: Long, n_bytes: Long, width: Int, height: Int, checksum: Long)

  /**
   * STUB DECODER — deterministic fake. A real implementation would hand each
   * batch of payloads to an image/audio codec (the mapInPandas analogue);
   * everything around it (encoder boundary, batching, partition layout) is
   * the real production shape.
   *
   * The fake is a pure arithmetic function of the payload's MD5 so an
   * oracle engine can replay it in ANSI SQL (q_multimodal_decode):
   * checksum = first 15 hex digits of md5(payload) parsed base-16 (60-bit,
   * non-negative), width/height = 64 + bounded residues of it.
   */
  private def decodeStub(assetId: Long, payload: Array[Byte],
                         md: java.security.MessageDigest): DecodedAsset = {
    val hex = md.digest(payload).map(b => f"${b & 0xFF}%02x").mkString
    val checksum = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    DecodedAsset(assetId, payload.length.toLong,
      width = 64 + (checksum % 1024).toInt,
      height = 64 + ((checksum / 7) % 1024).toInt,
      checksum = checksum)
  }

  /** Batched per-partition decode: pulls (asset_id, payload) through the
    * stub codec in fixed-size batches — the exact control shape of an
    * Arrow-batched UDF, minus the real codec. */
  def decodeAssets(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    implicit val enc = Encoders.product[DecodedAsset]
    assets.select("asset_id", "payload")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) => decodeStub(id, bytes, md) }
        }
      }
      .toDF()
  }

  /** Deterministic fixed-length feature vector per asset — the
    * feature-extract stage. STUB featurizer: strided byte histogramming in
    * place of a real vision/audio model; the Spark-side shape (binary in,
    * Array[Float] of fixed dim out, batched per partition) is the
    * production shape, and the output feeds graft.sim.Similarity directly
    * (multimodal -> embedding -> ANN composes).
    *
    * Features are RAW bucket counts, not length-normalized: cosine
    * similarity is scale-invariant, and integer counts keep every dot
    * product / norm exactly representable, so downstream cosines are
    * bit-identical across engines and an oracle can replay the whole
    * featurize -> blocked-cosine pipeline in SQL (q_multimodal_ann). */
  final case class FeaturedAsset(asset_id: Long, features: Seq[Float])

  def extractFeatures(assets: DataFrame, dim: Int = 16,
                      batchSize: Int = 64): DataFrame = {
    def featurize(payload: Array[Byte]): Array[Float] = {
      val v = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        v(((payload(i) & 0xFF) * dim / 256)) += 1.0f
        i += 1
      }
      v
    }
    implicit val enc = Encoders.product[FeaturedAsset]
    // batched per partition like decodeAssets: the control shape a real
    // model codec needs (hand a whole batch to the featurizer at once)
    assets.select("asset_id", "payload")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            FeaturedAsset(id, featurize(bytes).toSeq) }
        }
      }
      .toDF()
  }

  /** Average-hash-style PERCEPTUAL feature: the `dim`-bucket byte
    * histogram MEAN-CENTERED — sign-of-deviation-from-mean is the
    * classic perceptual-hash bit, and the centered vector feeds
    * sign-cell near-dup dedup ([[graft.sim.SemDedup]]) directly.
    * Centering happens INSIDE the batch loop, not as a post-hoc
    * `transform` lambda: Catalyst's projection collapse inlines a
    * referenced aggregate into the lambda body, re-evaluating the
    * O(dim) fold once per element (O(dim²) interpreted steps per row —
    * measured 20x the whole query's cost at dim=256).
    *
    * Exactness contract: counts are integers and `dim` must be a power
    * of two, so every centered value `count - total/dim` is a binary
    * rational with denominator `dim` — dots and norms of such values
    * stay exactly representable in doubles, making downstream cosines
    * bit-identical across engines (oracle-replayable). */
  final case class PerceptualAsset(asset_id: Long, centered: Seq[Double])

  def perceptualFeatures(assets: DataFrame, dim: Int = 256,
                         batchSize: Int = 64): DataFrame = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two for exact centering: $dim")
    def featurize(payload: Array[Byte]): Array[Double] = {
      val v = new Array[Double](dim)
      var i = 0
      while (i < payload.length) {
        v(((payload(i) & 0xFF) * dim / 256)) += 1.0d
        i += 1
      }
      val mean = payload.length.toDouble / dim
      var j = 0
      while (j < dim) { v(j) -= mean; j += 1 }
      v
    }
    implicit val enc = Encoders.product[PerceptualAsset]
    assets.select("asset_id", "payload")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            PerceptualAsset(id, featurize(bytes).toSeq) }
        }
      }
      .toDF()
  }

  /** Deterministic "resize": keep every strideth byte of the payload and
    * scale the recorded dims — the resize stage's plumbing (binary ->
    * smaller binary + updated metadata) without a codec. */
  def resizeStub(assets: DataFrame, stride: Int = 4): DataFrame = {
    val shrink = udf { payload: Array[Byte] =>
      payload.zipWithIndex.collect { case (b, i) if i % stride == 0 => b }
    }
    assets.withColumn("payload", shrink(col("payload")))
      .withColumn("meta", struct(
        col("meta.source").as("source"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_md5")))
  }

  /** Frame sampling for "video" assets: emit every strideBytes-th byte
    * offset as a frame row (plumbing for a real frame extractor). Pure
    * expressions — one output row per sampled frame. */
  def sampleFrames(assets: DataFrame, nFrames: Int): DataFrame =
    assets
      .withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_offset",
        (col("frame_idx") * col("meta.n_bytes") / nFrames).cast(LongType))
      .select(col("asset_id"), col("frame_idx"), col("frame_offset"),
        col("meta.n_bytes").as("n_bytes"))
}
