package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `BINARY` columns with typed metadata travelling alongside. The Spark
  * side — schema, partition-friendly batch shape, per-partition decode
  * loop — is real; the codec itself is STUBBED with a deterministic fake
  * (this container has no image/audio libraries), clearly marked below.
  * Swapping in a real decoder changes only `decodeStub`.
  */
object Multimodal {

  /** A media row: payload + metadata. */
  case class MediaRecord(media_id: Long, mime: String, bytes: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** ===== STUB ===== deterministic fake decode: derives dimensions and a
    * feature vector from the payload bytes. A real implementation would
    * decode the image/audio here (e.g. via javax.imageio / ffmpeg bindings).
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.bytes.length.toLong
    var h = 1125899906842597L // deterministic FNV-ish roll over the payload
    var i = 0
    while (i < r.bytes.length) { h = h * 31 + r.bytes(i); i += 1 }
    val feat = Array.tabulate(8) { j =>
      (((h >>> (j * 8)) & 0xff).toFloat / 255.0f) - 0.5f
    }
    MediaFeatures(
      r.media_id, r.mime, n,
      width = (640 + (n % 1280)).toInt,
      height = (360 + ((n * 7) % 720)).toInt,
      feature = feat)
  }

  /** Distributed decode: mapPartitions so a real codec could amortize
    * per-partition initialization (model load, decoder context); partition
    * count follows the input, no shuffle is introduced.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(decodeStub) }
  }

  /** Binary-column metadata projection, builtins only (no decode): payload
    * size, content digest, and stub dimensions — the part of the media
    * pipeline that IS expressible relationally and oracle-checkable.
    */
  def mediaMeta(df: DataFrame, idCol: String, payloadStrCol: String, nCharsCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(payloadStrCol)).cast("long").as("n_bytes"),
      md5(col(payloadStrCol)).as("content_hash"),
      (lit(640L) + col(nCharsCol) % 1280).cast("long").as("fake_width"),
      (lit(360L) + (col(nCharsCol) * 7) % 720).cast("long").as("fake_height"))
      .orderBy(col(idCol))

  /** One feature-vector element, exploded for engine-portable comparison
    * (array columns don't hash-compare across engines).
    */
  case class MediaFeatureRow(media_id: Long, j: Long, feat: Double)

  /** Distributed feature extraction with a PORTABLE stub: the per-
    * partition decode loop is real (mapPartitions, codec/model init
    * amortizable per partition — `init` stands where a real decoder
    * context would load), while the "features" are derived from the
    * payload's md5 so the exact values reproduce in DuckDB and the whole
    * mapPartitions path carries a hash-checked oracle — the same
    * portability trick as the `n2b`/`n4b`/`p3b` twins, applied to the
    * imperative (non-relational) execution path.
    */
  def extractFeaturesPortable(media: Dataset[MediaRecord], dims: Int = 8): Dataset[MediaFeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // ===== per-partition init: a real codec/model would load HERE =====
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        digest.reset()
        val hex = digest.digest(r.bytes).map("%02x".format(_)).mkString
        (0 until dims).iterator.map { j =>
          val b = Integer.parseInt(hex.substring(2 * j, 2 * j + 2), 16)
          MediaFeatureRow(r.media_id, j.toLong, b / 255.0 - 0.5)
        }
      }
    }
  }

  /** 16-bit perceptual hash over an extracted feature relation
    * `(media_id, j, feat)`: bit j set iff feature j is non-negative —
    * the sign-quantization step every real pHash pipeline ends with
    * (DCT/embedding features → sign bits). One map-side-combinable
    * aggregation per media row; no shuffle beyond the groupBy.
    */
  def phash16(features: DataFrame): DataFrame =
    features
      .groupBy(col("media_id"))
      .agg(sum(when(col("feat") >= 0,
        expr("shiftleft(1L, cast(j as int))")).otherwise(lit(0L))).as("fp"))

  /** Multimodal near-duplicate pairs by perceptual hash: features →
    * [[phash16]] → the SAME banded Hamming-radius join the text SimHash
    * path uses ([[graft.dedup.Dedup.hamming16Pairs]] — complete for
    * r ≤ 3, never a cartesian). This is the cross-media dedup shape: the
    * decode/feature stage is modality-specific (stubbed here, see
    * [[extractFeaturesPortable]]), everything downstream is
    * modality-agnostic fingerprint algebra.
    */
  def phashPairs(features: DataFrame, radius: Int): DataFrame =
    graft.dedup.Dedup.hamming16Pairs(
      phash16(features).select(col("media_id").as("id"), col("fp")),
      radius, "media_a", "media_b")

  /** Frame sampling plumbing: per media row, the deterministic frame
    * indices a video decoder would be asked for — uniform stride so that
    * ≤ `maxFrames` frames are taken regardless of clip length (the
    * standard "sample k frames" pre-processing for video training data).
    * Pure builtins (sequence + explode); the fake frame count derives from
    * metadata exactly like [[mediaMeta]]'s stub dimensions.
    */
  def frameSample(df: DataFrame, idCol: String, nCharsCol: String, maxFrames: Int): DataFrame = {
    val nFrames = (col(nCharsCol) % 991 + 10).cast("long") // stub: 10..1000 frames
    val stride = ceil(nFrames.cast("double") / maxFrames).cast("long")
    df.select(
        col(idCol).as("media_id"),
        nFrames.as("n_frames"),
        explode(sequence(lit(0L), nFrames - 1, stride)).as("frame_idx"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Build a typed media dataset from the documents table (payload = the
    * UTF-8 bytes of `text`) — exercises the binary plumbing end to end.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        lit("application/fake").as("mime"),
        col("text").cast("binary").as("bytes"))
      .as[MediaRecord]
  }
}
