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
