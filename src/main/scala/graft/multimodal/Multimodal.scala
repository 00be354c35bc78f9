package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY table N): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * run decode/feature-extraction as a per-partition batch operator.
  *
  * The real decode step is STUBBED (this container has no image/audio
  * codecs): [[FakeCodec.decodeFeatures]] derives a deterministic
  * feature vector from the payload's md5 bytes. Everything around the
  * stub — the schema contract, the Dataset[MediaRow] encoder, the
  * mapPartitions batch shape (one codec init per PARTITION, never per
  * row, exactly how a real JNI/FFI decoder must be amortized), and the
  * partition-count preservation — is real and tested.
  */
object Multimodal {

  /** A media payload row: opaque bytes + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded output: per-payload feature vector + stats. */
  case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Int, features: Array[Float])

  /** Deterministic stand-in for a real decoder (??? territory): a real
    * implementation would JNI into an image/audio codec here.
    */
  object FakeCodec {
    val Dim = 8

    /** Feature j = byte j of md5(payload) scaled to [0,1) — stable
      * across runs/engines, shaped like a real per-item embedding.
      */
    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(payload)
      Array.tabulate(Dim)(j => (digest(j) & 0xff) / 256.0f)
    }
  }

  /** Build the media table from documents: payload = UTF-8 bytes of
    * the text (stands in for image bytes), media_type round-robins.
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** The batch decode operator: mapPartitions so codec setup happens
    * once per partition (the per-row cost is only the decode itself).
    * Partitioning/narrow-dependency is preserved — no shuffle.
    */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // Real codecs initialize native state here, once per partition.
      rows.map { r =>
        MediaFeatures(r.doc_id, r.media_type, r.payload.length,
          FakeCodec.decodeFeatures(r.payload))
      }
    }
  }
}
