package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Multimodal columns: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as a
  * partition-wise typed pipeline.
  *
  * The decode step is STUBBED (no codec libraries in this
  * environment): [[FakeCodec.decode]] produces deterministic features
  * from the raw bytes. The Spark-side plumbing — schema, batch-shaped
  * partition processing, feature column layout — is real and is what a
  * production codec would drop into.
  */
object Binary {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String, n_bytes: Long)
  case class FeatureRow(doc_id: Long, media_type: String, n_bytes: Long, features: Array[Float])

  /** Wrap a text corpus as a media table: payload = utf-8 bytes (the
    * stand-in for image/audio blobs), typed metadata alongside.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("media_type"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** Deterministic fake decoder: 16 "features" from a byte histogram.
    * A real implementation decodes the payload (image decode, audio
    * resample, frame sample) with the same signature.
    */
  object FakeCodec {
    val FeatureDim = 16
    def decode(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xFF) % FeatureDim) += 1f
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < FeatureDim) { hist(j) /= payload.length; j += 1 }
      }
      hist
    }
  }

  /** Partition-wise feature extraction: the typed analogue of a
    * pandas-batch UDF — each partition streams rows through the codec
    * without per-row serialization overhead beyond the encoder.
    */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[FeatureRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => FeatureRow(r.doc_id, r.media_type, r.n_bytes, FakeCodec.decode(r.payload)))
    }
  }

  /** Metadata stats over the media table — schema/partitioning surface
    * checkable against a SQL oracle (payload hashes + sizes).
    */
  def metadataStats(docs: DataFrame): DataFrame =
    asMediaTable(docs)
      .select(
        col("doc_id"), col("media_type"), col("n_bytes"),
        GraftFunctions.hex64(col("payload").cast("string")).as("content_hash"))
      .orderBy(col("doc_id"))
}
