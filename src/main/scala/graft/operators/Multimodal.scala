package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with the decode/feature-extract step stubbed (no image/audio codecs in
  * this environment — the Spark-side schema, partitioning, and batch shape
  * are real; the byte-decoding kernel is a clearly-marked deterministic fake).
  *
  * North-star extension (not in the reference). At 100 TB the payloads live
  * in parquet binary columns; feature extraction runs per-partition so codec
  * state (a decoder instance) is initialized once per task, not per row —
  * the same shape a real JNI/FFmpeg binding would use.
  */
object Multimodal {

  /** Extracted feature record produced by the (stubbed) decoder. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, frame_count: Int, feature_hash: Long)

  /** Attach an opaque binary payload + typed metadata struct to a text
    * table (stand-in for image/audio bytes). */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes")).as("meta"))

  /** STUB decoder: stands in for image/audio decode + feature extraction.
    * Deterministic fake features derived from the raw bytes; a real
    * implementation would decode frames here (per-partition init, same
    * signature). */
  def decodeFeatures(
      spark: SparkSession, payloads: DataFrame, idCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec init" happens here in a real decoder
        it.map { case (id, bytes) =>
          var h = 1125899906842597L // STUB: rolling byte hash, not a codec
          var i = 0
          while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
          MediaFeatures(id, bytes.length, 1 + bytes.length / 64, h)
        }
      }
  }

  /** Batch "frame sampling" shape: every `stride`-th byte of the payload as a
    * sampled frame offset list (stand-in for video frame sampling). */
  def sampleOffsets(df: DataFrame, stride: Int): DataFrame =
    df.withColumn(
      "sampled_offsets",
      sequence(lit(0), greatest(octet_length(col("payload")) - 1, lit(0)), lit(stride)))
}
