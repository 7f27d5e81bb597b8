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

  /** Exact payload dedup by CONTENT hash — codec-free: identical bytes are
    * identical media regardless of what they decode to, so raw-byte
    * identity is the one dedup signal that needs no codec. One map-side-
    * combined aggregate over `(md5(payload))`; shuffle ∝ distinct payloads.
    * Output: `(payload_hash, n_dups, canonical_id)` (canonical = min id,
    * the d10 convention). Null payloads are excluded. */
  def payloadContentDedup(df: DataFrame, idCol: String): DataFrame =
    df.where(col("payload").isNotNull)
      .groupBy(md5(col("payload")).as("payload_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("canonical_id"))

  /** Per-payload DISTINCT chunk signatures over fixed-stride byte chunks:
    * `(id, chunk_hash)`, one row per distinct md5 of each `chunkBytes`-byte
    * slice (last chunk may be short). Chunking happens on the HEX encoding
    * of the payload (2 hex chars = 1 byte, so chunk boundaries are
    * byte-faithful) because hex is the one byte-level representation both
    * engines slice identically — DuckDB 1.0 has no BLOB substring/md5, and
    * character-slicing raw text would break on multi-byte UTF-8. Empty and
    * null payloads have no chunks (excluded). */
  def payloadChunkSignatures(
      df: DataFrame, idCol: String, chunkBytes: Int): DataFrame = {
    require(chunkBytes >= 8 && chunkBytes <= 65536,
      s"chunkBytes must be in [8, 65536], got $chunkBytes")
    val hc = 2 * chunkBytes
    val chunks = expr(
      s"""transform(
            sequence(0, CAST((octet_length(payload) + ${chunkBytes - 1}) DIV $chunkBytes AS INT) - 1),
            i -> md5(substring(hex(payload), i * $hc + 1, $hc)))""")
    df.where(col("payload").isNotNull && octet_length(col("payload")) > 0)
      .select(col(idCol), explode(array_distinct(chunks)).as("chunk_hash"))
  }

  /** Chunked byte-signature near-dup pairs — the codec-free near-dup the
    * multimodal pillar can run TODAY: re-encodes, container re-muxes, and
    * partial re-uploads share long byte runs even when whole-file hashes
    * differ; fixed-stride chunk-hash Jaccard finds them without decoding a
    * single frame. Candidates = pairs sharing ≥ 1 chunk hash (an EXACT
    * blocking key — postings ∝ per-chunk duplication, which IS the signal
    * being measured; no all-pairs anywhere), pre-pruned by the lossless
    * d02 length-ratio bound (`j ≥ t ⇒ min(nch) ≥ t·max(nch)`), then exact
    * set Jaccard ≥ `threshold` over the distinct-chunk sets. Output:
    * `(a_id, b_id, jaccard)` with `a_id < b_id`, jaccard 6 dp. */
  def payloadNearDupPairs(
      df: DataFrame, idCol: String, chunkBytes: Int,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val sigs = payloadChunkSignatures(df, idCol, chunkBytes)
    val sizes = sigs.groupBy(col(idCol)).agg(count(lit(1)).as("nch"))
    val withN = sigs.join(sizes, idCol)
    val a = withN.select(
      col(idCol).as("a_id"), col("chunk_hash").as("a_ch"), col("nch").as("na"))
    val b = withN.select(
      col(idCol).as("b_id"), col("chunk_hash").as("b_ch"), col("nch").as("nb"))
    a.join(b,
        col("a_ch") === col("b_ch") && col("a_id") < col("b_id") &&
          least(col("na"), col("nb")) >=
            lit(threshold) * greatest(col("na"), col("nb")))
      .groupBy(col("a_id"), col("b_id"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .where(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")) >= threshold)
      .select(col("a_id"), col("b_id"),
        stableRound(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
  }

  /** WebDataset-style export sharding — pack payloads into fixed
    * `shardBytes` output shards under the deterministic md5(id) corpus
    * permutation, the multimodal analog of [[Packing.packSequences]]
    * (which it reuses: tokens → bytes): a training-data export writes
    * blobs as a sequence of ~equal-size archive shards, and the shard id
    * must be a pure function of the corpus (not of physical layout) so
    * every re-export lands every payload in the same shard. Concat-and-
    * chunk semantics: a payload belongs to the shard its FIRST byte lands
    * in. Adds `payload_bytes`, `cum_bytes` (inclusive running total over
    * the permutation — the DISTRIBUTED prefix sum, never a single-task
    * global window) and `shard` (0-based). Null payloads are excluded
    * (nothing to write). */
  def payloadShards(
      df: DataFrame, idCol: String, shardBytes: Int): DataFrame = {
    require(shardBytes >= 1024, s"shardBytes must be >= 1024, got $shardBytes")
    Packing.packSequences(
      df.where(col("payload").isNotNull)
        .withColumn("payload_bytes", octet_length(col("payload")).cast("long")),
      idCol, "payload_bytes", maxTokens = shardBytes)
      .withColumnRenamed("cum_tokens", "cum_bytes")
      .withColumnRenamed("seq_id", "shard")
  }
}
