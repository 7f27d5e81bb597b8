package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming near-duplicate detection against a PREBUILT corpus index —
  * the ingestion-time complement of [[StreamingSimilarity]]: the expensive
  * corpus pass (shingle → minhash → band keys) happened once at
  * [[graft.operators.Dedup.buildNearDupIndex]] time; each micro-batch is
  * hashed map-side and probed ([[graft.operators.Dedup.probeNearDup]]), so
  * per-trigger cost is proportional to the batch, never the corpus.
  *
  * `sink` receives `(batch_id, corpus_id, jaccard)` pairs and the batch id;
  * exactly-once sink semantics when `sink` is idempotent by (batch id,
  * batch_id). Persist the index before attaching so repeated probes read
  * cached columnar blocks. Micro-batches are trigger-bounded, so the
  * default broadcast probe is right; `broadcastCandidates = false` exists
  * for sources that can deliver a huge backlogged first batch. */
object StreamingDedup {

  def attachNearDup(
      queries: DataFrame, index: Dedup.NearDupIndex,
      qIdCol: String, qTextCol: String, threshold: Double,
      checkpoint: String, broadcastCandidates: Boolean = true)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        sink(Dedup.probeNearDup(index, batch, qIdCol, qTextCol, threshold,
          broadcastCandidates), id))
      .option("checkpointLocation", checkpoint)
      .start()
}
