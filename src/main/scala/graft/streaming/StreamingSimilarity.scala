package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Streaming retrieval: enrich a stream of query vectors with their top-k
  * corpus neighbors by probing a PREBUILT ANN index per micro-batch.
  *
  * The index is the build-once artifact ([[Similarity.buildIvfIndex]] →
  * `persisted()` or [[Similarity.saveIvfIndex]]-as-bucketed-tables); each
  * micro-batch pays ONLY the probe — broadcast codebook, candidate-cell
  * equi-join, skew-safe per-query top-k — never a corpus pass. This is the
  * streaming continuation of the build/probe split: at 100 TB the corpus
  * side is a bucketed table the probe join reads exchange-free, and the
  * per-trigger cost is ∝ batch size, flat while the corpus grows (grow the
  * index itself with [[Similarity.extendIvfIndex]] between restarts, or a
  * maintainer job).
  *
  * Shape: `foreachBatch` — the probe's per-query top-k is a window-function
  * plan, unsupported directly on a streaming frame. A streaming-native
  * formulation (mapGroupsWithState over cells) would buy nothing: the probe
  * is stateless per batch; checkpointed offsets already give exactly-once
  * sink semantics when `sink` is idempotent by (batch id, q_id).
  */
object StreamingSimilarity {

  /** Shared attach shape: one probe per micro-batch via `foreachBatch` —
    * every public attach differs only in which batch probe it runs.
    * guardBroadcast = false on all of them: micro-batches are
    * trigger-bounded, so the guard's per-batch head-count job would add a
    * driver round-trip per trigger for a decision that is always
    * "broadcast". */
  private def attach(
      queries: DataFrame, checkpoint: String, sink: (DataFrame, Long) => Unit)(
      probe: DataFrame => DataFrame): StreamingQuery =
    queries.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => sink(probe(batch), id))
      .option("checkpointLocation", checkpoint)
      .start()

  /** Start a query probing `index` with every micro-batch of `queries`.
    * `sink` receives the probe result — `(q_id, rank, <idCol>, sim)`, see
    * [[Similarity.probeIvf]] — and the batch id. */
  def attachIvf(
      queries: DataFrame, index: Similarity.IvfIndex,
      qIdCol: String, qVecCol: String, k: Int, nProbe: Int,
      checkpoint: String)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    attach(queries, checkpoint, sink)(batch =>
      Similarity.probeIvf(index, batch, qIdCol, qVecCol, k, nProbe,
        guardBroadcast = false))

  /** [[attachIvf]] for an SQ8-compressed IVF index
    * ([[Similarity.buildSq8IvfIndex]]): each trigger pays the pruned-cell
    * probe over the ¼-sized coded corpus, reconstructing candidates
    * map-side (ADC — the streaming query vector stays full-precision). The
    * shape for a retrieval service whose resident index must fit executor
    * storage at corpus scale. */
  def attachSq8Ivf(
      queries: DataFrame, index: Similarity.Sq8IvfIndex,
      qIdCol: String, qVecCol: String, k: Int, nProbe: Int,
      checkpoint: String)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    attach(queries, checkpoint, sink)(batch =>
      Similarity.probeSq8Ivf(index, batch, qIdCol, qVecCol, k, nProbe,
        guardBroadcast = false))

  /** [[attachIvf]] for a sign-LSH index. */
  def attachLsh(
      queries: DataFrame, index: Similarity.LshIndex,
      qIdCol: String, qVecCol: String, k: Int,
      checkpoint: String)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    attach(queries, checkpoint, sink)(batch =>
      Similarity.probeLsh(index, batch, qIdCol, qVecCol, k,
        guardBroadcast = false))
}
