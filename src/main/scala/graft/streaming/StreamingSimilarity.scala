package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** SELF-EXTENDING ingest-time ANN: each micro-batch of vectors is probed
    * against the base corpus PLUS every earlier batch, then folded into the
    * index state — so a vector ingested in trigger 1 is retrievable by a
    * trigger-2 probe WITHOUT a restart (the gap the frozen-index
    * [[attachIvf]] leaves: its index only grows "between restarts").
    *
    * Mechanics per trigger ([[DeltaStaging]], the near-dup self-extending
    * discipline): purge stagings ≥ id; assign the batch's vectors to the
    * FROZEN codebook ([[Similarity.assignToCodebook]] — broadcast fold,
    * rows never move); stage the assigned rows at `statePath/_batch=<id>`;
    * probe the batch against base ∪ deltas STRICTLY BELOW id. Replay
    * rewrites the same staging and probes the same state → sink output
    * idempotent by batch id; a fresh incarnation starts clean. The
    * codebook is never refit mid-stream (standard IVF practice — recall
    * degrades only with distribution drift); rebuild + re-stage between
    * restarts when it does, compacting deltas via
    * [[Similarity.extendIvfIndex]] → [[Similarity.saveIvfIndex]].
    *
    * `sink` receives the probe result `(q_id, rank, <idCol>, sim)` — the
    * retrieved id may name a base-corpus vector or an earlier stream
    * vector — and the batch id. Within-batch neighbors do not pair (probe
    * side excludes the current batch); ids must be unique across the
    * stream and type-compatible with the base index's. */
  def attachIvfSelfExtending(
      vectors: DataFrame, index: Similarity.IvfIndex,
      qIdCol: String, qVecCol: String, k: Int, nProbe: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        // stage under the INDEX's column names so the delta unions by name
        // with index.assigned whatever the stream frame calls its columns
        DeltaStaging.stage(
          Similarity.assignToCodebook(
            index.codebook,
            batch.select(
              org.apache.spark.sql.functions.col(qIdCol).as(index.idCol),
              org.apache.spark.sql.functions.col(qVecCol).as(index.vecCol)),
            index.idCol, index.vecCol),
          statePath, id)
        val extended = DeltaStaging.deltasBelow(spark, statePath, id)
          .fold(index)(d =>
            index.copy(assigned = index.assigned.unionByName(d)))
        sink(
          Similarity.probeIvf(extended, batch, qIdCol, qVecCol, k, nProbe,
            guardBroadcast = false),
          id)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The serving-side view of a self-extending stream's index: base plus
    * every committed delta — what the NEXT trigger will probe. Hand it to
    * [[Similarity.probeIvf]] (or a second, query-stream [[attachIvf]]) so
    * ad-hoc retrieval sees everything ingested so far. */
  def currentIvf(
      spark: SparkSession, index: Similarity.IvfIndex,
      statePath: String): Similarity.IvfIndex =
    DeltaStaging.allDeltas(spark, statePath)
      .fold(index)(d => index.copy(assigned = index.assigned.unionByName(d)))

  /** [[attachIvfSelfExtending]] for a sign-LSH index — the same
    * [[DeltaStaging]] discipline; the staged delta is the batch's bucket
    * rows (hashing is a pure projection with the index's FROZEN plane
    * matrix, so unlike IVF the extended index is IDENTICAL to a fresh
    * build over the union — extension loses nothing). */
  def attachLshSelfExtending(
      vectors: DataFrame, index: Similarity.LshIndex,
      qIdCol: String, qVecCol: String, k: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        DeltaStaging.stage(
          batch.select(
            org.apache.spark.sql.functions.col(qIdCol).as(index.idCol),
            org.apache.spark.sql.functions.col(qVecCol).as(index.vecCol))
            .withColumn("_bucket", Similarity.lshBucket(
              org.apache.spark.sql.functions.col(index.vecCol),
              index.nPlanes, index.dims)),
          statePath, id)
        val extended = DeltaStaging.deltasBelow(spark, statePath, id)
          .fold(index)(d => index.copy(buckets = index.buckets.unionByName(d)))
        sink(
          Similarity.probeLsh(extended, batch, qIdCol, qVecCol, k,
            guardBroadcast = false),
          id)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The serving-side view of a self-extending LSH stream's index. */
  def currentLsh(
      spark: SparkSession, index: Similarity.LshIndex,
      statePath: String): Similarity.LshIndex =
    DeltaStaging.allDeltas(spark, statePath)
      .fold(index)(d => index.copy(buckets = index.buckets.unionByName(d)))

  /** BETWEEN-RESTART compaction (the [[StreamingDedup.compactNearDupIndex]]
    * lifecycle for IVF): persist base ∪ deltas as a bucketed index under
    * `name` ([[Similarity.saveIvfIndex]]), clear the staging dir, return
    * the reloaded index to re-attach with. The natural point to ALSO refit
    * a drifted codebook ([[Similarity.buildIvfIndexAuto]] over the saved
    * assigned rows) before re-attaching. Run ONLY with the ingesting query
    * stopped. */
  def compactIvfIndex(
      spark: SparkSession, index: Similarity.IvfIndex,
      statePath: String, name: String, numBuckets: Int): Similarity.IvfIndex = {
    Similarity.saveIvfIndex(currentIvf(spark, index, statePath), name, numBuckets)
    DeltaStaging.clear(spark, statePath)
    Similarity.loadIvfIndex(spark, name, index.idCol, index.vecCol)
  }

  /** [[attachIvf]] for a sign-LSH index. */
  def attachLsh(
      queries: DataFrame, index: Similarity.LshIndex,
      qIdCol: String, qVecCol: String, k: Int,
      checkpoint: String)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    attach(queries, checkpoint, sink)(batch =>
      Similarity.probeLsh(index, batch, qIdCol, qVecCol, k,
        guardBroadcast = false))
}
