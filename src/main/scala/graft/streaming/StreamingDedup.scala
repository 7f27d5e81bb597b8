package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** SELF-EXTENDING ingest-time near-dup: batch `N` is probed against the
    * base corpus PLUS every earlier batch `1..N-1`, then folded into the
    * index state — the actual ingest requirement [[attachNearDup]]'s
    * frozen index cannot meet (a near-dup pair split across two triggers
    * is invisible to it; the reference's whole on-demand idea is state
    * that grows with the stream,
    * `…/imtu/InMemoryTableUpdater.scala:173-215`).
    *
    * Mechanics per trigger ([[DeltaStaging]] — the [[StreamingPca]]
    * replay/incarnation discipline, adapted to deltas): purge stagings
    * ≥ id, hash the batch ONCE with the index's geometry
    * ([[graft.operators.Dedup.prepForNearDupIndex]]), stage it at
    * `statePath/_batch=<id>`, then probe the staged rows (read back
    * columnar) against base ∪ deltas STRICTLY BELOW id. A replayed batch
    * rewrites its own staging deterministically and probes the identical
    * index state, so the sink output for a given id is idempotent; a fresh
    * incarnation (checkpoint reset, same statePath) starts clean.
    *
    * Cost: write side ∝ batch (one hash pass, one small parquet dir per
    * trigger); probe side scan-bound over base + history — exactly the
    * batch-probe shape, because dedup against ALL earlier batches is the
    * semantics, not overhead. Compact between restarts by folding deltas
    * into a new base ([[graft.operators.Dedup.extendNearDupIndex]] →
    * [[graft.operators.Dedup.saveNearDupIndex]]) and clearing `statePath`.
    *
    * WITHIN-batch duplicates do not pair here (the probe side is
    * base ∪ earlier batches only); run
    * [[graft.operators.Dedup.minHashLshPairs]] on the batch when
    * intra-trigger pairs matter. `idCol` values must be unique across the
    * stream and type-compatible with the base index's ids.
    *
    * `sink` receives `(batch_id, corpus_id, jaccard)` — `corpus_id` may
    * name a base-corpus doc or an earlier stream doc — and the batch id. */
  def attachNearDupSelfExtending(
      docs: DataFrame, baseIndex: Dedup.NearDupIndex,
      idCol: String, textCol: String, threshold: Double,
      statePath: String, checkpoint: String,
      broadcastCandidates: Boolean = true)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        DeltaStaging.stage(
          Dedup.prepForNearDupIndex(baseIndex, batch, idCol, textCol),
          statePath, id)
        val index = DeltaStaging.deltasBelow(spark, statePath, id)
          .fold(baseIndex)(d =>
            baseIndex.copy(prepped = baseIndex.prepped.unionByName(d)))
        sink(
          Dedup.probeNearDupPrepped(
            index, DeltaStaging.read(spark, statePath, id), threshold,
            broadcastCandidates),
          id)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The serving-side view of a self-extending stream's index: base plus
    * every committed delta — for ad-hoc batch probes against a live
    * ingest's state (matches what the NEXT trigger will probe). */
  def currentNearDupIndex(
      spark: SparkSession, baseIndex: Dedup.NearDupIndex,
      statePath: String): Dedup.NearDupIndex =
    DeltaStaging.allDeltas(spark, statePath)
      .fold(baseIndex)(d =>
        baseIndex.copy(prepped = baseIndex.prepped.unionByName(d)))

  /** BETWEEN-RESTART compaction — the delta-staging lifecycle's closing
    * step: fold base ∪ deltas into a new persisted bucketed index
    * ([[graft.operators.Dedup.saveNearDupIndex]] under `name`), clear the
    * staging dir, and return the reloaded index to re-attach with. Bounds
    * the per-trigger multi-dir read after long streams (one small parquet
    * dir accrues per trigger) and restores the bucketed-table probe path.
    * Run ONLY with the ingesting query stopped: a live query would re-fold
    * cleared history or race the staging listing. */
  def compactNearDupIndex(
      spark: SparkSession, baseIndex: Dedup.NearDupIndex,
      statePath: String, name: String, numBuckets: Int): Dedup.NearDupIndex = {
    Dedup.saveNearDupIndex(
      currentNearDupIndex(spark, baseIndex, statePath), name, numBuckets)
    DeltaStaging.clear(spark, statePath)
    Dedup.loadNearDupIndex(spark, name)
  }
}
