package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Pca

/** Streaming PCA — EXACT incremental fitting over an embedding stream, not
  * an approximation: each micro-batch folds into the Gram moment buffer
  * ([[graft.operators.Pca.moments]]), which merges EXACTLY
  * ([[graft.operators.Pca.mergeState]] — sums of sums), so the model after
  * every trigger equals a batch [[graft.operators.Pca.fit]] over everything
  * seen (spec-pinned). The streaming counterpart of the frozen-model
  * attaches ([[StreamingDsir]], [[StreamingClassify]]) with the opposite
  * contract: those SCORE against a frozen model, this TRAINS the model
  * incrementally.
  *
  * Per-trigger cost ∝ batch (one aggregate pass over the batch's vectors;
  * the merge is driver-side on two O(d²) arrays). State is ONE moment
  * buffer persisted at `statePath` (KBs) — restart-safe: a resumed query
  * reloads it and continues folding, and because foreachBatch may REPLAY
  * the last batch after a crash, the state write is staged per batch id
  * (`statePath/_batch=<id>`): re-processing batch `id` rebuilds from the
  * highest staging STRICTLY BELOW `id` and overwrites its own staging
  * rather than double-counting (the [[DurableState]] idempotence
  * discipline). Stagings older than `id − 1` are pruned after each
  * successful save — the replay window only ever needs the previous one —
  * so state storage is bounded at two tiny files regardless of stream
  * lifetime. All paths go through the Hadoop FileSystem API (like
  * [[DurableState]]), so `statePath` may live on HDFS/S3, not just the
  * local disk. */
object StreamingPca {

  // staging layout/listing/purge are [[DeltaStaging]]'s (the PAYLOAD
  // differs — each staging here is a PREFIX-merge, not a delta, which is
  // why deltasBelow/allDeltas are never used and only the last two
  // stagings survive pruning)

  /** Latest merged state across all committed batch stagings (highest batch
    * id wins — each staging holds the PREFIX-merge up to its id). */
  def currentState(spark: SparkSession, statePath: String): Option[Pca.GramBuf] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => Pca.loadState(spark, DeltaStaging.dir(statePath, b)))

  /** Attach the incremental fit to a streaming DataFrame carrying `vecCol`.
    * After each trigger, `sink` receives the refreshed k-component model
    * and the batch id. */
  def attach(
      docs: DataFrame, vecCol: String, k: Int,
      statePath: String, checkpoint: String)(
      sink: (Pca.PcaModel, Long) => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: a query restarted with a FRESH checkpoint
        // (batch ids reset to 0) but the same statePath would otherwise
        // leave the prior run's stagings in place until the new run's ids
        // caught up — at which point a stale `_batch=N` would be silently
        // chosen as the merge base, double-counting the previous
        // incarnation. Stagings at or above the current id can only come
        // from a prior incarnation (a replay's own staging is rewritten
        // below anyway), so they are purged before the base is chosen.
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        // replay safety: the prefix is the highest staging STRICTLY BELOW
        // this id — a replayed batch rebuilds from the same base and
        // overwrites its own staging instead of double-counting
        val base = DeltaStaging.stagedIds(spark, statePath).filter(_ < id)
          .maxOption
          .map(b => Pca.loadState(spark, DeltaStaging.dir(statePath, b)))
          .getOrElse(Pca.GramBuf(0L, Array.empty, Array.empty))
        val merged = Pca.mergeState(base, Pca.moments(batch, vecCol))
        Pca.saveState(spark, merged, DeltaStaging.dir(statePath, id))
        DeltaStaging.assertCommitted(spark, statePath, id)
        // bound storage: only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        if (merged.n > 0) sink(Pca.fitFromMoments(merged, k), id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
