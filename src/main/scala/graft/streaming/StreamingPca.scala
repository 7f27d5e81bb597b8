package graft.streaming

import org.apache.spark.sql.DataFrame
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
  * (`statePath/_batch=<id>`): re-processing a batch overwrites its own
  * staging rather than double-counting it (the same idempotence discipline
  * as [[DurableState]]).
  */
object StreamingPca {

  /** Latest merged state across all committed batch stagings (highest batch
    * id wins — each staging holds the PREFIX-merge up to its id). */
  def currentState(
      spark: org.apache.spark.sql.SparkSession, statePath: String): Option[Pca.GramBuf] = {
    val dir = new java.io.File(statePath)
    val stages = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("_batch="))
      .sortBy(f => -f.getName.stripPrefix("_batch=").toLong)
    stages.headOption.map(f => Pca.loadState(spark, f.getPath))
  }

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
        // replay safety: the prefix is the highest staging STRICTLY BELOW
        // this id — a replayed batch rebuilds from the same base and
        // overwrites its own staging instead of double-counting
        val base = stagedIds(statePath).filter(_ < id).maxOption
          .map(b => Pca.loadState(spark, s"$statePath/_batch=$b"))
          .getOrElse(Pca.GramBuf(0L, Array.empty, Array.empty))
        val merged = Pca.mergeState(base, Pca.moments(batch, vecCol))
        Pca.saveState(spark, merged, s"$statePath/_batch=$id")
        if (merged.n > 0) sink(Pca.fitFromMoments(merged, k), id)
      })
      .option("checkpointLocation", checkpoint)
      .start()

  private def stagedIds(statePath: String): Seq[Long] = {
    val dir = new java.io.File(statePath)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("_batch="))
      .map(_.getName.stripPrefix("_batch=").toLong)
      .toSeq
  }
}
