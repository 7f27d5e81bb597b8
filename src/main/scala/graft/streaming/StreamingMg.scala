package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession

import graft.operators.Mg

/** Streaming Misra-Gries heavy hitters — the BOUNDED-STATE replacement for
  * [[StreamingTopTerms]] on adversarial vocabularies: that operator's
  * carried state is the full token vocabulary (exact, but growable without
  * bound by hostile input); this one folds each micro-batch's MG summary
  * into a ≤ (k+1)-rows-per-group prefix, so state is capped FOREVER at the
  * cost of the declared bracket `w ≤ true ≤ w + err`, `err ≤ Σᵢ nᵢ/(k+1)`
  * over the triggers seen. Per-trigger cost: one map-side-combined count
  * over the batch (∝ batch vocabulary) + a ≤ 2(k+1)-row merge.
  *
  * State discipline = [[StreamingHll]] prefix-merge: each staging holds the
  * FULL summary up to its batch id; only stagings `id` and `id−1` are ever
  * live, and a fresh incarnation purges ids at or above its own before
  * merging. The fold is a pure function of (prefix, batch) — replay
  * rebuilds the identical staging. */
object StreamingMg {

  /** Latest committed summary frame (None before the first trigger) —
    * feed to [[graft.operators.Mg.estimate]] or merge with other stores
    * built with the SAME k. */
  def currentState(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** Attach the incremental summary to a streaming DataFrame. After each
    * trigger, `sink` receives the refreshed per-group heavy-item report
    * `(keys*, item, w_min, w_max, n, err_budget)` (read back from the
    * COMMITTED staging) and the batch id. */
  def attach(
      df: DataFrame, keys: Seq[String], itemCol: String, k: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val delta = Mg.summarize(batch, keys, itemCol, k)
        val merged = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => Mg.merge(
            delta, DeltaStaging.read(spark, statePath, b), keys, k))
          .getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        sink(
          Mg.estimate(DeltaStaging.read(spark, statePath, id), keys), id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
