package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession

import graft.operators.Kmv

/** Streaming KMV/theta sketch — the incrementally-maintained form of
  * [[graft.operators.Kmv]]: each micro-batch's bottom-k hashes fold into
  * the staged prefix, so distinct / union / INTERSECTION estimates (join
  * the current sketch against any other store's) cover everything ever
  * ingested without re-touching history. Like [[StreamingHll]] the merge
  * is exact and IDEMPOTENT (the k smallest of a union — re-folding the
  * same hashes changes nothing), so the streamed sketch equals the batch
  * sketch over everything seen bit-for-bit, replay included.
  *
  * State discipline = [[StreamingPca]] prefix-merge: each staging holds
  * the FULL merged sketch up to its batch id (≤ groups × k rows — bounded
  * by construction); only stagings `id` and `id−1` are ever live.
  * Per-trigger cost: one bottom-k pass over the batch + one k-row merge. */
object StreamingKmv {

  /** Latest committed sketch (None before the first trigger) — feed to
    * [[graft.operators.Kmv.estimate]] / [[graft.operators.Kmv
    * .intersectEstimate]] or merge with other stores. */
  def currentSketch(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** Attach the incremental sketch to a streaming DataFrame. After each
    * trigger, `sink` receives the refreshed `(keys*, _h)` sketch (read
    * back from the COMMITTED staging) and the batch id. */
  def attach(
      df: DataFrame, keys: Seq[String], valueCol: String, k: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val delta = Kmv.sketch(batch, keys, valueCol, k)
        val merged = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => Kmv.merge(delta, DeltaStaging.read(spark, statePath, b), keys, k))
          .getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        sink(DeltaStaging.read(spark, statePath, id), id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
