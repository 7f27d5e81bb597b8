package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession

import graft.operators.Hll

/** Streaming grouped distinct-count sketch — the incrementally-maintained
  * form of [[graft.operators.Hll.distinctSketch]]: each micro-batch folds
  * its register delta into the staged prefix and emits refreshed per-group
  * estimates. Because the HLL merge is EXACT (a max over integer registers
  * — associative, commutative, idempotent), the streamed sketch equals the
  * batch sketch over everything seen bit-for-bit, replay included: a
  * re-run batch max-folds the same registers into the same prefix.
  *
  * State discipline = [[StreamingPca]] prefix-merge (not the index-delta
  * form): each staging holds the FULL merged register frame up to its
  * batch id — register frames are `groups × ≤2^p` rows, so staging the
  * whole fold is cheaper than re-unioning a growing delta chain — only
  * stagings `id` and `id−1` are ever live, and a fresh incarnation purges
  * ids at or above its own before merging. Per-trigger cost: one
  * map-side-combined aggregate over the batch + one register-frame-sized
  * merge. State never grows with the stream. */
object StreamingHll {

  /** Latest committed register frame (None before the first trigger) —
    * feed to [[graft.operators.Hll.estimate]] or merge with other stores. */
  def currentRegisters(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** Attach the incremental sketch to a streaming DataFrame. After each
    * trigger, `sink` receives the refreshed `(keys*, hll_distinct)`
    * estimates (read back from the COMMITTED staging) and the batch id. */
  def attach(
      df: DataFrame, keys: Seq[String], valueCol: String, p: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val delta = Hll.registers(batch, keys, valueCol, p)
        val merged = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => Hll.merge(delta, DeltaStaging.read(spark, statePath, b), keys))
          .getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        sink(
          Hll.estimate(DeltaStaging.read(spark, statePath, id), keys, p), id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
