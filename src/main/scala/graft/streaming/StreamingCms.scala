package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession

import graft.operators.Cms

/** Streaming grouped frequency sketch — the incrementally-maintained form
  * of [[graft.operators.Cms]]: each micro-batch folds its register delta
  * into the staged prefix, so point estimates cover everything EVER
  * ingested without re-touching history. The CMS merge is exact,
  * associative and commutative but NOT idempotent (counts add), so unlike
  * [[StreamingHll]] the replay guarantee leans entirely on the
  * [[DeltaStaging]] discipline: a re-run batch purges its own staging
  * first and re-sums its delta into the `id−1` prefix — which never
  * contained this batch — exactly once.
  *
  * State discipline = [[StreamingPca]] prefix-merge: each staging holds
  * the FULL summed register frame up to its batch id (≤ groups × depth ×
  * width rows — bounded by construction, it never grows with the stream);
  * only stagings `id` and `id−1` are ever live. Per-trigger cost: one
  * map-side-combined aggregate over the batch + one register-frame-sized
  * merge. */
object StreamingCms {

  /** Latest committed register frame (None before the first trigger) —
    * feed to [[graft.operators.Cms.estimate]] or merge with other stores. */
  def currentRegisters(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** Attach the incremental sketch to a streaming DataFrame. After each
    * trigger, `sink` receives the refreshed register frame (read back from
    * the COMMITTED staging — probe it with [[graft.operators.Cms
    * .estimate]]) and the batch id. */
  def attach(
      df: DataFrame, keys: Seq[String], valueCol: String,
      depth: Int, width: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val delta = Cms.registers(batch, keys, valueCol, depth, width)
        val merged = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => Cms.merge(delta, DeltaStaging.read(spark, statePath, b), keys))
          .getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        sink(DeltaStaging.read(spark, statePath, id), id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
