package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Compaction

/** Streaming SCD Type-2 maintenance — the reference's IMTU lifecycle
  * (`…/dodetl/imtu/InMemoryTableUpdater.scala:106-215` tails CDC and
  * `DatabaseManager.scala:52-62` MERGEs newest-wins, destroying history)
  * upgraded to keep history: each micro-batch folds into a durable
  * per-(key, ts) version log, and the validity-interval table is refreshed
  * incrementally — ONLY the keys the batch touched are closed/reopened.
  *
  * Late data is the whole point of the design: a late CDC row lands in the
  * middle of its key's history, the re-collapse puts it in ts order, and
  * the interval pass re-derives that key's intervals — the previously open
  * (or too-wide) interval closes at the late row's timestamp and a new one
  * opens, while every untouched key's intervals are not even read. That is
  * what a MERGE-based SCD2 loader (close current row, insert new) cannot
  * do without a compensating backfill query.
  *
  * State discipline = [[StreamingKll]]/[[StreamingHll]] prefix-merge: each
  * staging holds the FULL collapsed version log up to its batch id (rows =
  * distinct (key, version-ts) pairs — dimension-history-sized, never
  * fact-sized), only stagings `id` and `id−1` are ever live, and a fresh
  * incarnation purges ids at or above its own before merging. The
  * same-(key, ts) collapse is an associative struct max, so the fold is a
  * pure function of (prefix, batch): replaying a batch id rebuilds the
  * byte-identical staging, and the streamed log equals the batch
  * expression [[Compaction.scd2]] run over everything seen — parity pinned
  * per trigger in StreamingScd2Spec.
  *
  * Per-trigger cost: one map-side-combined collapse of the BATCH, one
  * union+re-collapse scan of the staged log (no window), and the lead()
  * interval pass over ONLY the affected keys' versions. */
object StreamingScd2 {

  /** The full validity-interval table derived from the latest committed
    * version log (None before the first trigger) — the batch-equivalent
    * readout, for bootstrap or audit. Incremental consumers should apply
    * the per-trigger sink deltas instead. */
  def currentIntervals(
      spark: SparkSession, statePath: String, keys: Seq[String],
      tsCol: String, payload: Seq[String], opCol: Option[String] = None,
      deleteOp: String = "D"): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption.map { b =>
      Compaction.versionIntervals(
        DeltaStaging.read(spark, statePath, b), keys, tsCol, payload,
        opCol, deleteOp)
    }

  /** Attach incremental SCD2 maintenance to a streaming CDC DataFrame.
    * After each trigger, `sink` receives `(refreshed, affectedKeys, id)`:
    * the interval rows for EXACTLY the keys this batch touched (read back
    * from the COMMITTED staging — replay-safe) plus those keys themselves.
    * The external table update is delete-where-key-in-affected, then
    * insert `refreshed` — idempotent per batch id, the
    * [[DimensionMaintainer]] upsert contract with history.
    *
    * Tie-break/tombstone contracts are [[Compaction.scd2]]'s; `seqCol`
    * (the CDC offset) makes same-timestamp collapse last-writer-wins
    * ACROSS batches too — the struct max is associative, so a writer
    * arriving one trigger later still loses to a higher offset already
    * staged. */
  def attach(
      df: DataFrame, keys: Seq[String], tsCol: String,
      payload: Seq[String], statePath: String, checkpoint: String,
      seqCol: Option[String] = None, opCol: Option[String] = None,
      deleteOp: String = "D")(
      sink: (DataFrame, DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val delta = Compaction.collapseVersions(
          batch, keys, tsCol, payload, seqCol, opCol)
        val merged = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => DeltaStaging.read(spark, statePath, b)
            .unionByName(delta)
            .groupBy((keys :+ tsCol).map(col): _*)
            .agg(max(col("_w")).as("_w")))
          .getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        val affected = delta.select(keys.map(col): _*).distinct()
        val refreshed = Compaction.versionIntervals(
          DeltaStaging.read(spark, statePath, id)
            .join(affected, keys, "left_semi"),
          keys, tsCol, payload, opCol, deleteOp)
        sink(refreshed, affected, id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
