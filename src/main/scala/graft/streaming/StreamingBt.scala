package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession

import graft.operators.Experiment

/** Streaming Bradley–Terry — the live preference leaderboard: each
  * micro-batch of `(winner, loser)` trials folds its directed pair counts
  * (the model's SUFFICIENT statistic — [[graft.operators.Experiment
  * .pairCounts]]) into the staged prefix, and the MM fit is re-run on the
  * folded frame, so the streamed fit equals the batch fit over everything
  * seen EXACTLY: counts add, the fit is a pure function of the counts.
  *
  * State discipline = [[StreamingCms]]: the sum-fold is associative but
  * NON-idempotent, so replay safety comes purely from batch-id staging —
  * a replayed batch rewrites its own staging on top of the same prefix
  * instead of double-counting. State is the pair-count frame: items² rows
  * at worst, independent of how many trials have streamed. Per-trigger
  * cost: one map-side-combined count over the batch + one
  * pair-frame-sized fold + the MM fit over broadcast item-sized frames
  * — never a re-scan of history. */
object StreamingBt {

  /** Latest committed pair-count frame (None before the first trigger) —
    * feed to [[graft.operators.Experiment.bradleyTerryFromCounts]] or
    * merge with other stores. */
  def currentCounts(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** Attach the incremental fit to a streaming DataFrame of trials. After
    * each trigger, `sink` receives the refreshed `(item, n_wins, n_games,
    * bt_strength)` leaderboard (fit on the COMMITTED staging) and the
    * batch id. */
  def attach(
      df: DataFrame, winnerCol: String, loserCol: String, iters: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val delta = Experiment.pairCounts(batch, winnerCol, loserCol)
        val merged = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => Experiment.mergePairCounts(
            delta, DeltaStaging.read(spark, statePath, b)))
          .getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        sink(
          Experiment.bradleyTerryFromCounts(
            DeltaStaging.read(spark, statePath, id), iters),
          id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
