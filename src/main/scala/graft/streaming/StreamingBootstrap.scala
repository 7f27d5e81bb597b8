package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession

import graft.operators.Experiment

/** Streaming Poisson-bootstrap confidence intervals — the incrementally-
  * maintained form of [[graft.operators.Experiment.poissonBootstrap]]:
  * because every row's replicate weights are a pure function of content
  * (md5 seed + Lehmer counter mix), the bootstrap state is just the
  * per-(group, replicate) partial sums `(Σ w·v, Σ w, Σ v, n)` — MERGEABLE
  * across any data split by plain addition — so a stream maintains the
  * exact same state a batch pass over the concatenation would build, and
  * every trigger can emit a refreshed CI over everything seen. This is the
  * live-metric readout ("mean quality score so far, with uncertainty")
  * that a resample-based bootstrap fundamentally cannot provide.
  *
  * State discipline = the [[StreamingKll]]/[[StreamingHll]] prefix-staging
  * recipe under [[DeltaStaging]]: each staging holds the FULL summed state
  * up to its batch id (groups × replicates rows), a replayed batch id
  * rewrites its own staging instead of double-adding, and a fresh
  * incarnation purges ids at or above its own. Per-trigger cost: the
  * batch's fused explode-weight-aggregate (shuffle = groups × replicates
  * partial rows, never the history) + an add-join of two state-sized
  * frames. State never grows with the stream.
  *
  * Parity with the batch operator is CONTRACT parity (like
  * StreamingQuantiles, unlike StreamingKll's bit parity): the partial sums
  * are doubles, so trigger-order addition can differ from batch-order
  * addition in the last ulp; the emitted means/CIs are 6 dp-rounded on
  * both paths, which absorbs it (spec-pinned on deterministic data).
  */
object StreamingBootstrap {

  private val SumCols = Seq("_pb_wv", "_pb_wn", "_pb_sv", "_pb_cnt")

  /** Latest committed per-(group, replicate) sums (None before the first
    * trigger) — feed to [[graft.operators.Experiment.bootstrapEstimate]]
    * or merge with other stores built with the same salt/replicates. */
  def currentSums(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** Attach the incremental bootstrap to a streaming DataFrame. After each
    * trigger, `sink` receives the refreshed per-group estimates
    * `(groupCols…, n, mean, ci_lo, ci_hi)` (computed from the COMMITTED
    * staging) and the batch id. `salt` and `replicates` must be held fixed
    * for the lifetime of the state. */
  def attach(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCols: Seq[String], replicates: Int, salt: String,
      statePath: String, checkpoint: String, level: Double = 0.95)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val delta = Experiment.replicateSums(
          batch, groupCols, valueCol, idCols, replicates, salt)
        val keys = groupCols :+ "_pb_r"
        val merged = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map { b =>
            // add-fold: union + sum is the whole merge — new groups and
            // new replicate rows appear, absent sides contribute nothing
            DeltaStaging.read(spark, statePath, b).unionByName(delta)
              .groupBy(keys.map(col): _*)
              .agg(sum(col(SumCols.head)).as(SumCols.head),
                SumCols.tail.map(c => sum(col(c)).as(c)): _*)
          }
          .getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        sink(
          Experiment.bootstrapEstimate(
            DeltaStaging.read(spark, statePath, id), groupCols, level),
          id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
