package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession

import graft.operators.Kll

/** Streaming KLL quantile sketch — the incrementally-maintained form of
  * [[graft.operators.Kll]], and the unbounded-range companion to
  * [[StreamingQuantiles]]' q-digest (which requires a declared `[lo, hi)`
  * universe up front — exactly what an open-ended ingest can't give you):
  * each micro-batch builds its own compactor delta and KLL-merges it into
  * the staged prefix, emitting refreshed per-group quantile estimates over
  * everything seen.
  *
  * The fold conserves total weight bit-exactly (weight == true row count,
  * every trigger — pinned in StreamingKllSpec), and because every
  * compaction coin is md5-derived from (salt, bucket, level), the fold is
  * a PURE FUNCTION of (prefix, batch): re-running a batch id rebuilds the
  * byte-identical staging, and the streamed state equals the batch
  * expression `merge(registers(bₙ), … merge(registers(b₁), registers(b₀)))`
  * frame-for-frame — exact parity, not just contract parity. Rank slack is
  * additive over constituents (the mergeable-summaries argument): after any
  * number of triggers the estimate's true-rank error stays ≲ 4·n/k plus
  * one sweep per merge.
  *
  * State discipline = [[StreamingHll]]/[[StreamingQuantiles]] prefix-merge:
  * each staging holds the FULL merged compactor frame up to its batch id
  * (≤ groups × (k + levels) rows — cheaper to re-stage whole than to chain
  * deltas); only stagings `id` and `id−1` are ever live, and a fresh
  * incarnation purges ids at or above its own before merging. Per-trigger
  * cost: one narrow exchange of the BATCH (never the history) + kernel
  * sweeps over register-sized frames. State never grows with the stream. */
object StreamingKll {

  /** Latest committed compactor frame (None before the first trigger) —
    * feed to [[graft.operators.Kll.estimate]]/[[graft.operators.Kll.estRank]]
    * or merge with other stores built with the same k. */
  def currentRegisters(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** Attach the incremental sketch to a streaming DataFrame. After each
    * trigger, `sink` receives the refreshed per-group estimates
    * `(keys*, n, <name>, …)` (read back from the COMMITTED staging) and the
    * batch id. `mergeSweepRounds` must cover the deepest level the
    * accumulated stream can reach (`≳ log2(total/k) + 2`); a too-small
    * value only lets state exceed k per level, never corrupts estimates. */
  def attach(
      df: DataFrame, keys: Seq[String], valueCol: String, idCol: String,
      buckets: Int, k: Int, rounds: Int, mergeSweepRounds: Int,
      qs: Seq[(String, Double)], statePath: String, checkpoint: String,
      salt: String = "skll")(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val delta =
          Kll.registers(batch, keys, valueCol, idCol, buckets, k, rounds, salt)
        val merged = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => Kll.merge(
            delta, DeltaStaging.read(spark, statePath, b), keys, k,
            mergeSweepRounds, salt))
          .getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        sink(
          Kll.estimate(DeltaStaging.read(spark, statePath, id), keys, qs),
          id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
