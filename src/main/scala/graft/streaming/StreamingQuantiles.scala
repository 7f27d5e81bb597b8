package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession

import graft.operators.QDigest

/** Streaming grouped quantile sketch — the incrementally-maintained form of
  * [[graft.operators.QDigest]]: each micro-batch builds its own compressed
  * register delta and q-digest-merges it into the staged prefix, emitting
  * refreshed per-group quantile estimates. The merge preserves counts
  * bit-exactly and its rank slack is ADDITIVE over constituents
  * (≤ `bits·Σᵢ⌊nᵢ/k⌋` after any number of triggers — still ε-relative,
  * since Σ⌊nᵢ/k⌋ ≤ n/k), so the streamed sketch is a valid q-digest of
  * everything seen; unlike [[StreamingHll]] the fold is not bit-identical
  * to the one-shot batch build (compression is deterministic but not
  * structurally associative) — parity is therefore asserted on the declared
  * contract (count, size ≤ 3k, slack bound), and REPLAY determinism is
  * exact: re-running a batch id rebuilds the identical staging because the
  * fold is a pure function of (prefix, batch).
  *
  * State discipline = [[StreamingHll]] prefix-merge: each staging holds the
  * FULL merged register frame up to its batch id (≤ groups × 3k rows —
  * cheaper to re-stage whole than to chain deltas); only stagings `id` and
  * `id−1` are ever live, and a fresh incarnation purges ids at or above its
  * own before merging. Per-trigger cost: one map-side-combined leaf
  * aggregate over the batch + `bits` window rounds over the register-sized
  * frame. State never grows with the stream. */
object StreamingQuantiles {

  /** Latest committed register frame (None before the first trigger) —
    * feed to [[graft.operators.QDigest.estimate]] or merge with other
    * stores built over the SAME (lo, hi, bits) universe. */
  def currentRegisters(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** Attach the incremental sketch to a streaming DataFrame. After each
    * trigger, `sink` receives the refreshed per-group quantile estimates
    * `(keys*, n, <name>_leaf, <name>, …)` (read back from the COMMITTED
    * staging) and the batch id. */
  def attach(
      df: DataFrame, keys: Seq[String], valueCol: String,
      lo: Double, hi: Double, bits: Int, k: Int,
      qs: Seq[(String, Double)], statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val delta = QDigest.registers(batch, keys, valueCol, lo, hi, bits, k)
        val merged = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => QDigest.merge(
            delta, DeltaStaging.read(spark, statePath, b), keys, bits, k))
          .getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        sink(
          QDigest.estimate(
            DeltaStaging.read(spark, statePath, id), keys, bits, lo, hi, qs),
          id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
