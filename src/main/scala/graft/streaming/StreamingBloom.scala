package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.operators.Bloom

/** Streaming Bloom membership — the incrementally-maintained form of
  * [[graft.operators.Bloom]], completing the streaming sketch-register
  * family ([[StreamingHll]] distinct / [[StreamingCms]] frequency /
  * [[StreamingKmv]] set-ops / [[StreamingQuantiles]] quantiles /
  * [[StreamingMg]] heavy hitters / membership). Because the Bloom merge is
  * EXACT (a bitwise OR over integer registers — associative, commutative,
  * idempotent), the streamed filter equals the batch filter over
  * everything seen bit-for-bit, replay included: a re-run batch OR-folds
  * the same registers into the same prefix.
  *
  * Two attaches:
  *  - [[attach]] — MAINTAIN a filter over the stream (the "seen before?"
  *    gate / day-over-day membership accumulator). State discipline =
  *    [[StreamingHll]] prefix-merge: each staging holds the FULL merged
  *    register frame up to its batch id (register frames are
  *    `groups × ≤ mBits/32` rows — staging the whole fold is cheaper than
  *    re-unioning a growing delta chain), only stagings `id` and `id−1`
  *    are ever live, and a fresh incarnation purges ids at or above its
  *    own before merging. Per-trigger cost: one map-side-combined
  *    aggregate over the batch + one register-frame-sized OR-fold. State
  *    never grows with the stream.
  *  - [[attachFilter]] — PROBE each micro-batch against a FROZEN register
  *    frame (ingest-time blocklist / decontamination gate). The bounded-
  *    state sibling of [[StreamingDecontam.attachNgram]]: that attach pins
  *    the reference's exact value set (vocabulary-sized — fine for
  *    benchmarks, fatal for a billion-key blocklist); this one pins
  *    `mBits/32` BIGINT words per group, KBs at any reference size, and
  *    answers with NO false negatives (a leak never slips through) at the
  *    declared `fill^k` false-positive rate (a clean row is occasionally
  *    re-reviewed — the cheap side of the asymmetry). Stateless per
  *    trigger. */
object StreamingBloom {

  /** Latest committed register frame (None before the first trigger) —
    * feed to [[graft.operators.Bloom.mightContain]]/[[graft.operators.Bloom.stats]]
    * or merge with other stores. */
  def currentRegisters(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** Attach the incremental filter to a streaming DataFrame. After each
    * trigger, `sink` receives the refreshed `(keys*, bits_set, fill_ratio,
    * est_inserted, est_fp_rate)` audit frame (read back from the COMMITTED
    * staging) and the batch id. */
  def attach(
      df: DataFrame, keys: Seq[String], valueCol: String, mBits: Int, k: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val delta = Bloom.registers(batch, keys, valueCol, mBits, k)
        val merged = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => Bloom.merge(delta, DeltaStaging.read(spark, statePath, b), keys))
          .getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        sink(
          Bloom.stats(DeltaStaging.read(spark, statePath, id), keys, mBits, k),
          id)
      })
      .option("checkpointLocation", checkpoint)
      .start()

  final case class Attached(query: StreamingQuery, artifact: DataFrame) {
    def unpersistArtifacts(): Unit = { artifact.unpersist(); () }
  }

  /** Probe each micro-batch's `valueCol` against the FROZEN `registers`
    * (built by [[graft.operators.Bloom.registers]] with the same
    * `keys`/`mBits`/`k`). `sink` receives the
    * `(idCols*, keys*, valueCol, might_contain)` frame and the batch id.
    * The register frame is pinned in executor storage at attach time;
    * per-trigger cost is one broadcast join + one combiner-absorbed fold
    * over the batch. Stop the query, then call `unpersistArtifacts`. */
  def attachFilter(
      df: DataFrame, registers: DataFrame, keys: Seq[String],
      idCols: Seq[String], valueCol: String, mBits: Int, k: Int,
      checkpoint: String)(
      sink: (DataFrame, Long) => Unit): Attached = {
    val regs = registers.persist(StorageLevel.MEMORY_AND_DISK)
    regs.count()
    Attached(
      df.writeStream
        .foreachBatch((batch: DataFrame, id: Long) =>
          sink(
            Bloom.mightContain(regs, batch, keys, idCols, valueCol, mBits, k),
            id))
        .option("checkpointLocation", checkpoint)
        .start(),
      regs)
  }
}
