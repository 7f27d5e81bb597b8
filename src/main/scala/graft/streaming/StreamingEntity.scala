package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Streaming entity resolution — ingestion-time record LINKAGE of each
  * micro-batch against a master table ([[graft.operators.Dedup.entityLink]]
  * per trigger): the MDM front door. Every incoming record either matches
  * an existing master record (the emitted pair carries the per-field sims
  * + score for survivorship logic downstream) or is a NEW entity.
  *
  * Two modes:
  *  - frozen master (`extend = false`): the [[StreamingClassify]]/
  *    [[StreamingDecontam]] frozen-model discipline — stateless beyond
  *    the master frame, per-trigger cost = one blocked link of the batch.
  *  - self-extending (`extend = true`): the [[StreamingDedup]] discipline
  *    — batch N also links against batches 1..N−1's records (an entity
  *    that first appeared mid-stream catches its later duplicates), and
  *    the accumulated new-record store rides [[DeltaStaging]]: a replayed
  *    batch id rewrites its own staging (no double-append), a fresh
  *    incarnation purges forward state. Batch N's own records are NOT in
  *    the store it probes (no self-pairs); they join it afterwards.
  *
  * Per-trigger cost: the batch-side blocked join only — the store side is
  * rows ∝ master + stream-so-far, but candidates are generated per block
  * key, so a batch only touches the blocks it lands in (the d20/d04
  * blocking discipline; a hot block is quadratic in ITS size only). */
object StreamingEntity {

  /** Accumulated new-record store (None before the first extend-mode
    * trigger). */
  def currentStore(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** Attach per-trigger linkage. After each trigger, `sink` receives the
    * batch's match pairs (`a_id` = incoming record, `b_id` = master or
    * earlier-stream record, per-field sims, score) and the batch id. The
    * probe and store frames must carry the similarity fields under the
    * same names; id namespaces must not collide across them.
    *
    * `checkpoint` is REQUIRED and therefore precedes every defaulted
    * parameter (round-14 advice: trailing it behind six defaults forced
    * by-name calls and let a positional string silently bind to
    * statePath). */
  def attach(
      df: DataFrame, master: DataFrame, idCol: String,
      blockCols: Seq[Column], checkpoint: String,
      editFields: Seq[(String, Double)] = Nil,
      jaccardFields: Seq[(String, Double)] = Nil,
      exactFields: Seq[(String, Double)] = Nil,
      closeFields: Seq[(String, Double)] = Nil,
      threshold: Double = 0.8, maxEdit: Int = 20,
      extend: Boolean = false, statePath: String = "")(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(!extend || statePath.nonEmpty,
      "extend = true needs a statePath for the accumulated store")
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        val storeNow =
          if (!extend) master
          else {
            DeltaStaging.purgeAtOrAbove(spark, statePath, id)
            DeltaStaging.stagedIds(spark, statePath)
              .filter(_ < id).maxOption
              .map(b => master.unionByName(
                DeltaStaging.read(spark, statePath, b)))
              .getOrElse(master)
          }
        val pairs = Dedup.entityLink(batch, storeNow, idCol, blockCols,
          editFields, jaccardFields, exactFields, closeFields,
          threshold, maxEdit)
          // pair frame consumed by the sink AND (in extend mode) raced
          // against the store rewrite — pin it
          .localCheckpoint(true)
        if (extend) {
          val newStore = DeltaStaging.stagedIds(spark, statePath)
            .filter(_ < id).maxOption
            .map(b => DeltaStaging.read(spark, statePath, b)
              .unionByName(batch.select(master.columns.map(c =>
                org.apache.spark.sql.functions.col(c)): _*)))
            .getOrElse(batch.select(master.columns.map(c =>
              org.apache.spark.sql.functions.col(c)): _*))
          DeltaStaging.stage(newStore, statePath, id)
          DeltaStaging.purgeBelow(spark, statePath, id - 1)
        }
        sink(pairs, id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
