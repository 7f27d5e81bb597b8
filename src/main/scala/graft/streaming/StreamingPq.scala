package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Pq

/** Self-extending ingest-time PQ retrieval — the compressed-codes member
  * of the self-extending ANN family ([[StreamingSimilarity
  * .attachIvfSelfExtending]] keeps raw vectors; this keeps m-int code
  * words): each micro-batch of vectors is ADC-probed against the base
  * codes PLUS every earlier batch's, then ENCODED with the frozen
  * codebook and folded into the staged code state — so a vector ingested
  * in trigger 1 is retrievable by a trigger-2 probe without a restart,
  * and the growing state costs m ints per vector, not d floats.
  *
  * Mechanics per trigger ([[DeltaStaging]], the shared discipline): purge
  * stagings ≥ id; [[Pq.encode]] the batch against the FROZEN codebook
  * (broadcast fold, rows never move); stage the codes at
  * `statePath/_batch=<id>`; probe the batch against base ∪ deltas
  * STRICTLY BELOW id. Replay rewrites the same staging and probes the
  * same state → sink output idempotent by batch id; a fresh incarnation
  * starts clean. The codebook is never refit mid-stream (recall degrades
  * only with distribution drift — refit with [[Pq.fit]] and re-encode
  * between restarts when it does). Within-batch neighbors do not pair;
  * ids must be unique across base + stream. */
object StreamingPq {

  /** The retrievable code state as of the latest committed staging:
    * base ∪ all staged deltas. */
  def currentCodes(
      spark: SparkSession, statePath: String, baseCodes: DataFrame): DataFrame =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .flatMap(last => DeltaStaging.deltasBelow(spark, statePath, last + 1))
      .fold(baseCodes)(d => baseCodes.unionByName(d))

  /** Attach the self-extending ADC probe: `sink` receives `(q_id, rank,
    * <idCol>, adc_dist2)` per trigger — retrieved ids may name base-corpus
    * vectors or earlier stream vectors — and the batch id. */
  def attachSelfExtending(
      vectors: DataFrame, cb: Pq.Codebook, baseCodes: DataFrame,
      idCol: String, qIdCol: String, qVecCol: String, k: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        // stage under the BASE frame's column names so deltas union by name
        DeltaStaging.stage(
          Pq.encode(
            batch.select(col(qIdCol).as(idCol), col(qVecCol)),
            idCol, qVecCol, cb),
          statePath, id)
        val codes = DeltaStaging.deltasBelow(spark, statePath, id)
          .fold(baseCodes)(d => baseCodes.unionByName(d))
        sink(Pq.adcTopK(cb, codes, idCol, batch, qIdCol, qVecCol, k), id)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
