package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Profiling

/** Ingest-time seasonal-residual monitor — the streaming twin of t45's
  * [[graft.operators.Profiling.seasonalProfile]], under the frozen-model
  * discipline of StreamingDrift/StreamingClassify/StreamingDsir: the
  * (key, day-of-week, hour-of-day) moment registers are fit ONCE on a
  * reference corpus and every micro-batch is scored against them, so an
  * alarm means "this hour's values deviate from what THIS hour normally
  * looks like", not "Saturday differs from Tuesday" — the false page the
  * q49 rolling z-score cannot avoid at ingest.
  *
  * The residual test is the same all-integer `(n·v−S)² > k²(nQ−S²)` branch
  * as the batch operator — per-row exact, no drift between the monitor and
  * the t45 report it escalates to. Per-trigger cost: one broadcast join of
  * the batch against the ≤ keys × 168-row register frame + one aggregate;
  * no state beyond the frozen frame. Batch rows in buckets the reference
  * never saw are counted separately (`n_unseen`) rather than silently
  * passed — a schedule the profile has no opinion on is itself a signal. */
object StreamingSeasonal {

  /** Score one (micro-)batch against frozen registers: per key,
    * `(keys*, n_scored, n_outliers, n_unseen)`. Also the batch-parity
    * surface the spec pins. */
  def score(
      batch: DataFrame, frozen: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, sigmaK: Int): DataFrame = {
    val bkeys = keys ++ Seq("dow", "hod")
    Profiling.seasonalBuckets(batch, keys, tsCol, valueCol)
      .join(broadcast(frozen), bkeys, "left")
      .withColumn("_isout",
        col("n").isNotNull && Profiling.seasonalOutlierFlag(sigmaK))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(when(col("n").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("_isout"), 1L).otherwise(0L)).as("n_outliers"),
        sum(when(col("n").isNull, 1L).otherwise(0L)).as("n_unseen"))
  }

  /** Attach the monitor to a streaming DataFrame. `frozen` must be the
    * [[graft.operators.Profiling.seasonalRegisters]] frame (materialized —
    * it is read every trigger). `sink` receives the per-key score frame and
    * the batch id each trigger. */
  def attach(
      df: DataFrame, frozen: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, sigmaK: Int, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        sink(score(batch, frozen, keys, tsCol, valueCol, sigmaK), id))
      .option("checkpointLocation", checkpoint)
      .start()
}
