package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** F6/T3 — missing-dimension-data buffering: events whose dimension rows have
  * not arrived yet are held back and re-emitted once they match, instead of
  * being emitted unenriched or dropped.
  *
  * Reference: `missingDataList` buffers (event, missing-tables) pairs and the
  * stream head drains entries whose tables have caught up
  * (`…/dodetl/imtu/InMemoryTableUpdaterManager.scala:19,67-78`, drain at
  * `…/dodetl/stp/BeamStreamProcessor.scala:56-61`, detection `:83-98`).
  *
  * The buffer is a [[DurableState]] frame swapped per micro-batch: lineage is
  * bounded, and with a `stateDir` (pass `<checkpoint>/buffer`) the parked
  * events survive a process restart — by default every swap spills, so a
  * restart loses nothing but the in-flight batch, which the checkpoint
  * replays. Events whose key never arrives stay buffered — bound that with a
  * retention policy ([[graft.operators.OnDemand.retainWithin]]) at the call
  * site, as the reference intended (its retention was stubbed).
  */
final class LateDataBuffer(
    spark: SparkSession, schema: StructType,
    stateDir: Option[String] = None,
    spillEvery: Int = 1) {

  private val state = new DurableState(spark, schema, stateDir, spillEvery)

  def current: DataFrame = state.current

  /** Replace the buffer contents (the still-unmatched rows of this batch).
    * Call only AFTER the batch's ready rows are emitted/materialized — the
    * swap retires the previous buffer frame this batch's plans read from
    * ([[Pipeline.operationalQueryBuffered]] orders this correctly). */
  def replaceWith(stillMissing: DataFrame): Unit = state.swap(_ => stillMissing)
}
