package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** F6/T3 — missing-dimension-data buffering: events whose dimension rows have
  * not arrived yet are held back and re-emitted once they match, instead of
  * being emitted unenriched or dropped.
  *
  * Reference: `missingDataList` buffers (event, missing-tables) pairs and the
  * stream head drains entries whose tables have caught up
  * (`…/dodetl/imtu/InMemoryTableUpdaterManager.scala:19,67-78`, drain at
  * `…/dodetl/stp/BeamStreamProcessor.scala:56-61`, detection `:83-98`).
  *
  * Here the buffer is a persisted keyed frame swapped per micro-batch (same
  * lineage-cutting discipline as [[DimensionMaintainer]]); each batch retries
  * `current ∪ newMisses`. Events whose key never arrives stay buffered —
  * bound it with a retention policy ([[graft.operators.OnDemand.retainWithin]])
  * at the call site, as the reference intended (its retention was stubbed).
  */
final class LateDataBuffer(spark: SparkSession, schema: StructType) {

  @volatile private var buf: DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      .persist(StorageLevel.MEMORY_AND_DISK)

  def current: DataFrame = buf

  /** Replace the buffer contents (the still-unmatched rows of this batch). */
  def replaceWith(stillMissing: DataFrame): Unit = synchronized {
    val next = stillMissing.persist(StorageLevel.MEMORY_AND_DISK)
    next.count()
    val old = buf
    buf = next
    old.unpersist(blocking = false)
  }
}
