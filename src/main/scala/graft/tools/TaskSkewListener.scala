package graft.tools

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shared dev-tool listener: per-stage task durations → max/median skew and
  * total CPU-time per stage (used by [[ScaleStress]] and [[ProfileD02]]). */
final class TaskSkewListener extends SparkListener {
  val durations: TrieMap[Int, ArrayBuffer[Long]] = TrieMap.empty
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val buf = durations.getOrElseUpdate(e.stageId, ArrayBuffer.empty)
    buf.synchronized { buf += e.taskInfo.duration }
  }
  def reset(): Unit = durations.clear()
  /** (stageId, nTasks, totalSec, maxMs, medianMs, ratio), heaviest first.
    * Snapshots each buffer under the same lock `onTaskEnd` appends with —
    * the listener bus is asynchronous, so late task events can still be
    * draining when a caller reads right after an action. */
  def heaviest(n: Int): Seq[(Int, Int, Double, Long, Long, Double)] =
    durations.toSeq
      .map { case (sid, ds0) => sid -> ds0.synchronized(ds0.toArray).sorted }
      .filter(_._2.nonEmpty) // bus may have registered a stage, no tasks yet
      .map { case (sid, ds) =>
      val median = ds(ds.length / 2)
      (sid, ds.length, ds.sum / 1e3, ds.last, median,
        ds.last.toDouble / math.max(median, 1L))
    }.sortBy(-_._3).take(n)
  def print(prefix: String, n: Int = 6): Unit =
    heaviest(n).foreach { case (sid, nt, tot, mx, med, ratio) =>
      println(f"$prefix stage $sid%4d tasks=$nt%4d total=$tot%8.1f s " +
        f"max=${mx / 1e3}%7.2f s median=${med / 1e3}%7.2f s max/med=$ratio%5.2f")
    }
}

/** Dev-tool listener: total shuffle bytes + records WRITTEN across tasks
  * since the last reset — the direct measure of exchange volume a
  * pre-shuffle filter (e.g. the Bloom probe) or a map-side combiner saves. */
final class ShuffleBytesListener extends SparkListener {
  private var total = 0L
  private var recs = 0L
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) this.synchronized {
      total += m.shuffleWriteMetrics.bytesWritten
      recs += m.shuffleWriteMetrics.recordsWritten
    }
  }
  def reset(): Unit = this.synchronized { total = 0L; recs = 0L }
  def bytes: Long = this.synchronized(total)
  def records: Long = this.synchronized(recs)
}

/** Dev-tool listener: total INPUT bytes + records READ across tasks since
  * the last reset — the direct measure of what a storage layout (row-group
  * pruning, file skipping) saves a scan. */
final class InputBytesListener extends org.apache.spark.scheduler.SparkListener {
  private var total = 0L
  private var recs = 0L
  override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) this.synchronized {
      total += m.inputMetrics.bytesRead
      recs += m.inputMetrics.recordsRead
    }
  }
  def reset(): Unit = this.synchronized { total = 0L; recs = 0L }
  def bytes: Long = this.synchronized(total)
  def records: Long = this.synchronized(recs)
}
