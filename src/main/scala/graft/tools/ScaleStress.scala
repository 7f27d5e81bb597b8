package graft.tools

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Scale-stress experiment (dev tooling): replicate the sf0.1 documents N×
  * with distinct ids and run the near-dup pipeline — observe how wall time
  * AND per-stage task skew scale with corpus size (the 100 TB question,
  * answered empirically at the scales this box allows). Replication
  * multiplies every duplicate cluster, so candidate pairs grow ~N², making
  * this a WORST-case scaling probe.
  *
  * Two modes per factor:
  *  - `narrow` — `maxBroadcastDocs = 0` forces the scale path (narrow
  *    band join → pair-id repartition → attach), the plan a 100 TB corpus
  *    would run;
  *  - `direct` — the default gate (small corpora broadcast, one pipelined
  *    stage).
  *
  * Skew metric: max task duration / median task duration per stage, printed
  * for the heaviest stages. A ratio near 1 means no task serializes the
  * stage; the narrow path's whole point is keeping this flat as hot buckets
  * grow.
  */
object ScaleStress {

  private final class TaskSkew extends SparkListener {
    val durations: TrieMap[Int, ArrayBuffer[Long]] = TrieMap.empty
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val buf = durations.getOrElseUpdate(e.stageId, ArrayBuffer.empty)
      buf.synchronized { buf += e.taskInfo.duration }
    }
    def reset(): Unit = durations.clear()
    /** (stageId, nTasks, totalSec, maxMs, medianMs, ratio) for the heaviest
      * stages, by total task time. */
    def heaviest(n: Int): Seq[(Int, Int, Double, Long, Long, Double)] =
      durations.toSeq.map { case (sid, ds0) =>
        val ds = ds0.sorted
        val median = ds(ds.length / 2)
        (sid, ds.length, ds.sum / 1e3, ds.last, median,
          ds.last.toDouble / math.max(median, 1L))
      }.sortBy(-_._3).take(n)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 2, 4))
    val spark = GraftSession.build("local[32]")
    val skew = new TaskSkew
    spark.sparkContext.addSparkListener(skew)
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val n0 = base.count()

    for (factor <- factors; mode <- Seq("narrow", "direct")) {
      val docs = (0 until factor).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text"))
      }.reduce(_ unionByName _)
      spark.catalog.clearCache()
      skew.reset()
      val cap = if (mode == "narrow") 0L else Dedup.defaultMaxBroadcastDocs
      val t0 = System.nanoTime()
      val m = Dedup.minHashLshPairsManaged(
        docs, "doc_id", "text", threshold = 0.5, maxBroadcastDocs = cap)
      val pairs = m.result.count()
      val wall = (System.nanoTime() - t0) / 1e9
      m.close()
      println(f"[stress] d02 ${factor}x/$mode%-6s docs=${n0 * factor}%7d " +
        f"wall=$wall%7.2f s pairs=$pairs%6d")
      skew.heaviest(5).foreach { case (sid, nt, tot, mx, med, ratio) =>
        println(f"[stress]   stage $sid%4d tasks=$nt%4d total=$tot%8.1f s " +
          f"max=${mx / 1e3}%7.2f s median=${med / 1e3}%7.2f s max/med=$ratio%5.2f")
      }
    }
    spark.stop()
  }
}
