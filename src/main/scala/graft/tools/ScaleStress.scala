package graft.tools

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

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 2, 4))
    val spark = GraftSession.build("local[32]")
    val skew = new TaskSkewListener
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
      skew.print("[stress]  ", 5)
    }
    spark.stop()
  }
}
