package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** d13 phase attribution (dev tooling): split the incremental near-dup
  * wall into index build (prep + persist + count) vs probe, at 1x and a
  * scaled dir, to locate the round-9 soak's superlinear growth (stage CPU
  * totals were far below wall × cores — the suspicion is driver/broadcast
  * serialization, which per-stage task timings cannot see). */
object ProfileD13 {
  def main(args: Array[String]): Unit = {
    val dirArgs = args.filterNot(_.startsWith("--")).toSeq
    val dirs = if (dirArgs.nonEmpty) dirArgs
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scale10x")
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")

    for (dir <- dirs; bcast <- Seq(true, false); round <- 1 to 2) {
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      val batch = docs0.filter(col("doc_id") % 10 === 0)
      val corpus = docs0.filter(col("doc_id") % 10 =!= 0)
      var t = System.nanoTime()
      val idx = Dedup.buildNearDupIndex(corpus, "doc_id", "text").persisted()
      val tBuild = (System.nanoTime() - t) / 1e9
      t = System.nanoTime()
      val pairs = Dedup.probeNearDup(
        idx, batch, "doc_id", "text", 0.5, broadcastCandidates = bcast)
      pairs.write.format("noop").mode(SaveMode.Overwrite).save()
      val tProbe = (System.nanoTime() - t) / 1e9
      t = System.nanoTime()
      val n = Dedup.probeNearDup(
        idx, batch, "doc_id", "text", 0.5, broadcastCandidates = bcast).count()
      val tProbe2 = (System.nanoTime() - t) / 1e9
      idx.unpersisted()
      println(f"[d13-prof] $dir bcast=$bcast round=$round build=$tBuild%6.2f s " +
        f"probe1=$tProbe%6.2f s probe2=$tProbe2%6.2f s pairs=$n")
      spark.catalog.clearCache()
      if (args.contains("--gc")) { System.gc(); Thread.sleep(2000) }
    }
    spark.stop()
  }
}
