package graft.tools

import graft.GraftSession
import graft.operators.Dedup

/** Scratch end-to-end timer for d02_minhash_lsh (dev tooling, not library
  * surface). */
object ProfileD02 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("local[32]")
    val skew = new TaskSkewListener
    spark.sparkContext.addSparkListener(skew)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      skew.reset()
      val t0 = System.nanoTime()
      val q = Dedup.minHashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      val n = q.count()
      println(f"[profile] d02 run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s, pairs = $n")
      skew.print("[profile]  ")
      if (i == 2) {
        val plan = q.queryExecution.executedPlan.toString
        println("[plan-joins] " + plan.linesIterator.filter(l =>
          l.contains("Join") || l.contains("Exchange") || l.contains("Sort ") ||
          l.contains("InMemory")).map(_.trim.take(120)).mkString("\n[plan-joins] "))
      }
    }
    spark.stop()
  }
}
