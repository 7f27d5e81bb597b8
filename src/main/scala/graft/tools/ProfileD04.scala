package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Scratch end-to-end timer + plan dump for d04_ngram_jaccard (dev tooling,
  * not library surface): times cold + warm runs and prints the join/exchange
  * skeleton of the executed plan, to see whether the payload-attach joins
  * broadcast or degrade to sort-merge. */
object ProfileD04 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("local[32]")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[profile] docs = ${docs.count()}")
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val q = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq(lit(1)), 0.4)
      val n = q.count()
      println(f"[profile] d04 run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s, pairs = $n")
      if (i == 2) {
        val plan = q.queryExecution.executedPlan.toString
        println("[plan] " + plan.linesIterator.filter(l =>
          l.contains("Join") || l.contains("Exchange") || l.contains("Sort ") ||
          l.contains("InMemory")).map(_.trim.take(140)).mkString("\n[plan] "))
      }
    }
    spark.stop()
  }
}
