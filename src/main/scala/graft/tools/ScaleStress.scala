package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

/** Scale-stress experiment (dev tooling): replicate the sf0.1 documents N×
  * with distinct ids and run the near-dup pipeline — observe how wall time
  * scales with corpus size (the 100 TB question, answered empirically at the
  * scales this box allows). Replication multiplies every duplicate cluster,
  * so candidate pairs grow ~N², making this a WORST-case scaling probe. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.build("local[32]")
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val n0 = base.count()
    val docs = (0 until factor).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionByName _)
    println(s"[stress] corpus: ${n0 * factor} docs (${factor}x sf0.1)")
    val t0 = System.nanoTime()
    val n = Dedup.minHashLshPairs(docs, "doc_id", "text", threshold = 0.5).count()
    println(f"[stress] d02 at ${factor}x: ${(System.nanoTime() - t0) / 1e9}%8.2f s, pairs = $n")
    spark.stop()
  }
}
