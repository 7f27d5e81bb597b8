package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

/** Per-copy candidate counts inside a replica dir. */
object CandCount2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val copies = args(1).toInt
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (k <- 0 until copies) {
      val d = docs.filter(col("doc_id") >= k * 5000L &&
        col("doc_id") < (k + 1) * 5000L)
      val base = d.repartition(32).select(col("doc_id").as("_id"),
        Dedup.hashedShingles(col("text"), 5).as("_hs"))
      val sigs = base.select(col("_id"),
        Dedup.minHashSignature(col("_hs"), 64).as("_sig"))
      val banded = sigs.select(col("_id"),
        posexplode(array((0 until 32).map(b =>
          xxhash64(lit(b), slice(col("_sig"), b * 2 + 1, 2))): _*))
          .as(Seq("_band", "_bh")))
      val a = banded.select(col("_id").as("a_id"), col("_band"), col("_bh"))
      val b = banded.select(col("_id").as("b_id"),
        col("_band").as("_b2"), col("_bh").as("_h2"))
      val n = a.join(b,
        col("_band") === col("_b2") && col("_bh") === col("_h2") &&
          col("a_id") < col("b_id")).count()
      println(s"[cand2] $dir copy=$k n_cand=$n")
    }
    spark.stop()
  }
}
