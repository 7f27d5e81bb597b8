package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** d15 hot-prefix hazard measurement (dev tooling → SCALE.md).
  *
  * Claim under test: a boilerplate-heavy corpus concentrates
  * `editDistancePairs` candidates into one prefix block (quadratic DP
  * volume), and the documented mitigation — a prefix long enough to reach
  * past the boilerplate — splits the block. The banded DP keeps per-pair
  * cost low, so the experiment stays bounded while the pair-count blowup
  * is plainly visible.
  */
object ProfileD15 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val skew = new TaskSkewListener
    spark.sparkContext.addSparkListener(skew)
    val n = args.lift(0).map(_.toLong).getOrElse(20000L)
    // 30% of docs open with the same 14-char boilerplate; the rest are
    // unique from the first token. Bodies are 8 pseudo-random tokens.
    val docs = spark.range(n).select(
      col("id"),
      concat(
        when(pmod(xxhash64(col("id") * 3), lit(100L)) < 30,
          lit("common header "))
          .otherwise(concat(lit("uniq"), col("id").cast("string"), lit(" "))),
        concat_ws(" ", (0 until 8).map(t =>
          concat(lit("w"),
            pmod(xxhash64(col("id") * 131 + t), lit(5000L)).cast("string"))): _*))
        .as("text"))
      .persist()
    docs.write.format("noop").mode(SaveMode.Overwrite).save()
    for (prefixLen <- Seq(4, 20)) {
      val walls = (1 to 3).map { _ =>
        skew.reset()
        val t0 = System.nanoTime()
        val pairs = Dedup.editDistancePairs(
          docs, "id", "text", maxDist = 8, prefixLen = prefixLen)
        pairs.write.format("noop").mode(SaveMode.Overwrite).save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[d15] n=$n prefixLen=$prefixLen wall min=${walls.min}%.2f s " +
        f"(all: ${walls.map(w => f"$w%.2f").mkString(", ")})")
      skew.print(s"[d15] prefixLen=$prefixLen", 3)
    }
    docs.unpersist()
    spark.stop()
  }
}
