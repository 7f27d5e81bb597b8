package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** d15 blocking-recall measurement (dev tooling → SCALE.md round-9 matrix).
  *
  * Question under test (round-8 verdict task 5): what fraction of true
  * near-dup pairs does `editDistancePairs`'s prefix blocking MISS as
  * `prefixLen` varies, and how much of that the `suffixLen` second key
  * recovers. Ground truth is an all-pairs banded-Levenshtein oracle over
  * the same corpus — O(n²) on purpose (this is a measurement harness on a
  * small planted corpus, not a production path; production uses the
  * blocked operator whose recall this quantifies).
  *
  * Corpus: n base documents of 12 pseudo-random tokens; each gets one
  * twin with a single character substitution at a position uniform over
  * the text, so geometrically P(miss | prefix-only) ≈ prefixLen / len.
  * 10% of bases are SHORT (2 tokens) to exercise the documented
  * short-text exclusion. Twins are planted at distance exactly 1; any
  * additional oracle pairs are accidental near-dups and count the same.
  */
object ProfileD15Recall {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = args.lift(0).map(_.toInt).getOrElse(2000)
    val maxDist = 2
    val rng = new scala.util.Random(42)
    val docs = (0 until n).flatMap { i =>
      val tokens = if (i % 10 == 0) 2 else 12
      val body = (0 until tokens).map(_ => "w" + rng.nextInt(5000)).mkString(" ")
      val pos = rng.nextInt(body.length)
      val twin = body.updated(pos, if (body(pos) == 'z') 'y' else 'z')
      Seq((2L * i, body), (2L * i + 1, twin))
    }
    val df = docs.toDF("id", "text").repartition(32).persist()
    df.write.format("noop").mode(SaveMode.Overwrite).save()

    // all-pairs oracle: length band first, then the banded DP
    val l = df.select(col("id").as("a_id"), col("text").as("_na"),
      length(col("text")).as("_la"))
    val r = df.select(col("id").as("b_id"), col("text").as("_nb"),
      length(col("text")).as("_lb"))
    val oracle = l.crossJoin(r)
      .filter(col("a_id") < col("b_id") &&
        abs(col("_la") - col("_lb")) <= maxDist)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("_na"), col("_nb"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
      .select("a_id", "b_id")
      .persist()
    val truth = oracle.count()
    println(s"[d15-recall] docs=${2 * n} oracle_pairs=$truth")

    for {
      prefixLen <- Seq(2, 4, 8, 16)
      suffixLen <- Seq(0, 8)
    } {
      val t0 = System.nanoTime()
      val got = Dedup.editDistancePairs(
          df, "id", "text", maxDist, prefixLen, suffixLen)
        .select("a_id", "b_id")
        .persist()
      val found = got.count()
      val hit = got.join(oracle, Seq("a_id", "b_id")).count()
      val wall = (System.nanoTime() - t0) / 1e9
      got.unpersist()
      println(f"[d15-recall] prefixLen=$prefixLen%2d suffixLen=$suffixLen " +
        f"recall=${hit.toDouble / truth}%.4f pairs=$found wall=$wall%5.2f s")
    }
    oracle.unpersist()
    df.unpersist()
    spark.stop()
  }
}
