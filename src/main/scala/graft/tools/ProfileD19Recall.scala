package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** d19 blocking-recall measurement (dev tooling → SCALE.md round-10 matrix)
  * — the containment analog of [[ProfileD15Recall]] (round-9 verdict task
  * 4): what fraction of true short-quoted-in-long pairs does
  * `containmentPairs`'s rare-token blocking (df ∈ [2, maxDf]) MISS as
  * `maxDf` varies, and what the candidate volume costs as it grows.
  *
  * Ground truth is the operator's own documented full-recall setting
  * `maxDf = nDocs` (every shared token has df ≥ 2 by definition, so the
  * posting blow-up bound is the ONLY recall cut) — all-pairs-equivalent on
  * purpose; production picks a bounded maxDf whose recall this quantifies.
  *
  * Corpus: n long documents of 40 tokens, each with one planted twin
  * holding a contiguous 10-token slice (token-set containment 1.0). A
  * planted pair is recoverable at a given maxDf iff the slice carries at
  * least one token with global df ≤ maxDf. Two slice populations make the
  * sweep informative:
  *  - 80% MIXED: slice tokens drawn uniform-of-uniform over the full
  *    30k-token vocabulary — a rare (df ≈ 2) token lands in nearly every
  *    slice, so these recover at any maxDf ≥ 2 (this is why d19's default
  *    worked: ordinary text nearly always shares something rare);
  *  - 20% COMMON-ONLY: slice tokens drawn Zipf over the 150-token head —
  *    the EXACT documented failure mode ("a contained document whose every
  *    token is common generates no candidate"). Their head dfs span
  *    ~40-2000, so recall climbs through the maxDf sweep precisely as the
  *    blocking admits deeper head frequencies, and the table shows where
  *    the aggregate crosses 0.9 (the round-9 verdict's tuning bar). */
object ProfileD19Recall {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = args.lift(0).map(_.toInt).getOrElse(1500)
    val vocab = 30000
    val threshold = 0.8
    val rng = new scala.util.Random(42)
    // Zipf(1) over the 150-id head: id = floor(exp(u·ln 151)) − 1
    def headTok(): String =
      "t" + (math.exp(rng.nextDouble() * math.log(151.0)).toInt - 1)
    // uniform-of-uniform over the full vocab: heavy head, near-unique tail
    def anyTok(): String = "t" + rng.nextInt(rng.nextInt(vocab) + 1)
    val docs = (0 until n).flatMap { i =>
      val commonOnly = i % 5 == 0
      val slice = (0 until 10).map(_ => if (commonOnly) headTok() else anyTok())
      val rest = (0 until 30).map(_ => anyTok())
      val toks = rng.shuffle(slice ++ rest)
      Seq((2L * i, toks.mkString(" ")), (2L * i + 1, slice.mkString(" ")))
    }
    val df = docs.toDF("id", "text").repartition(32).persist()
    df.write.format("noop").mode(SaveMode.Overwrite).save()
    val nDocs = 2L * n

    // full-recall oracle: maxDf = nDocs (the documented exact setting)
    val oracle = Dedup.containmentPairs(df, "id", "text", threshold, nDocs)
      .select("a_id", "b_id").persist()
    val truth = oracle.count()
    println(s"[d19-recall] docs=$nDocs oracle_pairs=$truth")

    for (maxDf <- Seq(10L, 25L, 50L, 100L, 250L, 1000L)) {
      val t0 = System.nanoTime()
      val got = Dedup.containmentPairs(df, "id", "text", threshold, maxDf)
        .select("a_id", "b_id").persist()
      val found = got.count()
      val hit = got.join(oracle, Seq("a_id", "b_id")).count()
      val wall = (System.nanoTime() - t0) / 1e9
      got.unpersist()
      println(f"[d19-recall] maxDf=$maxDf%5d recall=${hit.toDouble / truth}%.4f " +
        f"pairs=$found wall=$wall%5.2f s")
    }
    oracle.unpersist()
    df.unpersist()
    spark.stop()
  }
}
