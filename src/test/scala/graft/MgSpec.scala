package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Mg

/** Misra-Gries summary contract: hand-computed truncation, size bound,
  * sentinel survival on all-ties inputs, bracket correctness under merges,
  * error-budget additivity, and layout determinism. */
class MgSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")

  private def items(rows: (String, String, Int)*): DataFrame =
    rows.flatMap { case (g, it, n) => Seq.fill(n)((g, it)) }.toDF("g", "item")

  private def state(df: DataFrame) =
    df.collect()
      .map(r => Option(r.getAs[String]("_item")) ->
        (r.getAs[Long]("_w"), r.getAs[Long]("_n"), r.getAs[Long]("_terr")))
      .toMap

  test("summarize: offset truncation by the (k+1)-th largest, hand case") {
    // counts: a=10, b=6, c=4, d=2 ; k=2 -> t = 3rd largest = 4
    val df = items(("g", "a", 10), ("g", "b", 6), ("g", "c", 4), ("g", "d", 2))
    val s = state(Mg.summarize(df, keys, "item", k = 2))
    assert(s == Map(
      Some("a") -> ((6L, 22L, 4L)), Some("b") -> ((2L, 22L, 4L)),
      None -> ((0L, 22L, 4L))))
  }

  test("summarize: fewer than k+1 items means exact counts, zero budget") {
    val df = items(("g", "a", 5), ("g", "b", 3))
    val s = state(Mg.summarize(df, keys, "item", k = 4))
    assert(s == Map(
      Some("a") -> ((5L, 8L, 0L)), Some("b") -> ((3L, 8L, 0L)),
      None -> ((0L, 8L, 0L))))
  }

  test("summarize: all-ties input truncates to the sentinel alone") {
    val df = items(("g", "a", 5), ("g", "b", 5), ("g", "c", 5))
    val s = state(Mg.summarize(df, keys, "item", k = 2))
    assert(s == Map(None -> ((0L, 15L, 5L))))
  }

  test("merge: weights sum, budgets add with the new truncation, bracket holds") {
    val h1 = items(("g", "a", 10), ("g", "b", 6), ("g", "c", 4))
    val h2 = items(("g", "a", 8), ("g", "c", 7), ("g", "d", 5))
    val k = 2
    val m = Mg.merge(
      Mg.summarize(h1, keys, "item", k), Mg.summarize(h2, keys, "item", k),
      keys, k)
    val s = state(m)
    // h1: t=4 -> {a:6, b:2}; h2: t=5 -> {a:3, c:2}
    // union weights: a=9, b=2, c=2 ; tm = 3rd largest = 2 -> {a:7}
    // terr = 4 + 5 + 2 = 11 ; n = 20 + 20 = 40
    assert(s == Map(Some("a") -> ((7L, 40L, 11L)), None -> ((0L, 40L, 11L))))
    // bracket: w ≤ true ≤ w + terr for every item (true: a=18,b=6,c=11,d=5)
    val est = Mg.estimate(m, keys).head()
    assert(est.getAs[Long]("w_min") == 7L && est.getAs[Long]("w_max") == 18L)
    assert(7L <= 18L && 18L <= 7L + 11L)
  }

  test("summary is a pure function of the multiset: layout-independent") {
    val rnd = new scala.util.Random(28)
    val df = (1 to 5000)
      .map(_ => ("g", s"w${math.abs(rnd.nextInt(200))}"))
      .toDF("g", "item")
    val s1 = state(Mg.summarize(df, keys, "item", 8))
    val cached = df.repartition(11).cache()
    try {
      val s2 = state(Mg.summarize(cached, keys, "item", 8))
      assert(s1 == s2)
      assert(s1.size <= 9) // ≤ k items + sentinel
    } finally { cached.unpersist(blocking = false) }
  }

  test("randomized net: bracket contains the true count for every reported item") {
    for (seed <- Seq(3, 33)) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish: item id = floor(200 * u^3) — few very hot items
      val rows = (1 to 20000).map { _ =>
        val u = rnd.nextDouble()
        ("g", s"w${(200 * u * u * u).toInt}", rnd.nextInt(4))
      }
      val df = rows.toDF("g", "item", "part")
      val k = 12
      val merged = (0 to 3)
        .map(p => Mg.summarize(df.where(col("part") === p), keys, "item", k))
        .reduce((a, b) => Mg.merge(a, b, keys, k))
      val est = Mg.estimate(merged, keys)
      val truth = df.groupBy("item").agg(count(lit(1)).as("true_c"))
      val bad = est.join(truth, "item")
        .where(col("true_c") < col("w_min") || col("true_c") > col("w_max"))
        .count()
      assert(bad == 0, s"seed $seed: $bad items outside their bracket")
      // budget stays within the declared Σ nᵢ/(k+1) bound over the fold tree
      val terr = est.agg(max("err_budget")).head().getLong(0)
      assert(terr <= (3 * 20000L) / (k + 1),
        s"seed $seed: err budget $terr exceeds the declared bound")
    }
  }
}
