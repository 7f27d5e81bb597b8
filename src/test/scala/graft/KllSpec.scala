package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Kll}

/** KLL compactor sketch: weight conservation (total weight == exact row
  * count through build AND merge), level-capacity bounds, determinism and
  * cache-independence of the md5-coin build, the kernel-vs-SQL hash56
  * parity the oracle replay rests on, value provenance (estimates are
  * original data values), and the worst-case rank-error bound. */
class KllSpec extends SparkSpec {

  import spark.implicits._

  private val (buckets, k, rounds) = (4, 32, 10)

  private def build(df: DataFrame, salt: String = "t"): DataFrame =
    Kll.registers(df, Seq("g"), "v", "id", buckets, k, rounds, salt)

  private def mkDf(n: Int, seed: Int = 7): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => ("g", i.toLong, rnd.nextDouble() * 1e6 - 5e5))
      .toDF("g", "id", "v")
  }

  private def stateSet(regs: DataFrame): Set[(String, Int, Double)] =
    regs.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet

  test("weight conservation: total weight == exact row count; nulls excluded; empty -> empty") {
    val df = mkDf(5000).unionByName(
      Seq(("g", -1L, null.asInstanceOf[java.lang.Double]))
        .toDF("g", "id", "v"))
    val regs = build(df)
    val w = regs.agg(sum(expr("shiftleft(CAST(1 AS BIGINT), _level)")))
      .head().getLong(0)
    assert(w === 5000L)
    assert(build(df.limit(0)).count() === 0L)
  }

  test("level capacities: every swept level holds <= k items; state is corpus-size-independent") {
    val small = build(mkDf(2000))
    val large = build(mkDf(40000))
    for (regs <- Seq(small, large)) {
      val byLevel = regs.groupBy("_level").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      byLevel.foreach { case (l, c) =>
        if (l < rounds + 4) assert(c <= k.toLong, s"level $l holds $c > $k")
      }
    }
    // 20x the data must NOT mean 20x the state (the whole point)
    assert(large.count() <= small.count() * 3)
  }

  test("determinism: independent builds agree bit-for-bit; caching the input changes nothing") {
    val df = mkDf(8000)
    val a = stateSet(build(df))
    val b = stateSet(build(df))
    assert(a === b)
    val cached = df.cache()
    try assert(stateSet(build(cached)) === a)
    finally cached.unpersist(blocking = false)
  }

  test("kernel hash56 mirrors the SQL hash56 bit-for-bit") {
    val samples = Seq("t/b:0:0", "t/f:-1:3", "skll/m:-1:11", "", "äöü:1:2")
    val fromSql = samples.toDF("s")
      .select(Dedup.hash56(col("s"))).collect().map(_.getLong(0))
    samples.zip(fromSql).foreach { case (s, h) =>
      assert(Kll.hash56Local(s) === h, s"hash mismatch on '$s'")
    }
  }

  test("estimates are ORIGINAL data values and ranks hit their targets within 4n/k") {
    val n = 10000
    val df = mkDf(n, seed = 13)
    val vals = df.select("v").as[Double].collect().sorted
    val regs = build(df)
    val est = Kll.estimate(regs, Seq("g"),
      (1 to 9).map(i => s"d$i" -> i / 10.0))
    val row = est.head()
    assert(row.getAs[Long]("n") === n.toLong)
    val bound = 4.0 * n / k
    (1 to 9).foreach { i =>
      val v = row.getAs[Double](s"d$i")
      assert(vals.contains(v), s"d$i=$v is not an input value")
      val exactRank = vals.count(_ <= v)
      val target = math.ceil(i / 10.0 * n).toLong
      assert(math.abs(exactRank - target) <= bound,
        s"d$i true rank $exactRank vs target $target exceeds $bound")
    }
  }

  test("merge conserves weight exactly and stays within the additive error bound") {
    val n = 12000
    val df = mkDf(n, seed = 29)
    val a = build(df.where(col("id") % 2 === 0))
    val b = build(df.where(col("id") % 2 === 1))
    val mg = Kll.merge(a, b, Seq("g"), k, sweepRounds = 16, salt = "t")
    val w = mg.agg(sum(expr("shiftleft(CAST(1 AS BIGINT), _level)")))
      .head().getLong(0)
    assert(w === n.toLong)
    val vals = df.select("v").as[Double].collect().sorted
    val p50 = Kll.estimate(mg, Seq("g"), Seq("p50" -> 0.5))
      .head().getAs[Double]("p50")
    // two builds + one merge sweep: <= 3 * (4n/k) in the worst case
    assert(math.abs(vals.count(_ <= p50) - n / 2) <= 12.0 * n / k)
  }

  test("randomized net: heavy duplicates, negatives, and skew all hold the rank bound") {
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 3) {
      val n = 3000 + trial * 1000
      // heavy-tailed with many exact duplicates (the tie regime the sort
      // determinism argument covers: equal values pair interchangeably)
      val vals = (0 until n).map { i =>
        val base = rnd.nextInt(50).toDouble
        if (i % 3 == 0) base else base * math.pow(10, rnd.nextInt(4)) - 250.0
      }
      val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
        .toDF("g", "id", "v")
      val regs = build(df, salt = s"net$trial")
      val w = regs.agg(sum(expr("shiftleft(CAST(1 AS BIGINT), _level)")))
        .head().getLong(0)
      assert(w === n.toLong, s"trial $trial: weight $w != $n")
      val sorted = vals.sorted
      val est = Kll.estimate(regs, Seq("g"),
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)).head()
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75).foreach { case (nm, q) =>
        val v = est.getAs[Double](nm)
        // reported values are original data values even under duplication
        assert(sorted.contains(v), s"trial $trial $nm=$v not in input")
        val exactRank = sorted.count(_ <= v)
        val target = math.ceil(q * n).toLong
        assert(math.abs(exactRank - target) <= 4.0 * n / k,
          s"trial $trial $nm: rank $exactRank vs $target > ${4.0 * n / k}")
      }
    }
  }

  test("estRank: weight-rank of a probe matches a hand fold of the state") {
    val df = mkDf(3000, seed = 31)
    val regs = build(df).cache()
    try {
      val state = regs.collect()
        .map(r => (r.getInt(1), r.getDouble(2)))
      val probe = Seq(("g", 0.0)).toDF("g", "p")
      val got = Kll.estRank(regs, probe, Seq("g"), "p")
        .head().getAs[Long]("est_rank")
      val want = state.filter(_._2 <= 0.0).map(x => 1L << x._1).sum
      assert(got === want)
    } finally regs.unpersist(blocking = false)
  }

  test("estimate: keys = Nil is the global sketch — identical numbers to a constant-key fold (round-13 advice)") {
    val df = mkDf(6000)
    val qs = Seq(("p25", 0.25), ("p50", 0.5), ("p95", 0.95))
    val keyed = Kll.estimate(build(df), Seq("g"), qs).head()
    // the coins salt on (bucket, level), never on keys, so a one-group
    // keyed build and a global build hold identical compactor state — the
    // global estimate must reproduce the keyed numbers exactly
    val global = Kll.estimate(
      Kll.registers(df, Nil, "v", "id", buckets, k, rounds, "t"), Nil, qs)
    assert(global.columns.toSeq === Seq("n", "p25", "p50", "p95"))
    val g = global.head()
    assert(g.getAs[Long]("n") === keyed.getAs[Long]("n"))
    for (q <- Seq("p25", "p50", "p95"))
      assert(g.getAs[Double](q) === keyed.getAs[Double](q))
  }

  test("rollup: weight conservation at every cube level; rolled-up medians " +
      "stay within the merge rank bound") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(51)
    val rows = (0 until 9000).map { i =>
      (s"s${i % 3}", s"p${i % 3}", i.toLong, rnd.nextDouble() * 1000)
    }
    val df = rows.toDF("st", "pr", "id", "v")
    val (k, rounds) = (32, 10)
    val fine = Kll.registers(df, Seq("st", "pr"), "v", "id",
      buckets = 4, k = k, rounds = rounds, salt = "kr")
    for (ks <- Seq(Seq("st"), Seq("pr"), Nil)) {
      val rolled = Kll.rollup(fine, ks, k, sweepRounds = 16, salt = "kr")
      // weight conservation: the rolled frame still weighs the corpus
      val w = rolled.agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), _level)"))).head().getLong(0)
      assert(w === rows.size.toLong, s"rollup to $ks lost weight: $w")
      // the rolled estimate's true rank stays near the median (generous
      // slack: one extra sweep on top of the 4n/k build bound)
      val est = Kll.estimate(rolled, ks, Seq("p50" -> 0.5))
      est.collect().foreach { r =>
        val grp = ks.map(r.getAs[String])
        val vals = rows.filter { t =>
          ks.zip(grp).forall {
            case ("st", g) => t._1 == g
            case ("pr", g) => t._2 == g
          }
        }.map(_._4).sorted
        val p50 = r.getAs[Double]("p50")
        val rank = vals.count(_ <= p50)
        assert(math.abs(rank - vals.size / 2) <= 8.0 * vals.size / k,
          s"rollup to $ks grp $grp: rank $rank of ${vals.size}")
      }
    }
  }
}
