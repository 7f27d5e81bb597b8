package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 95% on one hot key — the salting target
  private lazy val big = (0 until 10000).map { i =>
    val k = if (i % 20 == 0) (i % 7).toLong else 1L
    (k, i.toLong)
  }.toDF("k", "v")

  private lazy val small = (0L until 7L).map(k => (k, s"dim_$k"))
    .toDF("k", "name")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[Long]("v"),
        Option(r.getAs[String]("name")).getOrElse("∅"))).toSet

  test("saltedJoin == plain join (inner and left, incl. unmatched keys)") {
    val smallMissingKey = small.filter(col("k") =!= 3L) // force unmatched rows
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(smallMissingKey, Seq("k"), jt)
      val salted = SkewJoin.saltedJoin(big, smallMissingKey, Seq("k"), 8, jt)
      assert(salted.columns.toSeq === plain.columns.toSeq, jt)
      assert(canon(salted) === canon(plain), jt)
    }
  }

  test("saltedJoin spreads the hot key across salt subpartitions") {
    val SALT = 8
    // reproduce the internal salt and count the hot key's spread
    val spread = big.filter(col("k") === 1L)
      .withColumn("s", pmod(xxhash64(monotonically_increasing_id()), lit(SALT)))
      .groupBy("s").count().collect()
    assert(spread.length == SALT, s"hot key landed on ${spread.length}/$SALT salts")
    val counts = spread.map(_.getLong(1))
    assert(counts.max.toDouble / counts.min < 2.0,
      s"salt imbalance: ${counts.mkString(",")}")
  }

  test("saltedJoin handles null join keys like plain join") {
    val withNulls = big.unionByName(
      Seq((Option.empty[Long], 99999L)).toDF("k", "v"))
    for (jt <- Seq("inner", "left")) {
      val plain = withNulls.join(small, Seq("k"), jt)
      val salted = SkewJoin.saltedJoin(withNulls, small, Seq("k"), 4, jt)
      assert(salted.count() === plain.count(), jt)
    }
  }

  test("saltedJoin rejects unsupported shapes") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("k"), 0)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("k"), 4, "right")
    }
  }

  // ------------------------------------------------- statistics router

  private def mgOf(df: org.apache.spark.sql.DataFrame) =
    SkewJoin.keyFreqSummary(df, Seq("k"), 64)
  private def cntOf(df: org.apache.spark.sql.DataFrame) =
    df.agg(count(lit(1)).as("n"))

  test("autoJoin routes planted skew/small/balanced correctly and every " +
      "route is result-equivalent to the plain join") {
    // big: 95% on key 1 ⇒ salted when small exceeds the broadcast budget
    val (salted, dSkew) = SkewJoin.autoJoin(big, small, Seq("k"),
      mgOf(big), cntOf(small), broadcastRowLimit = 3, skewShare = 0.2,
      nSalts = 8)
    assert(dSkew.route === "salted" && dSkew.nSalts === 8)
    assert(dSkew.topKeyShareLb > 0.9 && dSkew.bigRows === 10000L)
    assert(canon(salted) === canon(big.join(small, Seq("k"))))

    // same stats, roomy broadcast budget ⇒ broadcast wins over salting
    val (bcast, dSmall) = SkewJoin.autoJoin(big, small, Seq("k"),
      mgOf(big), cntOf(small), broadcastRowLimit = 1000)
    assert(dSmall.route === "broadcast" && dSmall.nSalts === 1)
    assert(dSmall.smallRows === 7L)
    assert(canon(bcast) === canon(big.join(small, Seq("k"))))

    // balanced big side (uniform keys) + over-budget small ⇒ plain shuffle
    val uniform = (0 until 10000).map(i => ((i % 7).toLong, i.toLong))
      .toDF("k", "v")
    val (plain, dBal) = SkewJoin.autoJoin(uniform, small, Seq("k"),
      mgOf(uniform), cntOf(small), broadcastRowLimit = 3, skewShare = 0.2)
    assert(dBal.route === "shuffle" && dBal.nSalts === 1)
    assert(dBal.topKeyShareLb < 0.2)
    assert(canon(plain) === canon(uniform.join(small, Seq("k"))))
  }

  test("decide: MG share is a LOWER bound — sketch error can only suppress " +
      "a salted verdict, never trigger one") {
    // 200 distinct keys, perfectly uniform, k = 64 ⇒ heavy truncation;
    // the w_min residuals understate every share, so no key can cross a
    // 0.2 threshold it doesn't truly cross
    val flat = (0 until 10000).map(i => ((i % 200).toLong, i.toLong))
      .toDF("k", "v")
    val d = SkewJoin.decide(mgOf(flat), cntOf(small),
      broadcastRowLimit = 3, skewShare = 0.2, nSalts = 8)
    assert(d.route === "shuffle")
    assert(d.topKeyShareLb <= 1.0 / 200.0 + 1e-9)
  }

  test("keyFreqSummary: composite-key encoding is injective — null " +
      "placement and component boundaries never merge distinct keys") {
    // with a plain concat, all four composite keys would collapse to "aa":
    // ('a',null)/(null,'a') (null-dropping) and ('aa',null)/(null,'aa')
    // likewise; worse, ('a','a') would join them. The length-prefixed
    // encoding must keep all FIVE keys distinct, so the top share is the
    // true 3/11, not a fabricated 9/11 that would trip a salted verdict.
    val df = (
      Seq.fill(3)((Some("a"), Option.empty[String])) ++
        Seq.fill(2)((Option.empty[String], Some("a"))) ++
        Seq.fill(2)((Some("aa"), Option.empty[String])) ++
        Seq.fill(2)((Option.empty[String], Some("aa"))) ++
        Seq.fill(2)((Some("a"), Some("a")))
      ).toDF("k1", "k2")
    val mg = SkewJoin.keyFreqSummary(df, Seq("k1", "k2"), 64)
    val items = graft.operators.Mg.estimate(mg, Seq("_sj_g"))
      .select("item", "w_min").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(items.size === 5, s"keys merged: $items")
    assert(items.values.max === 3L)
    val d = SkewJoin.decide(mg, cntOf(small),
      broadcastRowLimit = 3, skewShare = 0.5, nSalts = 8)
    assert(d.route === "shuffle" && math.abs(d.topKeyShareLb - 3.0 / 11.0) < 1e-9)
  }

  test("decide: all-ties truncation (empty item set) still reports the " +
      "true bigRows from the sentinel row") {
    // 200 distinct keys, one row each, k = 64 ⇒ the 65th-largest count
    // equals every count, every residual weight is 0, the item set is
    // EMPTY — the sentinel row alone carries n = 200
    val ties = (0 until 200).map(i => (i.toLong, i.toLong)).toDF("k", "v")
    val mg = mgOf(ties)
    assert(graft.operators.Mg.estimate(mg, Seq("_sj_g")).count() === 0L)
    val d = SkewJoin.decide(mg, cntOf(small),
      broadcastRowLimit = 3, skewShare = 0.2, nSalts = 8)
    assert(d.bigRows === 200L)
    assert(d.route === "shuffle" && d.topKeyShareLb === 0.0)
  }

  test("decide rejects invalid thresholds") {
    intercept[IllegalArgumentException] {
      SkewJoin.decide(mgOf(big), cntOf(small), 10, 0.0, 8)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.decide(mgOf(big), cntOf(small), 10, 0.5, 1)
    }
  }
}
