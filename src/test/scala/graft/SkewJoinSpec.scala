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

  test("decide rejects invalid thresholds") {
    intercept[IllegalArgumentException] {
      SkewJoin.decide(mgOf(big), cntOf(small), 10, 0.0, 8)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.decide(mgOf(big), cntOf(small), 10, 0.5, 1)
    }
  }
}
