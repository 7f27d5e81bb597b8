package graft

import org.apache.spark.sql.functions._

import graft.operators.Hll

class HllSpec extends SparkSpec {

  private def regSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Int)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

  test("registers: merge(sketch(A), sketch(B)) == sketch(A union B) exactly; idempotent") {
    import spark.implicits._
    val a = (0 until 4000).map(i => ("g", s"val_$i")).toDF("g", "v")
    val b = (2000 until 7000).map(i => ("g", s"val_$i")).toDF("g", "v")
    val sa = Hll.registers(a, Seq("g"), "v", p = 8)
    val sb = Hll.registers(b, Seq("g"), "v", p = 8)
    val merged = Hll.merge(sa, sb, Seq("g"))
    val direct = Hll.registers(a.unionByName(b), Seq("g"), "v", p = 8)
    assert(regSet(merged) === regSet(direct))
    // idempotent: folding a sketch into itself changes nothing
    assert(regSet(Hll.merge(sa, sa, Seq("g"))) === regSet(sa))
  }

  test("estimate: raw-branch accuracy within 5% at p=10 on 20k distincts, per group") {
    import spark.implicits._
    // duplicate every value 3x: cardinality, not row count, must drive it
    val df = (0 until 20000).flatMap(i =>
      Seq.fill(3)((if (i % 2 == 0) "even" else "odd", s"user_$i")))
      .toDF("g", "v")
    val got = Hll.distinctSketch(df, Seq("g"), "v", p = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set("even", "odd"))
    got.values.foreach(e => assert(math.abs(e - 10000) / 10000.0 < 0.05, e))
  }

  test("estimate: linear-counting branch on small cardinality, exact empty/null edges") {
    import spark.implicits._
    val df = ((0 until 30).map(i => ("g", s"x_$i")) :+ (("g", null: String)))
      .toDF("g", "v")
    val regs = Hll.registers(df, Seq("g"), "v", p = 8)
    // 30 values over 256 buckets: far below 2.5m -> linear counting, and
    // V > 0 certainly (at most 30 of 256 buckets occupied)
    val ne = regs.count()
    assert(ne <= 30 && ne > 0)
    val est = Hll.estimate(regs, Seq("g"), p = 8)
      .collect().map(r => r.getDouble(1)).head
    // m*ln(m/V) with V = 256 - ne, nudged 6dp
    val expected = BigDecimal(256.0 * math.log(256.0 / (256 - ne)) + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est === expected)
    assert(math.abs(est - 30) / 30.0 < 0.1, est)
    // nulls excluded: a null-only frame sketches to an empty register frame
    val onlyNull = Seq(("g", null: String)).toDF("g", "v")
    assert(Hll.registers(onlyNull, Seq("g"), "v", p = 8).count() === 0)
  }

  test("registers fold is order-independent: shuffled input gives identical estimate") {
    import spark.implicits._
    val vals = (0 until 5000).map(i => ("g", s"tok_$i"))
    val fwd = Hll.distinctSketch(vals.toDF("g", "v"), Seq("g"), "v", p = 9)
      .collect().head.getDouble(1)
    val rev = Hll.distinctSketch(
      scala.util.Random.shuffle(vals).toDF("g", "v").repartition(7),
      Seq("g"), "v", p = 9).collect().head.getDouble(1)
    assert(fwd === rev)
  }

  test("guarded merge: same-p frames fold identically; mismatched p raises") {
    import spark.implicits._
    val a = (0 until 3000).map(i => ("g", s"a_$i")).toDF("g", "v")
    val b = (1000 until 5000).map(i => ("g", s"b_$i")).toDF("g", "v")
    val sa10 = Hll.registers(a, Seq("g"), "v", p = 10)
    val sb10 = Hll.registers(b, Seq("g"), "v", p = 10)
    // guarded == unguarded when the contract holds
    assert(regSet(Hll.merge(sa10, sb10, Seq("g"), p = 10)) ===
      regSet(Hll.merge(sa10, sb10, Seq("g"))))
    def raises(body: => Any): Unit = {
      val e = intercept[Exception](body)
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(t => Option(t.getMessage)
          .exists(_.contains("HLL merge precision mismatch"))), e)
    }
    // finer p' folded at coarser p: some bucket exceeds 2^p - 1 (always
    // caught — 3000 values cannot all land in the low 1024 of 4096 buckets)
    val sa12 = Hll.registers(a, Seq("g"), "v", p = 12)
    raises(Hll.merge(sa12, sb10, Seq("g"), p = 10).collect())
    // coarser p' folded at finer p: the tripwire is the rank envelope —
    // pin it with a register whose rank only a coarser precision can
    // produce (rank 50 needs w >= 49, i.e. p' <= 7)
    val deepRank = Seq(("g", 3L, 50)).toDF("g", "_bucket", "_rank")
    raises(Hll.merge(deepRank, sb10, Seq("g"), p = 10).collect())
  }

  test("rollup: merging fine-cell registers == registers built directly at " +
      "the coarse level, at every cube level incl. the grand total") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 5000).map { i =>
      (s"s${i % 3}", s"p${i % 5}", rnd.nextInt(800).toLong)
    }.toDF("st", "pr", "v")
    val fine = Hll.registers(rows, Seq("st", "pr"), "v", p = 8)
    def regSet(df: org.apache.spark.sql.DataFrame, ks: Seq[String]) =
      df.collect().map(r => (ks.map(r.getAs[String]), r.getAs[Long]("_bucket"),
        r.getAs[Int]("_rank"))).toSet
    // rollup to each coarser level equals the direct build — the
    // mergeability identity that makes sketch-served cubes exact-by-merge
    for (ks <- Seq(Seq("st"), Seq("pr"), Nil)) {
      assert(regSet(Hll.rollup(fine, ks), ks) ===
        regSet(Hll.registers(rows, ks, "v", p = 8), ks),
        s"rollup to $ks diverged from the direct registers")
    }
    // and the grand-total estimate is the known ~800 within the p=8 band
    val est = Hll.estimate(Hll.rollup(fine, Nil), Nil, 8)
      .head().getDouble(0)
    assert(math.abs(est - 800.0) / 800.0 < 0.15, s"grand total est $est")
  }
}
