package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {

  test("numericProfile: hand model — nulls, distinct, range, mean; one row per column") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (1.0, 10L), (2.0, 10L), (2.0, null), (null, 30L), (4.0, 30L)
    ).toDF("a", "b")
    val got = Profiling.numericProfile(df, Seq("a", "b"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got("a") == ((1L, 3L, 1.0, 4.0, 2.25)))   // mean of 1,2,2,4
    assert(got("b") == ((1L, 2L, 10.0, 30.0, 20.0))) // mean of 10,10,30,30
  }

  test("numericProfile: ONE corpus scan — the profile must not plan a pass per column") {
    val df = Queries.byName("q32_profile")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"profile must scan the table once, found $scans scans:\n${plan.take(4000)}")
  }

  test("mutualInformation: hand model — independent columns 0, determined columns H(X)") {
    import spark.implicits._
    // independent: all four (x, y) combos equally likely -> MI = 0
    val indep = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")).toDF("x", "y")
    val mi0 = Profiling.mutualInformation(indep, "x", "y").head()
    assert(mi0.getLong(0) == 4L && mi0.getLong(1) == 4L)
    assert(math.abs(mi0.getDouble(2)) < 1e-9)
    // y determined by x, uniform x over 2 values -> MI = H(X) = ln 2
    val det = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v")).toDF("x", "y")
    val mi1 = Profiling.mutualInformation(det, "x", "y").head().getDouble(2)
    assert(math.abs(mi1 - math.log(2.0)) < 1e-5)
    // null is a category: (null -> w) adds a third deterministic symbol
    val withNull = Seq(("a", "u"), ("b", "v"), (null, "w")).toDF("x", "y")
    val mi2 = Profiling.mutualInformation(withNull, "x", "y").head()
    assert(mi2.getLong(1) == 3L)
    assert(math.abs(mi2.getDouble(2) - math.log(3.0)) < 1e-5)
  }

  test("cohensKappa: 1 on identity, ~0 on independence, null on a constant pair") {
    import spark.implicits._
    val ident = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c")).toDF("x", "y")
    val r1 = Profiling.cohensKappa(ident, "x", "y").head()
    assert(r1.getLong(0) == 4L && r1.getDouble(1) == 1.0 && r1.getDouble(3) == 1.0)
    // independent uniform pair: po == pe == 0.5 -> kappa 0
    val indep = Seq(("a", "u"), ("a", "a"), ("b", "u"), ("b", "a"))
      .toDF("x", "y") // agreement only on ("a","a") -> po = 0.25
    val r2 = Profiling.cohensKappa(indep, "x", "y").head()
    // pe = pA(a)*pB(a) + pA(b)*pB(b) = .5*.5 + .5*0 = 0.25 -> kappa 0
    assert(r2.getDouble(1) == 0.25 && r2.getDouble(2) == 0.25 && r2.getDouble(3) == 0.0)
    val const = Seq(("k", "k"), ("k", "k")).toDF("x", "y")
    val r3 = Profiling.cohensKappa(const, "x", "y").head()
    assert(r3.getDouble(2) == 1.0 && r3.isNullAt(3)) // pe = 1 -> undefined
    // null is a category: (null, null) agrees with itself
    val withNull = Seq[(String, String)](
      (null, null), ("a", "a"), ("a", "b"), ("b", "b")).toDF("x", "y")
    val r4 = Profiling.cohensKappa(withNull, "x", "y").head()
    assert(r4.getDouble(1) == 0.75)
  }

  test("kAnonymity: hand model — risky groups and rows below k") {
    import spark.implicits._
    val df = Seq(
      ("us", "m"), ("us", "m"), ("us", "m"), // group of 3
      ("de", "f"), ("de", "f"), // group of 2 (risky at k=3)
      ("fr", "m") // singleton (risky)
    ).toDF("nation", "seg")
    val r = Profiling.kAnonymity(df, Seq("nation", "seg"), 3L).head()
    assert(r.getLong(0) == 3L) // k
    assert(r.getLong(1) == 6L) // n_rows
    assert(r.getLong(2) == 3L) // n_groups
    assert(r.getLong(3) == 2L) // n_risky_groups
    assert(r.getLong(4) == 3L) // n_risky_rows (2 + 1)
    assert(r.getLong(5) == 1L) // min_group_size
    // k-anonymous table: zero risky
    val ok = Profiling.kAnonymity(df.limit(3), Seq("nation", "seg"), 3L).head()
    assert(ok.getLong(4) == 0L)
  }

  test("lDiversity: hand model — per-class distinct sensitive values; null is a CATEGORY") {
    import spark.implicits._
    val df = Seq(
      // class (us,m): sensitive {a, b, c} -> diversity 3
      ("us", "m", "a"), ("us", "m", "b"), ("us", "m", "c"), ("us", "m", "a"),
      // class (de,f): all share one value -> diversity 1 (the k-anon blind spot)
      ("de", "f", "a"), ("de", "f", "a"), ("de", "f", "a"),
      // class (fr,m): {a, null} -> null counts as its own category -> 2
      ("fr", "m", "a"), ("fr", "m", null)
    ).toDF("nation", "seg", "diag")
    val r = Profiling.lDiversity(df, Seq("nation", "seg"), "diag", 3L).head()
    assert(r.getLong(0) == 3L) // l
    assert(r.getLong(1) == 9L) // n_rows
    assert(r.getLong(2) == 3L) // n_groups
    assert(r.getLong(3) == 2L) // risky: (de,f) d=1 and (fr,m) d=2
    assert(r.getLong(4) == 5L) // risky rows: 3 + 2
    assert(r.getLong(5) == 1L) // min_diversity
    // an l-diverse table: zero risky
    val ok = Profiling.lDiversity(
      df.filter($"nation" === "us"), Seq("nation", "seg"), "diag", 3L).head()
    assert(ok.getLong(3) == 0L && ok.getLong(5) == 3L)
  }

  test("bestSplit: perfect separation picks the boundary with gain = parent entropy") {
    import spark.implicits._
    val df = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true)).toDF("s", "y")
    val r = Profiling.bestSplit(df, "s", "y").head()
    assert(r.getDouble(0) == 3.0) // lowest threshold achieving the max gain
    val ln2 = math.rint((math.log(2.0) + 1e-9) * 1e6) / 1e6
    assert(r.getDouble(1) == ln2) // H(1/2), fully resolved
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L)
    // uninformative score: every split has gain 0; tie-break -> lowest threshold
    val flat = Seq((1.0, true), (1.0, false), (2.0, true), (2.0, false)).toDF("s", "y")
    val r2 = Profiling.bestSplit(flat, "s", "y").head()
    assert(r2.getDouble(1) == 0.0 && r2.getDouble(0) == 1.0)
  }

  test("rollingZscore: trailing window catches a spike the all-time stats would dilute") {
    import spark.implicits._
    // stable baseline then a spike; window covers only recent points
    val rows = (1 to 20).map(i => ("u", i * 10L, 5.0 + (i % 2) * 0.1)) :+
      (("u", 210L, 50.0))
    val df = rows.toDF("k", "ts", "v")
    val got = Profiling.rollingZscore(df, Seq("k"), "ts", "v",
      windowSize = 100L, zThreshold = 2.0, minCount = 5).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 210L && got(0).getDouble(2) == 50.0)
    assert(got(0).getLong(3) >= 5L) // window population
    assert(got(0).getDouble(4) > 2.0)
    // the same spike value repeated everywhere -> zero variance -> no rows
    val flat = (1 to 10).map(i => ("u", i * 10L, 7.0)).toDF("k", "ts", "v")
    assert(Profiling.rollingZscore(flat, Seq("k"), "ts", "v", 100L, 2.0).count() == 0)
  }

  test("rollingZscore: windows are per key and value-based, not row-based") {
    import spark.implicits._
    // key "b" has too few points in any window -> never scored
    val rows = (1 to 20).map(i => ("a", i * 10L, (i % 3).toDouble)) ++
      Seq(("a", 205L, 40.0), ("b", 100L, 1.0), ("b", 105L, 99.0))
    val got = Profiling.rollingZscore(rows.toDF("k", "ts", "v"),
      Seq("k"), "ts", "v", 100L, 2.0, minCount = 5).collect()
    assert(got.forall(_.getString(0) == "a"))
    assert(got.exists(r => r.getLong(1) == 205L))
  }

  test("psi: identical distributions ~0, disjoint distributions large, empty side null") {
    import spark.implicits._
    val base = (1 to 200).map(i => (i % 10).toDouble + 0.01).toDF("s")
    val same = Profiling.psi(base, base, "s").head()
    assert(same.getLong(0) == 200L && same.getLong(1) == 200L)
    assert(math.abs(same.getDouble(2)) < 1e-9)
    // after-mass clamped into the top edge bin -> near-total shift
    val shifted = (1 to 200).map(_ => 100.0).toDF("s")
    val far = Profiling.psi(base, shifted, "s").head().getDouble(2)
    assert(far > 1.0, s"disjoint PSI should be large, got $far")
    val none = Profiling.psi(base, base.where(lit(false)), "s").head()
    assert(none.getLong(1) == 0L && none.isNullAt(2))
  }

  test("rocSweep: hand model — cumulative confusion counts per distinct score") {
    import spark.implicits._
    val df = Seq((3.0, true), (2.0, false), (1.0, true)).toDF("s", "y")
    val got = Profiling.rocSweep(df, "s", "y")
      .collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(got(3.0) == ((1L, 0L, 1L, 1L, 0.5, 0.0)))
    assert(got(2.0) == ((1L, 1L, 1L, 0L, 0.5, 1.0)))
    assert(got(1.0) == ((2L, 1L, 0L, 0L, 1.0, 1.0)))
  }

  test("rocSweep: duplicate scores collapse to one threshold row") {
    import spark.implicits._
    val df = Seq((2.0, true), (2.0, false), (1.0, true)).toDF("s", "y")
    val got = Profiling.rocSweep(df, "s", "y").collect()
    assert(got.length == 2)
    val at2 = got.find(_.getDouble(0) == 2.0).get
    assert((at2.getLong(1), at2.getLong(2)) == ((1L, 1L)))
  }

  test("auc: random sweep scores 0.5, perfect separation scores 1.0") {
    import spark.implicits._
    val random = Seq((3.0, true), (2.0, false), (1.0, true)).toDF("s", "y")
    val perfect = Seq((2.0, true), (1.0, false)).toDF("s", "y")
    def v(df: org.apache.spark.sql.DataFrame) =
      Profiling.auc(df, "s", "y").collect()(0).getDouble(0)
    assert(math.abs(v(random) - 0.5) < 1e-6)
    assert(math.abs(v(perfect) - 1.0) < 1e-6)
  }

  test("groupTrend: exact line recovered; degenerate groups get null fit") {
    import spark.implicits._
    val df = Seq(
      ("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0), // y = 2x + 1
      ("b", 5.0, 7.0),                                   // single point
      ("c", 4.0, 1.0), ("c", 4.0, 9.0)                   // zero x-variance
    ).toDF("g", "x", "y")
    val got = Profiling.groupTrend(df, Seq("g"), "x", "y")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3))))
      .toMap
    assert(got("a") == ((3L, Some(2.0), Some(1.0))))
    assert(got("b") == ((1L, None, None)))
    assert(got("c") == ((2L, None, None)))
  }

  test("zscoreOutliers: hand-computed z, degenerate groups emit nothing") {
    import spark.implicits._
    val rows = (1L to 9L).map(i => (i, "a", 0.0)) ++ Seq(
      (10L, "a", 100.0),      // z = 90/sqrt(1000) = 2.846 > 2
      (11L, "b", 5.0),        // single-row group
      (12L, "c", 7.0), (13L, "c", 7.0)) // zero variance
    val got = Profiling.zscoreOutliers(
        rows.toDF("id", "g", "v"), Seq("g"), "v", zThreshold = 2.0)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("z")).toMap
    assert(got.keySet == Set(10L))
    assert(math.abs(got(10L) - 90.0 / math.sqrt(1000.0)) < 1e-5)
  }

  test("zscoreOutliers: a null group key is a real group (null-safe join)") {
    import spark.implicits._
    // group null: values 1,1,10 → mu 4, sigma sqrt(27); z(10) ≈ 1.1547.
    // A plain equi-join would drop the whole group (null ≠ null) even
    // though its stats row exists — the null-safe join keeps it, same
    // convention as Sequence.funnelTimes.
    val got = Profiling.zscoreOutliers(
        Seq[(java.lang.Long, Double)](
          (null, 1.0), (null, 1.0), (null, 10.0), (1L, 5.0))
          .toDF("k", "v"),
        Seq("k"), "v", zThreshold = 1.0)
      .collect()
    assert(got.length == 1, s"expected the null group's outlier: ${got.toSeq}")
    assert(got(0).isNullAt(0) && got(0).getDouble(1) == 10.0)
    assert(math.abs(got(0).getAs[Double]("z") - 6.0 / math.sqrt(27.0)) < 1e-5)
  }

  test("correlationMatrix: alias-breaking column names are rejected up front") {
    import spark.implicits._
    for (bad <- Seq("a`b", "a'b", "a__b")) {
      val df = Seq((1.0, 2.0)).toDF(bad, "c")
      val e = intercept[IllegalArgumentException] {
        Profiling.correlationMatrix(df, Seq(bad, "c"))
      }
      assert(e.getMessage.contains("alias"), s"for name $bad: ${e.getMessage}")
    }
  }

  test("correlationMatrix: hand values, complete-case pairs, one scan") {
    import spark.implicits._
    // a vs b: perfect positive; a vs c: perfect negative on the three
    // complete rows (the null-c row drops from a-c but stays in a-b)
    val df = Seq[(Double, Double, java.lang.Double)](
      (1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0), (4.0, 8.0, null)
    ).toDF("a", "b", "c")
    val got = Profiling.correlationMatrix(df, Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3))))
      .toMap
    assert(got(("a", "b")) == ((4L, Some(1.0))))
    assert(got(("a", "c")) == ((3L, Some(-1.0))))
    assert(got(("b", "c")) == ((3L, Some(-1.0))))
    // zero variance -> null corr; plan is one scan
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b")
    val r = Profiling.correlationMatrix(const, Seq("a", "b")).collect()(0)
    assert(r.getLong(2) == 2L && r.isNullAt(3))
    val q = Profiling.correlationMatrix(df, Seq("a", "b", "c"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Scan ".r.findAllIn(plan).length <= 1 &&
      !plan.contains("LocalTableScan (2)"), s"one pass expected")
  }

  test("null handling: trend/zscore exclude incomplete rows, sweep keeps null-label thresholds") {
    import spark.implicits._
    // trend: the null-y row must drop from EVERY sum, not just sum(y)
    val trend = Profiling.groupTrend(
        Seq[(String, java.lang.Double, java.lang.Double)](
          ("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, null))
          .toDF("g", "x", "y"),
        Seq("g"), "x", "y")
      .collect()(0)
    assert(trend.getLong(1) == 2L)
    assert(trend.getDouble(2) == 2.0 && trend.getDouble(3) == 1.0)
    // zscore: nulls must not inflate n or corrupt sigma; a group with one
    // real value plus nulls is degenerate and emits nothing
    val z = Profiling.zscoreOutliers(
        (Seq[(Long, String, java.lang.Double)]((1L, "a", 5.0), (2L, "a", null)) ++
          (3L to 11L).map(i => (i, "b", java.lang.Double.valueOf(0.0))) :+
          ((12L, "b", java.lang.Double.valueOf(100.0)): (Long, String, java.lang.Double)))
          .toDF("id", "g", "v"),
        Seq("g"), "v", 2.0)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(z == Set(12L)) // group a (one real value) emits nothing
    // sweep: a score seen only on null-label rows keeps its threshold row
    // with zero increments — the oracle's GROUP BY semantics
    val sweep = Profiling.rocSweep(
        Seq[(Double, java.lang.Boolean)]((5.0, null), (4.0, true))
          .toDF("s", "y"),
        "s", "y")
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sweep.keySet == Set(5.0, 4.0))
    assert(sweep(5.0) == ((0L, 0L)) && sweep(4.0) == ((1L, 0L)))
  }

  test("rocSweep == naive threshold scan on random data (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(3, 41, 77)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 1500).map(_ =>
        (rnd.nextInt(60).toDouble, rnd.nextBoolean()))
      val p = rows.count(_._2).toLong
      val n = rows.size - p
      val want = rows.map(_._1).distinct.map { thr =>
        val tp = rows.count(r => r._1 >= thr && r._2).toLong
        val fp = rows.count(r => r._1 >= thr && !r._2).toLong
        thr -> ((tp, fp, p - tp, n - fp))
      }.toMap
      val got = Profiling.rocSweep(rows.toDF("s", "y"), "s", "y")
        .collect()
        .map(r => r.getDouble(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("rocSweep/auc plan no unpartitioned window — prefix sums distribute") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toDouble % 97, i % 3 == 0)).toDF("s", "y")
    for (plan <- Seq(
        Profiling.rocSweep(df, "s", "y").queryExecution.executedPlan.toString,
        Profiling.auc(df, "s", "y").queryExecution.executedPlan.toString)) {
      // the prefix sum's window partitions by _ps_pid; a window specced
      // directly on the order column would be the unpartitioned global form
      assert(!plan.contains("windowspecdefinition(threshold"),
        s"cumulative counts must come from the sliced prefix sum:\n${plan.take(3000)}")
    }
  }

  test("winsorizedStats == Scala model; null group keys kept; null values excluded") {
    import spark.implicits._
    // group "a": 1..20 plus a 1000.0 outlier; group null: 5 values
    val rows = (1 to 20).map(i => (Option("a"), Option(i.toDouble))) ++
      Seq((Option("a"), Option(1000.0)), (Option("a"), Option.empty[Double])) ++
      (1 to 5).map(i => (Option.empty[String], Option(i * 10.0)))
    val df = rows.toDF("g", "v")

    def model(vs: Seq[Double]): (Long, Long, Long, Double, Double) = {
      val s = vs.sorted
      def q(p: Double): Double = {
        val h = (s.size - 1) * p
        val i = h.toInt
        val raw =
          if (i + 1 < s.size) s(i) + (h - i) * (s(i + 1) - s(i)) else s(i)
        BigDecimal(raw + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val (lo, hi) = (q(0.05), q(0.95))
      val w = vs.map(x => math.min(math.max(x, lo), hi))
      val mean = w.sum / w.size
      val sd = math.sqrt(
        (w.map(x => x * x).sum - w.sum * w.sum / w.size) / (w.size - 1))
      (vs.size.toLong, vs.count(_ < lo).toLong, vs.count(_ > hi).toLong,
        BigDecimal(mean + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(sd + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val expectA = model((1 to 20).map(_.toDouble) :+ 1000.0)
    val expectN = model((1 to 5).map(_ * 10.0))

    val got = Profiling.winsorizedStats(df, Seq("g"), "v", 0.05, 0.95)
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(Some("a")) == expectA)   // outlier clamped, null value excluded
    assert(got(None) == expectN)        // null group key is a real group
    // the outlier moved the plain mean far more than the winsorized one
    assert(got(Some("a"))._4 < 60.0)
  }

  test("calibrationBins: hand-built bins, null score excluded, null label in n only") {
    import spark.implicits._
    // scores 0..10 → min 0, max 10, 5 bins of width 2; score 10 clamps
    // into the last bin. One null score (dropped), one null label
    // (counts in n + mean but neither class).
    val df = Seq(
      (0.0, Some(false)), (1.0, Some(false)), (2.0, Some(false)),
      (3.0, Some(true)), (8.0, Some(true)), (9.0, Some(true)),
      (10.0, Some(true)), (8.5, None))
      .toDF("s", "lbl")
      .union(Seq((Option.empty[Double], Option.empty[Boolean])).toDF("s", "lbl"))
    val got = Profiling.calibrationBins(df, "s", "lbl", nBins = 5)
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))))
      .toMap
    assert(got.keySet == Set(0, 1, 4))
    assert(got(0) == ((0.0, 2.0, 2L, 0.5, Some(0.0))))           // 0,1
    assert(got(1) == ((2.0, 4.0, 2L, 2.5, Some(0.5))))           // 2,3
    // bin 4: 8, 8.5(null lbl), 9, 10(clamped) → n=4, pos_rate over 3 labeled
    assert(got(4)._3 == 4L && got(4)._4 == 8.875 && got(4)._5 == Some(1.0))
    // degenerate range: single distinct score → one bin, no div-by-zero
    val deg = Profiling.calibrationBins(
      Seq((5.0, true), (5.0, false)).toDF("s", "lbl"), "s", "lbl", 3)
      .collect()
    assert(deg.length == 1 && deg.head.getInt(0) == 0 &&
      deg.head.getLong(3) == 2L)
  }

  test("jsDivergence: 0 on identical, 1 on disjoint, hand value, empty side null") {
    import spark.implicits._
    val a = Seq("x", "x", "y", "y").toDF("c")
    val same = Profiling.jsDivergence(a, a, "c").head()
    assert(same.getLong(0) == 4L && same.getLong(1) == 4L &&
      same.getLong(2) == 2L && same.getDouble(3) == 0.0)
    // disjoint supports -> exactly 1 bit
    val b = Seq("u", "v").toDF("c")
    val far = Profiling.jsDivergence(a, b, "c").head()
    assert(far.getLong(2) == 4L && far.getDouble(3) == 1.0)
    // hand value: p = (.5, .5) on {x, y}; q = (1, 0) -> m = (.75, .25)
    // jsd = .5*(.5*log2(2/3) + .5*log2(2)) + .5*log2(4/3) ≈ 0.311278
    val q = Seq("x").toDF("c")
    val h = Profiling.jsDivergence(a, q, "c").head()
    assert(math.abs(h.getDouble(3) - 0.311278) < 1e-6)
    // null is a category like any other
    val withNull = Seq("x", null: String).toDF("c")
    val nn = Profiling.jsDivergence(withNull, withNull, "c").head()
    assert(nn.getLong(2) == 2L && nn.getDouble(3) == 0.0)
    // empty side: truthful counts, null divergence
    val e = Profiling.jsDivergence(a, a.where(lit(false)), "c").head()
    assert(e.getLong(0) == 4L && e.getLong(1) == 0L && e.isNullAt(3))
  }

  test("chiSquared: 0 on independence, n and V=1 on a determined 2x2, dof 0 on a constant column") {
    import spark.implicits._
    // all four combos equally likely -> every obs == exp -> chi2 = 0
    val indep = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")).toDF("x", "y")
    val r0 = Profiling.chiSquared(indep, "x", "y").head()
    assert(r0.getLong(0) == 4L && r0.getLong(3) == 1L &&
      r0.getDouble(4) == 0.0 && r0.getDouble(5) == 0.0)
    // perfectly determined 2x2 -> chi2 = n, Cramer's V = 1
    val det = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v")).toDF("x", "y")
    val r1 = Profiling.chiSquared(det, "x", "y").head()
    assert(r1.getDouble(4) == 4.0 && r1.getDouble(5) == 1.0)
    // constant column -> r = 1 -> dof 0, chi2 0, V null
    val const = Seq(("a", "u"), ("a", "v")).toDF("x", "y")
    val r2 = Profiling.chiSquared(const, "x", "y").head()
    assert(r2.getLong(1) == 1L && r2.getLong(3) == 0L &&
      r2.getDouble(4) == 0.0 && r2.isNullAt(5))
    // null is a category: (null, w) adds a third row category
    val withNull = Seq(("a", "u"), ("b", "v"), (null, "w")).toDF("x", "y")
    assert(Profiling.chiSquared(withNull, "x", "y").head().getLong(1) == 3L)
  }

  test("ksStatistic: perfect separation -> 1, tie broken to lowest threshold, missing class -> empty") {
    import spark.implicits._
    val perfect = Seq((3.0, true), (2.0, true), (1.0, false)).toDF("s", "l")
    val p = Profiling.ksStatistic(perfect, "s", "l").head()
    assert(p.getDouble(0) == 1.0 && p.getDouble(1) == 2.0)
    // ks 0.5 at thresholds 3 AND 2 -> lowest attaining threshold wins
    val tie = Seq((3.0, true), (2.0, false), (1.0, true)).toDF("s", "l")
    val t = Profiling.ksStatistic(tie, "s", "l").head()
    assert(t.getDouble(0) == 0.5 && t.getDouble(1) == 2.0)
    // single-class corpus has no defined curve
    assert(Profiling.ksStatistic(
      Seq((1.0, true)).toDF("s", "l"), "s", "l").isEmpty)
  }

  // reference Spearman: average-rank transform then Pearson (the operator's
  // documented contract), computed sequentially on driver-side doubles
  private def spearmanModel(xs: Seq[Double], ys: Seq[Double]): Double = {
    def avgRanks(v: Seq[Double]): Seq[Double] =
      v.map(x => v.count(_ < x) + (v.count(_ == x) + 1) / 2.0)
    val (rx, ry) = (avgRanks(xs), avgRanks(ys))
    val n = xs.size.toDouble
    val (sx, sy) = (rx.sum, ry.sum)
    val sxx = rx.map(r => r * r).sum
    val syy = ry.map(r => r * r).sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  test("spearmanMatrix: monotone nonlinear -> 1, reversed -> -1, ties averaged") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val df = xs.map(x => (x, math.exp(x), -x * x * x)).toDF("a", "b", "c")
    val got = Profiling.spearmanMatrix(df, Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("a", "b")) == ((5L, 1.0)))   // monotone increasing, any shape
    assert(got(("a", "c")) == ((5L, -1.0)))  // monotone decreasing
    assert(got(("b", "c")) == ((5L, -1.0)))

    // ties: hand data with a known average-rank model value
    val tx = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val ty = Seq(5.0, 6.0, 7.5, 8.0, 7.5)
    val tied = tx.zip(ty).toDF("a", "b")
    val rho = Profiling.spearmanMatrix(tied, Seq("a", "b"))
      .head().getDouble(3)
    assert(math.abs(rho - spearmanModel(tx, ty)) < 1e-6)
  }

  test("spearmanMatrix: pairwise-complete nulls; zero variance -> null rho") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 10.0, 7.0), (2.0, 20.0, 7.0), (3.0, null, 7.0), (4.0, 40.0, 7.0)
    ).toDF("a", "b", "k")
    val got = Profiling.spearmanMatrix(df, Seq("a", "b", "k"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3))))).toMap
    // (a, b): 3 complete pairs. Ranks come from each column's FULL non-null
    // set (the documented rank-then-pairwise-delete contract), so a's ranks
    // {1,2,4} pair b's {1,2,3}: Pearson = 5/sqrt(14·2/3)/... = 0.981981 —
    // NOT 1.0 (re-ranking within complete cases would give 1.0)
    assert(got(("a", "b")) == ((3L, Some(0.981981))))
    // constant column k: zero rank variance -> null rho, n still counted
    assert(got(("a", "k")) == ((4L, None)))
    assert(got(("b", "k")) == ((3L, None)))
  }

  test("cusumChangepoint: planted level shift peaks at the boundary; constant series ties to earliest") {
    import spark.implicits._
    val dayUs = 86400000000L
    // "shift": 10.0 for days 0-9, 20.0 for days 10-19 -> x̄ = 15,
    // S_t = -5(t+1) down to S_9 = -50, then climbs back to 0
    val rows =
      (0 until 10).map(d => ("shift", d * dayUs, 10.0)) ++
        (10 until 20).map(d => ("shift", d * dayUs, 20.0)) ++
        (0 until 5).map(d => ("flat", d * dayUs, 7.0))
    val got = Profiling.cusumChangepoint(
      rows.toDF("k", "ts", "v"), Seq("k"), "ts", "v", dayUs)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("shift") == ((20L, 9L, -50.0, 50.0)))
    // all-zero cusum: ties resolve to the EARLIEST bucket
    assert(got("flat") == ((5L, 0L, 0.0, 0.0)))
    // two points per bucket average before the cusum sees them
    val dup = Seq(("k", 0L, 1.0), ("k", 1L, 3.0), ("k", dayUs, 8.0))
      .toDF("k", "ts", "v")
    val d = Profiling.cusumChangepoint(dup, Seq("k"), "ts", "v", dayUs).head()
    // buckets: day0 mean 2, day1 mean 8 -> x̄ = 5 -> S = (-3, 0); peak day0
    assert((d.getLong(1), d.getLong(2), d.getDouble(3)) == ((2L, 0L, -3.0)))
  }

  test("linearFit: exact plane recovered with r2 = 1; undersized groups get null fit") {
    import spark.implicits._
    // y = 3 + 2*x1 - 5*x2, noise-free on 4 non-collinear points
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (2.0, 3.0))
    val df = pts.map { case (x1, x2) => ("a", x1, x2, 3.0 + 2.0 * x1 - 5.0 * x2) }
      .toDF("g", "x1", "x2", "y")
      // 3 rows cannot support 3 coefficients + residual dof gate (n > d)
      .union(Seq(("b", 0.0, 0.0, 1.0), ("b", 1.0, 1.0, 2.0))
        .toDF("g", "x1", "x2", "y"))
    val got = Profiling.linearFit(df, Seq("g"), Seq("x1", "x2"), "y")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5))))
      .toMap
    assert(got("a") == ((4L, Some(3.0), Some(2.0), Some(-5.0), Some(1.0))))
    assert(got("b") == ((2L, None, None, None, None)))
  }

  test("linearFit: single feature agrees with groupTrend's closed form") {
    import spark.implicits._
    val df = Seq(("a", 0.0, 1.2), ("a", 1.0, 2.9), ("a", 2.0, 5.4),
      ("a", 3.0, 6.8)).toDF("g", "x", "y")
    val fit = Profiling.linearFit(df, Seq("g"), Seq("x"), "y").head()
    val trend = Profiling.groupTrend(df, Seq("g"), "x", "y").head()
    assert(fit.getDouble(2) == trend.getDouble(3)) // intercept
    assert(fit.getDouble(3) == trend.getDouble(2)) // beta_x == slope
    assert(fit.getDouble(4) > 0.9 && fit.getDouble(4) <= 1.0)
  }

  test("linearFit: ridge shrinks the coefficient by the hand closed form; r2 uses true residuals") {
    import spark.implicits._
    // y = 2x on x = -1, 0, 1 (centered: sx = 0, sxx = 2, sxy = 4)
    val df = Seq(("a", -1.0, -2.0), ("a", 0.0, 0.0), ("a", 1.0, 2.0))
      .toDF("g", "x", "y")
    val ols = Profiling.linearFit(df, Seq("g"), Seq("x"), "y").head()
    assert((ols.getDouble(2), ols.getDouble(3), ols.getDouble(4)) ==
      ((0.0, 2.0, 1.0)))
    // ridged normal matrix [[3, 0], [0, 2 + 2]] -> beta = 4/4 = 1
    val rr = Profiling.linearFit(df, Seq("g"), Seq("x"), "y", ridge = 2.0)
      .head()
    assert((rr.getDouble(2), rr.getDouble(3)) == ((0.0, 1.0)))
    // SSE with beta 1: (1-2)^2 * 2 = 2 off a SST of 8 -> r2 = 0.75
    assert(rr.getDouble(4) == 0.75)
  }

  test("linearFit: ONE corpus pass — the per-group solve is scalar math on the aggregate row") {
    val df = Queries.byName("q70_linear_fit")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"linearFit must scan the table once, found $scans scans:\n${plan.take(4000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"the Cramer solve must not join:\n${plan.take(4000)}")
  }

  test("spearmanMatrix plan: no unpartitioned window — ranks ride the sliced prefix sum") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toDouble % 37, (i * 7 % 41).toDouble))
      .toDF("a", "b")
    val plan = Profiling.spearmanMatrix(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    // a window specced directly on a value column would be the global form;
    // the prefix sum's windows partition by _ps_pid
    assert(!plan.contains("windowspecdefinition(a") &&
      !plan.contains("windowspecdefinition(b"),
      s"ranks must come from the sliced prefix sum:\n${plan.take(3000)}")
  }

  test("c09 conformal: coverage ~= 1 - alpha on held-out noise; qhat covers exactly that share of calibration") {
    import spark.implicits._
    // y = 10 + 2x + uniform-ish deterministic noise in [-1, 1]
    val rows = (0 until 3000).map { i =>
      val x = (i % 100).toDouble / 10.0
      val noise = ((i * 2654435761L % 2001) - 1000) / 1000.0
      (i.toLong, "g", x, 10.0 + 2.0 * x + noise)
    }.toDF("id", "g", "x", "y")
    val split = graft.operators.TextAnalysis.deterministicSplit(rows, "id")
    val fit = Profiling.linearFit(
      split.where(col("split") === "train"), Seq("g"), Seq("x"), "y")
      .select(col("g"), col("intercept"), col("beta_x"))
    val scored = split.join(broadcast(fit), Seq("g"))
      .withColumn("resid",
        abs(col("y") - (col("intercept") + col("beta_x") * col("x"))))
    val qhat = graft.operators.Quantiles.exactGrouped(
      scored.where(col("split") === "validation"), Seq("g"), "resid",
      Seq("qhat" -> 0.9)).head().getDouble(1)
    // noise is ~uniform on [-1, 1] -> the 0.9-quantile of |resid| ~= 0.9
    assert(qhat > 0.8 && qhat < 1.0, s"qhat off the known noise scale: $qhat")
    val cov = scored.where(col("split") === "test")
      .agg(avg(when(col("resid") <= qhat, 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(cov > 0.84 && cov < 0.96,
      s"held-out coverage must land near 0.9: $cov")
  }

  test("giniConcentration: hand values — equality 0, monopoly -> (n-1)/n, ties invariant, negatives null") {
    import spark.implicits._
    val df = Seq(
      ("eq", 5.0), ("eq", 5.0), ("eq", 5.0), ("eq", 5.0),      // perfect equality
      ("mono", 0.0), ("mono", 0.0), ("mono", 0.0), ("mono", 12.0), // one unit owns all
      ("mix", 1.0), ("mix", 2.0), ("mix", 3.0),                // hand: G = 2/9
      ("neg", -1.0), ("neg", 5.0),                             // undefined
      ("zero", 0.0), ("zero", 0.0)                             // total 0
    ).toDF("g", "v")
    val got = Profiling.giniConcentration(df, Seq("g"), "v")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), Option(r.get(3))))
      .toMap
    assert(got("eq") == ((4L, 20.0, Some(0.0))))
    // monopoly with n=4: G = (n-1)/n = 0.75
    assert(got("mono") == ((4L, 12.0, Some(0.75))))
    // 1,2,3: S = 1+4+9 = 14, T = 6, n = 3 -> (28 - 24)/18 = 2/9
    val twoNinths = BigDecimal(2.0 / 9 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("mix") == ((3L, 6.0, Some(twoNinths))))
    assert(got("neg")._3.isEmpty && got("zero")._3.isEmpty)
    // tie invariance: shuffled duplicates give the same G
    val tied = Seq(("t", 2.0), ("t", 2.0), ("t", 8.0), ("t", 2.0)).toDF("g", "v")
    val g1 = Profiling.giniConcentration(tied, Seq("g"), "v").head().getDouble(3)
    val g2 = Profiling.giniConcentration(
      tied.orderBy(rand(7)), Seq("g"), "v").head().getDouble(3)
    assert(g1 == g2)
  }

  test("theilSen: hand medians; breakdown resistance; degenerate groups omitted; layout-deterministic") {
    import spark.implicits._
    // slopes over (0,0),(1,1),(2,2),(3,10): [1,1,1,3.333333,4.5,8] ->
    // median 2.166667; residual medians -> intercept -0.583333
    val hand = Seq(("g", 0.0, 0.0), ("g", 1.0, 1.0), ("g", 2.0, 2.0),
      ("g", 3.0, 10.0)).toDF("g", "x", "y")
    val h = Profiling.theilSen(hand, Seq("g"), "x", "y").head()
    assert((h.getLong(1), h.getLong(2)) === ((4L, 6L)))
    assert(h.getDouble(3) === 2.166667)
    assert(h.getDouble(4) === -0.583333)

    // breakdown: one wild outlier leaves the slope at EXACTLY 1 (6 of the
    // 10 pairwise slopes are clean-pair slopes = 1, so both middles are 1)
    // — the property OLS cannot have
    val robust = Seq(("r", 0.0, 0.0), ("r", 1.0, 1.0), ("r", 2.0, 2.0),
      ("r", 3.0, 3.0), ("r", 4.0, 100.0)).toDF("g", "x", "y")
    val r = Profiling.theilSen(robust, Seq("g"), "x", "y").head()
    assert(r.getDouble(3) === 1.0)
    val ols = Profiling.groupTrend(robust, Seq("g"), "x", "y")
      .head().getAs[Double]("slope")
    assert(ols > 10.0, "OLS must be dragged by the outlier for contrast")

    // a single point and an all-same-x group have no defined pair -> omitted
    val degenerate = Seq(("one", 1.0, 5.0), ("samex", 2.0, 1.0),
      ("samex", 2.0, 9.0)).toDF("g", "x", "y")
    assert(Profiling.theilSen(degenerate, Seq("g"), "x", "y").count() === 0)

    // layout determinism: the rounded trajectory survives repartitioning
    val big = (0 until 60).map(i =>
      ("k", i.toDouble, (i % 7).toDouble + 3 * i)).toDF("g", "x", "y")
    val a = Profiling.theilSen(big, Seq("g"), "x", "y").head()
    val b = Profiling.theilSen(big.repartition(11), Seq("g"), "x", "y").head()
    assert((a.getDouble(3), a.getDouble(4)) === ((b.getDouble(3), b.getDouble(4))))
  }

  test("mannKendall: hand S and tie-corrected variance; zero-variance nulls; direction and significance") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // strictly increasing triple: S = 3, no ties -> Var = 3*2*11/18
    val up = Seq(("g", 0.0, 1.0), ("g", 1.0, 2.0), ("g", 2.0, 3.0))
      .toDF("g", "x", "y")
    val u = Profiling.mannKendall(up, Seq("g"), "x", "y").head()
    assert((u.getLong(1), u.getLong(2)) === ((3L, 3L)))
    val varS = 3.0 * 2 * 11 / 18
    assert(u.getDouble(3) === r6(varS))
    assert(u.getDouble(4) === r6(2.0 / math.sqrt(varS)))
    assert(u.getDouble(5) > 0.0 && u.getDouble(5) < 0.35)

    // all-tied y: S = 0 and the tie term cancels the variance -> null z/p
    val tied = Seq(("t", 0.0, 5.0), ("t", 1.0, 5.0), ("t", 2.0, 5.0))
      .toDF("g", "x", "y")
    val t = Profiling.mannKendall(tied, Seq("g"), "x", "y").head()
    assert(t.getLong(2) === 0L && t.getDouble(3) === 0.0)
    assert(t.isNullAt(4) && t.isNullAt(5))

    // long monotone decrease: S = -n(n-1)/2, z < 0, p ~ 0; a single-point
    // group has no pair and is omitted
    val down = (0 until 30).map(i => ("d", i.toDouble, -i.toDouble)) :+
      (("solo", 0.0, 1.0))
    val d = Profiling.mannKendall(down.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!d.contains("solo"))
    assert(d("d").getLong(2) === -(30L * 29 / 2))
    assert(d("d").getDouble(4) < -6.0 && d("d").getDouble(5) === 0.0)

    // partial ties: y = [1, 2, 2, 3] -> S = 5, tie term for t=2 is 2*1*9
    val pt = Seq(("p", 0.0, 1.0), ("p", 1.0, 2.0), ("p", 2.0, 2.0),
      ("p", 3.0, 3.0)).toDF("g", "x", "y")
    val p = Profiling.mannKendall(pt, Seq("g"), "x", "y").head()
    assert(p.getLong(2) === 5L)
    assert(p.getDouble(3) === r6((4.0 * 3 * 13 - 2 * 1 * 9) / 18))
  }

  test("linearFit randomized: noise-free planes recovered exactly across shapes and partitionings") {
    import spark.implicits._
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729)
      val d = 1 + rnd.nextInt(3)
      val beta = Vector.fill(d + 1)((rnd.nextInt(41) - 20) / 4.0) // 6dp-exact
      val n = 10 + rnd.nextInt(200)
      val rows = (0 until n).map { _ =>
        val x = Vector.fill(d)((rnd.nextInt(2001) - 1000) / 100.0)
        val y = beta(0) + (0 until d).map(i => beta(i + 1) * x(i)).sum
        ("g", x, y)
      }
      val df = rows.toDF("g", "x", "y")
        .select(col("g") +: (0 until d).map(i =>
          element_at(col("x"), i + 1).as(s"x$i")) :+ col("y"): _*)
        .repartition(1 + rnd.nextInt(5))
      val fit = Profiling.linearFit(df, Seq("g"),
        (0 until d).map(i => s"x$i"), "y").head()
      val got = (0 to d).map(i => fit.getDouble(2 + i))
      val r2 = Option(fit.get(2 + d + 1)).map(_.asInstanceOf[Double])
      // noise-free, well-conditioned integers/4 -> coefficients exact at 6dp
      assert(got.zip(beta).forall { case (a, b) => math.abs(a - b) < 2e-6 },
        s"seed=$seed d=$d: $got vs $beta")
      // constant y (all slopes drawn 0) has SST = 0 -> null r2 by contract
      assert(r2.forall(_ >= 0.999999) &&
        (r2.nonEmpty || rows.map(_._3).distinct.size == 1),
        s"seed=$seed: r2=$r2")
    }
  }

  test("equiDepthHistogram: hand model — rank-based buckets, tie runs split " +
      "deterministically, nulls excluded, NDV per bucket exact") {
    import spark.implicits._
    // n=8, B=2: ranks 1-4 -> bucket 0, 5-8 -> bucket 1
    val even = Seq(1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val h1 = Profiling.equiDepthHistogram(even, "v", Seq("id"), 2)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(h1(0L) == ((1.0, 2.0, 4L, 2L)))
    assert(h1(1L) == ((3.0, 4.0, 4L, 2L)))
    // n=5, B=2 with a tie run (2,2,2) crossing the boundary:
    // bucket = (rank-1)*2 div 5 -> ranks 1-3 bucket 0, ranks 4-5 bucket 1
    val ties = Seq[(java.lang.Double, Long)](
      (1.0, 0L), (2.0, 1L), (2.0, 2L), (2.0, 3L), (3.0, 4L), (null, 5L))
      .toDF("v", "id")
    val h2 = Profiling.equiDepthHistogram(ties, "v", Seq("id"), 2)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(h2(0L) == ((1.0, 2.0, 3L, 2L)), s"got $h2") // 1,2,2
    assert(h2(1L) == ((2.0, 3.0, 2L, 2L)), s"got $h2") // 2,3
  }

  test("histEqualitySelectivity: sums n_rows/ndv across boundary-crossing " +
      "buckets; misses estimate 0") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, Long)](
      (1.0, 0L), (2.0, 1L), (2.0, 2L), (2.0, 3L), (3.0, 4L)).toDF("v", "id")
    val hist = Profiling.equiDepthHistogram(df, "v", Seq("id"), 2)
    val probes = Seq(2.0, 5.0).toDF("p")
    val got = Profiling.histEqualitySelectivity(hist, probes, "p")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // v=2 spans both buckets: 3/2 + 2/2 = 2.5 (true count 3); v=5 misses
    assert(got(2.0) == 2.5 && got(5.0) == 0.0, s"got $got")
  }

  test("equiDepthHistogram plan: no unpartitioned window — bucket rank rides " +
      "the sliced prefix sum; invariants hold on real data") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val h = Profiling.equiDepthHistogram(
      li, "l_quantity", Seq("l_orderkey", "l_linenumber"), 16)
    val plan = h.queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") || !plan.contains("windowspecdefinition()"),
      "global window leaked into the histogram plan")
    val rows = h.collect().sortBy(_.getLong(0))
    val n = li.filter(org.apache.spark.sql.functions.col("l_quantity").isNotNull).count()
    assert(rows.map(_.getLong(3)).sum == n, "bucket rows must partition the corpus")
    assert(rows.length == 16)
    // equi-depth: bucket sizes differ by at most 1... they can differ by
    // more only through div flooring; bound = ceil(n/B) - floor(n/B) + 1
    val sizes = rows.map(_.getLong(3))
    assert(sizes.max - sizes.min <= 1, s"sizes not equi-depth: ${sizes.toSeq}")
    // buckets tile the value range in order (lo/hi monotone)
    val los = rows.map(_.getDouble(1)); val his = rows.map(_.getDouble(2))
    assert(los.zip(his).forall { case (l, hgh) => l <= hgh })
    assert(his.init.zip(los.tail).forall { case (h0, l1) => h0 <= l1 })
  }
}
