package graft

import org.apache.spark.sql.functions._

import graft.operators.{Experiment, Profiling}

class ExperimentSpec extends SparkSpec {

  test("abProportionZTest: hand model — pooled z, rates, shared z across rows") {
    import spark.implicits._
    val df = (Seq.fill(2)(("control", true)) ++ Seq.fill(2)(("control", false)) ++
      Seq.fill(3)(("treatment", true)) ++ Seq.fill(1)(("treatment", false)))
      .toDF("variant", "ok")
    val got = Experiment.abProportionZTest(df, "variant", "ok", "control", "treatment")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val p = 5.0 / 8.0
    val z = (0.75 - 0.5) / math.sqrt(p * (1 - p) * (1.0 / 4 + 1.0 / 4))
    val zr = math.rint((z + 1e-9) * 1e6) / 1e6
    assert(got("control") == ((4L, 2L, 0.5, zr)))
    assert(got("treatment") == ((4L, 3L, 0.75, zr)))
  }

  test("abProportionZTest: degenerate pools and missing variants give null z") {
    import spark.implicits._
    val allWin = Seq(("control", true), ("treatment", true)).toDF("variant", "ok")
    assert(Experiment.abProportionZTest(allWin, "variant", "ok", "control", "treatment")
      .collect().forall(_.isNullAt(4)))
    val oneArm = Seq(("control", true), ("control", false)).toDF("variant", "ok")
    val rows = Experiment.abProportionZTest(oneArm, "variant", "ok", "control", "treatment")
      .collect()
    assert(rows.length == 1 && rows.forall(_.isNullAt(4)))
  }

  test("abProportionZTest: null outcomes are excluded from trials, not counted as failures") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Boolean)](
      ("control", true), ("control", false),
      ("treatment", true), ("treatment", null), ("treatment", null)
    ).toDF("variant", "ok")
    val got = Experiment.abProportionZTest(df, "variant", "ok", "control", "treatment")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("treatment") == ((1L, 1L))) // the two null outcomes are gone
    assert(got("control") == ((2L, 1L)))
  }

  test("cuped: null pre/post units are complete-case excluded, not mixed into sums") {
    import spark.implicits._
    val clean = Seq(("a", 1.0, 9.0), ("a", 2.0, 11.0), ("b", 3.0, 13.0))
    val dirty = clean.map { case (v, x, y) =>
      (v, java.lang.Double.valueOf(x), java.lang.Double.valueOf(y))
    } ++ Seq(("a", null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(99.0)),
      ("b", java.lang.Double.valueOf(50.0), null.asInstanceOf[java.lang.Double]))
    val want = Experiment.cuped(clean.toDF("variant", "pre", "post"),
      "variant", "pre", "post").collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val got = Experiment.cuped(dirty.toDF("variant", "pre", "post"),
      "variant", "pre", "post").collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(got == want)
  }

  test("wilsonIntervals: hand model — brackets the rate, stays inside [0,1]") {
    import spark.implicits._
    // 8/10 successes at z=1.96: the textbook Wilson numbers
    val df = (Seq.fill(8)(("v", true)) ++ Seq.fill(2)(("v", false))).toDF("variant", "ok")
    val r = Experiment.wilsonIntervals(df, "variant", "ok").head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 8L && r.getDouble(3) == 0.8)
    val (lo, hi) = (r.getDouble(4), r.getDouble(5))
    def wilson(p: Double, n: Double, z: Double) = {
      val denom = 1.0 + z * z / n
      val c = (p + z * z / (2 * n)) / denom
      val h = (z / denom) * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
      def rd(x: Double) = BigDecimal(x + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (rd(c - h), rd(c + h))
    }
    assert((lo, hi) == wilson(0.8, 10, 1.96))
    assert(lo < 0.8 && 0.8 < hi && lo > 0.0 && hi < 1.0)
    // extreme rates: the interval never leaves [0, 1]
    val all = Seq.fill(5)(("v", true)).toDF("variant", "ok")
    val re = Experiment.wilsonIntervals(all, "variant", "ok").head()
    assert(re.getDouble(3) == 1.0 && re.getDouble(5) <= 1.0 && re.getDouble(4) < 1.0)
  }

  test("cuped: perfectly predictive covariate — theta exact, adjusted means collapse") {
    import spark.implicits._
    // post = 2*pre + 7 for every unit -> theta = 2, y' identical everywhere
    val units = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 5.0), ("b", 3.0), ("b", 8.0), ("b", 13.0)
    ).map { case (v, x) => (v, x, 2 * x + 7) }.toDF("variant", "pre", "post")
    val got = Experiment.cuped(units, "variant", "pre", "post")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val meanPre = (1.0 + 2 + 5 + 3 + 8 + 13) / 6
    val expectedAdj = math.rint((7 + 2 * meanPre + 1e-9) * 1e6) / 1e6
    assert(got("a")._3 == 2.0 && got("b")._3 == 2.0) // theta
    assert(got("a")._2 == expectedAdj && got("b")._2 == expectedAdj)
    assert(got("a")._4 == 1.0 && got("b")._4 == 1.0) // var_reduction
    // raw means differ (b's units are larger) but adjustment removed it all
    assert(got("a")._1 != got("b")._1)
  }

  test("cuped: zero-variance covariate — null theta, adjusted == raw") {
    import spark.implicits._
    val units = Seq(("a", 5.0, 1.0), ("a", 5.0, 3.0), ("b", 5.0, 2.0))
      .toDF("variant", "pre", "post")
    val got = Experiment.cuped(units, "variant", "pre", "post")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.isNullAt(4)))).toMap
    assert(got("a") == ((2.0, 2.0, true)))
    assert(got("b") == ((2.0, 2.0, true)))
  }

  test("targetEncode: out-of-fold algebra holds and own fold is excluded") {
    import spark.implicits._
    val df = (1L to 200L).map(i =>
      (i, if (i % 3 == 0) "x" else "y", (i % 10).toDouble)).toDF("id", "cat", "t")
    val enc = Profiling.targetEncode(df, "id", "cat", "t", 4).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    // independent recomputation of per-(cat, fold) sums via the same hash
    val folds = df.select(col("cat"), col("t"),
      pmod(graft.operators.Dedup.hash56(col("id").cast("string")), lit(4L)).as("fold"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(1)))
    val byCatFold = folds.groupBy(x => (x._1, x._2))
      .view.mapValues(v => (v.size.toLong, v.map(_._3).sum)).toMap
    val byCat = folds.groupBy(_._1)
      .view.mapValues(v => (v.size.toLong, v.map(_._3).sum)).toMap
    assert(enc.nonEmpty)
    for (((cat, fold), (nOof, e)) <- enc) {
      val (na, sa) = byCat(cat)
      val (nf, sf) = byCatFold((cat, fold))
      assert(nOof == na - nf)
      val want = math.rint(((sa - sf) / (na - nf) + 1e-9) * 1e6) / 1e6
      assert(e == want, s"($cat, $fold): $e vs $want")
    }
  }

  test("targetEncode: single-fold category encodes to null (no out-of-fold rows)") {
    import spark.implicits._
    // one row -> its category has exactly one fold
    val df = Seq((1L, "solo", 9.0), (2L, "big", 1.0), (3L, "big", 2.0),
      (4L, "big", 3.0), (5L, "big", 4.0)).toDF("id", "cat", "t")
    val enc = Profiling.targetEncode(df, "id", "cat", "t", 2).collect()
      .map(r => r.getString(0) -> r.isNullAt(3)).toMap.view
    assert(enc.toMap.getOrElse("solo", false),
      "solo category must encode to null")
  }

  test("mannWhitneyU: hand values with and without ties; degenerate and missing-side nulls") {
    import spark.implicits._
    def mw(rows: Seq[(String, Double)]) = Experiment.mannWhitneyU(
      rows.toDF("g", "x"), "g", "x", "control", "treatment").head()
    // no ties: control {1,2}, treatment {3,4} -> ranks 1..4, R_c = 3,
    // U_c = 0; sigma^2 = 4*5/12; z = -2/sqrt(5/3) = -1.549193
    val a = mw(Seq(("control", 1.0), ("control", 2.0),
      ("treatment", 3.0), ("treatment", 4.0)))
    assert(a.getLong(0) == 2L && a.getLong(1) == 2L)
    assert(a.getDouble(2) == 0.0)
    assert(math.abs(a.getDouble(3) - -1.549193) < 1e-6)
    assert(a.getDouble(4) == 1.0) // control stochastically smaller
    // ties: control {1,1}, treatment {1,2}: midrank(1) = 2, midrank(2) = 4
    // -> R_c = 4, U_c = 1; ties term 24 -> sigma^2 = 1 -> z = -1
    val b = mw(Seq(("control", 1.0), ("control", 1.0),
      ("treatment", 1.0), ("treatment", 2.0)))
    assert(b.getDouble(2) == 1.0 && b.getDouble(3) == -1.0)
    // every value tied -> no ordering signal -> z null (U is still defined)
    val c = mw(Seq(("control", 5.0), ("treatment", 5.0)))
    assert(c.isNullAt(3))
    // missing side -> null counts and null z
    val d = mw(Seq(("control", 1.0), ("control", 2.0)))
    assert(d.isNullAt(1) && d.isNullAt(3))
  }

  test("meanZTests: z against hand moments; p matches the A-S closed form; constant corpus -> nulls") {
    import spark.implicits._
    // corpus: g1 = {1, 3}, g2 = {5, 7} -> mean 4, pop var 5
    val df = Seq(("g1", 1.0), ("g1", 3.0), ("g2", 5.0), ("g2", 7.0))
      .toDF("grp", "v")
    val got = Experiment.meanZTests(df, "grp", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val zWant = (2.0 - 4.0) / (math.sqrt(5.0) / math.sqrt(2.0))
    val z6 = math.rint((zWant + 1e-9) * 1e6) / 1e6
    assert(got("g1")._1 == 2L && got("g1")._2 == 2.0)
    assert(math.abs(got("g1")._3 - z6) < 1e-9)
    assert(math.abs(got("g1")._3 + got("g2")._3) < 1e-9) // symmetric
    // p from the documented polynomial: two-sided, |eps| < 7.5e-8
    def sfAS(z: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * z)
      val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
        t * (-1.821255978 + t * 1.330274429))))
      math.exp(-z * z / 2.0) / math.sqrt(2.0 * math.Pi) * poly
    }
    assert(math.abs(got("g1")._4 - 2.0 * sfAS(math.abs(z6))) < 1e-5)
    // zero corpus variance -> null z and p
    val const = Seq(("g1", 7.0), ("g2", 7.0)).toDF("grp", "v")
    val c = Experiment.meanZTests(const, "grp", "v").collect()
    assert(c.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("bhAdjust: step-up q-values, ties keyed, null p excluded from m") {
    import spark.implicits._
    val tests = Seq[(String, java.lang.Double)](
      ("a", 0.01), ("b", 0.02), ("c", 0.02), ("d", 0.5), ("e", null)
    ).toDF("group", "p")
    val got = Experiment.bhAdjust(tests, "group", "p", alpha = 0.05)
      .collect()
      .map(r => r.getString(0) ->
        ((Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))))
      .toMap
    // m = 4 (e's null p excluded); ranks a=1, b=2, c=3 (tie keyed), d=4
    // raw = a:0.04 b:0.04 c:0.026667 d:0.5; suffix-min collapses a..c
    assert(got("a") == ((Some(1L), Some(0.026667), Some(true))))
    assert(got("b") == ((Some(2L), Some(0.026667), Some(true))))
    assert(got("c") == ((Some(3L), Some(0.026667), Some(true))))
    assert(got("d") == ((Some(4L), Some(0.5), Some(false))))
    assert(got("e") == ((None, None, None)))
  }

  test("kaplanMeier: hand curve — censoring shrinks risk set without dropping S; full exit pins 0") {
    import spark.implicits._
    val day = 86400L
    // (user, event days): uZ defines corpus max at day 10 and is censored
    // (dur 0); uB's last event is 2 days before max -> censored at dur 2
    val events = Seq(
      "uA" -> Seq(0L, 1L), "uB" -> Seq(6L, 8L), "uC" -> Seq(0L, 3L),
      "uD" -> Seq(1L, 2L, 4L), "uE" -> Seq(0L, 4L), "uF" -> Seq(2L, 7L),
      "uZ" -> Seq(10L)
    ).flatMap { case (u, ds) => ds.map(dd => (u, dd * day)) }
      .toDF("user_id", "sec")
      .select(col("user_id"), to_timestamp(col("sec")).as("ts"))
    val got = Experiment.kaplanMeier(events, "user_id", "ts", horizonDays = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(0L) == ((7L, 0L, 1L, 1.0)))       // uZ censored, S holds
    assert(got(1L) == ((6L, 1L, 0L, 0.833333)))  // 5/6
    assert(got(2L) == ((5L, 0L, 1L, 0.833333)))  // uB censored, S holds
    assert(got(3L) == ((4L, 2L, 0L, 0.416667)))  // 5/6 · 1/2
    assert(got(4L) == ((2L, 1L, 0L, 0.208333)))  // 5/24
    assert(got(5L) == ((1L, 1L, 0L, 0.0)))       // full exit -> exactly 0
  }

  test("timeToFirst + curve: failure clock from first event, never-failed censored at corpus max") {
    import spark.implicits._
    val day = 86400L
    val events = Seq(
      ("u1", 0L, "view"), ("u1", 2L, "error"), ("u1", 5L, "click"),
      ("u2", 1L, "view"), ("u2", 4L, "view"),      // never fails
      ("u3", 0L, "error"),                         // fails immediately
      ("u4", 10L, "click")                         // defines corpus max
    ).map { case (u, dd, et) => (u, dd * day, et) }
      .toDF("user_id", "sec", "event_type")
      .select(col("user_id"), to_timestamp(col("sec")).as("ts"),
        col("event_type"))
    val subj = Experiment.timeToFirst(
      events, "user_id", "ts", "event_type", "error")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(subj == Map(
      "u1" -> ((2L, true)), "u2" -> ((9L, false)),
      "u3" -> ((0L, true)), "u4" -> ((0L, false))))
    val curve = Experiment.kaplanMeierCurve(
      Experiment.timeToFirst(events, "user_id", "ts", "event_type", "error"),
      "duration_days", "observed")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(curve(0L) == ((4L, 1L, 1L, 0.75)))
    assert(curve(2L) == ((2L, 1L, 0L, 0.375)))
    assert(curve(9L) == ((1L, 0L, 1L, 0.375)))
  }

  test("logRank: hand hypergeometric table; identical groups -> chi2 0; no events -> null") {
    import spark.implicits._
    // A: event@1, event@2, censored@3 / B: censored@1, event@2, event@4
    // t=1: n=6, d_b=0, e_b=0.5, v=0.25 ; t=2: n=4, d_b=1, e_b=1, v=1/3
    // t=4: n=1, d_b=1, e_b=1, v=0  => chi2 = (2-2.5)^2 / (0.25+1/3) = 0.428571
    val subj = Seq(
      ("A", 1L, true), ("A", 2L, true), ("A", 3L, false),
      ("B", 1L, false), ("B", 2L, true), ("B", 4L, true)
    ).toDF("grp", "dur", "obs")
    val r = Experiment.logRank(subj, "dur", "obs", "grp", "A", "B").head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert((r.getLong(2), r.getLong(3)) == ((2L, 2L)))
    assert(r.getDouble(4) == 2.5)        // expected_b
    assert(r.getDouble(5) == 0.428571)   // chi2
    // p from the documented A-S polynomial on sqrt(rounded chi2)
    def sfAS(z: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * z)
      val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
        t * (-1.821255978 + t * 1.330274429))))
      math.exp(-z * z / 2.0) / math.sqrt(2.0 * math.Pi) * poly
    }
    assert(math.abs(r.getDouble(6) - 2.0 * sfAS(math.sqrt(0.428571))) < 1e-5)

    // same event pattern in both groups -> observed == expected -> chi2 0
    val same = Seq(
      ("A", 1L, true), ("A", 2L, true), ("B", 1L, true), ("B", 2L, true)
    ).toDF("grp", "dur", "obs")
    assert(Experiment.logRank(same, "dur", "obs", "grp", "A", "B")
      .head().getDouble(5) == 0.0)

    // all censored: no event times -> zero variance -> null chi2 and p
    val none = Seq(("A", 1L, false), ("B", 2L, false)).toDF("grp", "dur", "obs")
    val n = Experiment.logRank(none, "dur", "obs", "grp", "A", "B").head()
    assert(n.isNullAt(5) && n.isNullAt(6))
  }

  test("bhAdjust: q clamps to 1; single hypothesis passes through its own p") {
    import spark.implicits._
    val big = Seq(("x", 0.9), ("y", 0.95)).toDF("group", "p")
    val gotBig = Experiment.bhAdjust(big, "group", "p")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // x: min(0.9*2/1, 0.95*2/2 = 0.95) = 0.95; y: 0.95 (both < clamp)
    assert(gotBig("x") == 0.95 && gotBig("y") == 0.95)
    val clamp = Seq(("x", 0.8)).toDF("group", "p")
    // m = 1: q = min(p*1/1) = p
    assert(Experiment.bhAdjust(clamp, "group", "p")
      .head().getDouble(3) == 0.8)
  }

  test("welchTTest: hand moments — t, Welch-Satterthwaite df, two-sided p; degenerate sides null") {
    import spark.implicits._
    // control (2, 4, 6): n=3 mean=4 var=4; treatment (1, 2): n=2 mean=1.5 var=0.5
    val df = Seq(("c", 2.0), ("c", 4.0), ("c", 6.0), ("t", 1.0), ("t", 2.0))
      .toDF("g", "v")
    val r = Experiment.welchTTest(df, "g", "v", "c", "t").head()
    def r6(x: Double) = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)))
    assert((r.getDouble(2), r.getDouble(3)) == ((4.0, 1.5)))
    val se2 = 4.0 / 3 + 0.5 / 2
    val t = r6(2.5 / math.sqrt(se2))
    assert(r.getDouble(4) == t)
    val df2 = r6(se2 * se2 /
      (math.pow(4.0 / 3, 2) / 2 + math.pow(0.5 / 2, 2) / 1))
    assert(r.getDouble(5) == df2)
    // p in (0, 1), smaller than 2*sf(1) since |t| > 1
    assert(r.getDouble(6) > 0.0 && r.getDouble(6) < 0.7)
    // a single-row side cannot estimate its variance -> null t/df/p
    val one = Seq(("c", 2.0), ("c", 3.0), ("t", 1.0)).toDF("g", "v")
    val r2 = Experiment.welchTTest(one, "g", "v", "c", "t").head()
    assert(r2.isNullAt(4) && r2.isNullAt(5) && r2.isNullAt(6))
    // both sides constant: zero pooled se -> null rather than a blowup
    val const = Seq(("c", 5.0), ("c", 5.0), ("t", 5.0), ("t", 5.0))
      .toDF("g", "v")
    val r3 = Experiment.welchTTest(const, "g", "v", "c", "t").head()
    assert(r3.isNullAt(4) && r3.isNullAt(6))
  }

  test("kruskalWallis: hand H values with and without ties; equal rank sums pin 0; degenerate nulls") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // clean separation, no ties: ranks 1..6, R = (3, 7, 11) ->
    // H = 12/(6*7) * (9/2 + 49/2 + 121/2) - 3*7 = 32/7
    val sep = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val s = Experiment.kruskalWallis(sep, "g", "v").head()
    assert((s.getLong(0), s.getLong(1), s.getLong(3)) === ((3L, 6L, 2L)))
    assert(s.getDouble(2) === r6(32.0 / 7))
    assert(s.getDouble(5) > 0.09 && s.getDouble(5) < 0.12,
      s"exact sf(32/7, df 2) = e^{-16/7} ~ 0.1017, WH must land close: ${s.getDouble(5)}")

    // balanced rank sums: R = (7, 7, 7) -> H exactly 0, p -> ~1
    val bal = Seq(("a", 1.0), ("a", 6.0), ("b", 2.0), ("b", 5.0),
      ("c", 3.0), ("c", 4.0)).toDF("g", "v")
    val b = Experiment.kruskalWallis(bal, "g", "v").head()
    assert(b.getDouble(2) === 0.0)
    assert(b.getDouble(5) > 0.95)

    // ties: independent Scala replication of midranks + tie correction
    val rows = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0), ("c", 2.0))
    val pooled = rows.map(_._2).sorted
    def midrank(x: Double) =
      (pooled.indexOf(x) + 1 + pooled.lastIndexOf(x) + 1) / 2.0
    val rsums = rows.groupBy(_._1).view
      .mapValues(g => (g.size, g.map(r => midrank(r._2)).sum)).toMap
    val nn = rows.size.toDouble
    val tieTerm = pooled.groupBy(identity).values
      .map(_.size.toDouble).map(t => t * t * t - t).sum
    val hExpect = r6(
      (12.0 / (nn * (nn + 1)) *
        rsums.values.map { case (n, r) => r * r / n }.sum - 3 * (nn + 1)) /
        (1.0 - tieTerm / (nn * nn * nn - nn)))
    val t = Experiment.kruskalWallis(rows.toDF("g", "v"), "g", "v").head()
    assert(t.getDouble(2) === hExpect)

    // ALL values tied: the correction divides out every rank -> nulls
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val c = Experiment.kruskalWallis(const, "g", "v").head()
    assert(c.isNullAt(2) && c.isNullAt(4) && c.isNullAt(5))

    // a single group has no between-group question -> nulls
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val o = Experiment.kruskalWallis(one, "g", "v").head()
    assert(o.getLong(0) === 1L && o.isNullAt(2) && o.isNullAt(5))
  }

  test("bradleyTerry: hand-unrolled MM rounds; sum-1; dominance order; never-winner pins 0") {
    import spark.implicits._
    // A beats B twice, B beats A once, A beats C once, C beats B once
    val trials = Seq(
      ("A", "B"), ("A", "B"), ("B", "A"), ("A", "C"), ("C", "B"))
      .toDF("winner", "loser")
    def r6(x: Double) = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // independent replication of Hunter's MM over plain Scala collections,
    // same 6dp rounding at each boundary
    val wins = Map("A" -> 3.0, "B" -> 1.0, "C" -> 1.0)
    val n = Map(("A", "B") -> 3.0, ("B", "A") -> 3.0,
      ("A", "C") -> 1.0, ("C", "A") -> 1.0,
      ("B", "C") -> 1.0, ("C", "B") -> 1.0)
    var p = Map("A" -> 1.0, "B" -> 1.0, "C" -> 1.0)
    (1 to 3).foreach { _ =>
      val next = p.keys.map { i =>
        val den = n.collect { case ((a, b), nij) if a == i =>
          nij / (p(a) + p(b)) }.sum
        i -> r6(wins(i) / den)
      }.toMap
      p = next
    }
    val tot = r6(p.values.sum)
    val out = Experiment.bradleyTerry(trials, "winner", "loser", iters = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("A")._1 === 3L && out("A")._2 === 4L)
    assert(out("B") === ((1L, 4L, r6(p("B") / tot))))
    assert(out("C") === ((1L, 2L, r6(p("C") / tot))))
    assert(out("A")._3 === r6(p("A") / tot))
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-5)
    assert(out("A")._3 > out("B")._3, "dominant item must rank first")

    // never-winner pins 0; self-pairs and null rows are dropped
    val deg = Seq(
      (Some("X"), Some("Y")), (Some("X"), Some("Y")), (Some("X"), Some("X")),
      (None, Some("Y")), (Some("X"), None))
      .toDF("winner", "loser")
    val d = Experiment.bradleyTerry(deg, "winner", "loser", iters = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(d === Map("X" -> ((2L, 2L, 1.0)), "Y" -> ((0L, 2L, 0.0))))

    // layout determinism: a different physical partitioning folds to the
    // same rounded trajectory
    val shuffled = Experiment.bradleyTerry(
      trials.repartition(7), "winner", "loser", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(shuffled === out.view.mapValues(_._3).toMap)
  }

  test("poissonBootstrap: constant data collapses the interval; width shrinks " +
      "~1/sqrt(n); CI brackets the sample mean; layout-deterministic") {
    import spark.implicits._
    // constant column: every weighted replicate mean is exactly c
    val const = (1L to 500L).map(i => ("g", 7.5, i)).toDF("g", "v", "id")
    val r0 = Experiment.poissonBootstrap(
      const, Seq("g"), "v", Seq("id"), replicates = 50, salt = "s").head()
    assert(r0.getLong(1) == 500L && r0.getDouble(2) == 7.5)
    assert(r0.getDouble(3) == 7.5 && r0.getDouble(4) == 7.5)

    // deterministic pseudo-noise, two sample sizes from the same generator
    def mk(n: Int) = (1 to n).map { i =>
      ("g", 100.0 + math.sin(i * 12.9898) * 43758.5453 % 10, i.toLong)
    }.toDF("g", "v", "id")
    def width(df: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
      val r = Experiment.poissonBootstrap(
        df, Seq("g"), "v", Seq("id"), replicates = 200, salt = "s").head()
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    }
    val (mS, loS, hiS) = width(mk(100))
    val (mB, loB, hiB) = width(mk(10000))
    assert(loS <= mS && mS <= hiS, s"small-n CI [$loS,$hiS] misses mean $mS")
    assert(loB <= mB && mB <= hiB, s"big-n CI [$loB,$hiB] misses mean $mB")
    assert((hiS - loS) > 2.0 * (hiB - loB),
      s"100-row CI ${hiS - loS} not >2x wider than 10k-row CI ${hiB - loB}")

    // content-derived weights: physical layout cannot move the interval
    val a = Experiment.poissonBootstrap(
      mk(1000), Seq("g"), "v", Seq("id"), 100, "s").collect().toSeq
    val b = Experiment.poissonBootstrap(
      mk(1000).repartition(13), Seq("g"), "v", Seq("id"), 100, "s")
      .collect().toSeq
    assert(a == b)
  }
}
