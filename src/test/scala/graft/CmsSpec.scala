package graft

import org.apache.spark.sql.functions._

import graft.operators.Cms

class CmsSpec extends SparkSpec {

  private def regSet(
      df: org.apache.spark.sql.DataFrame): Set[(String, Int, Long, Long)] =
    df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("registers: merge(sketch(A), sketch(B)) == sketch(A union B) exactly; self-merge doubles") {
    import spark.implicits._
    val a = (0 until 3000).map(i => ("g", s"item_${i % 200}")).toDF("g", "v")
    val b = (0 until 2000).map(i => ("g", s"item_${i % 350}")).toDF("g", "v")
    val sa = Cms.registers(a, Seq("g"), "v", depth = 3, width = 32)
    val sb = Cms.registers(b, Seq("g"), "v", depth = 3, width = 32)
    val merged = Cms.merge(sa, sb, Seq("g"))
    val direct = Cms.registers(a.unionByName(b), Seq("g"), "v", depth = 3, width = 32)
    assert(regSet(merged) === regSet(direct))
    // counts ADD — self-merge doubles every register (the documented
    // non-idempotence; replay safety is the staging discipline's job)
    val doubled = Cms.merge(sa, sa, Seq("g")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val base = sa.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(doubled === base.view.mapValues(_ * 2).toMap)
  }

  test("estimate: never underestimates; exact at ample width; absent probes >= 0") {
    import spark.implicits._
    // zipf-ish: item_k appears (200 - k) times
    val rows = (0 until 200).flatMap(k => Seq.fill(200 - k)(("g", s"item_$k")))
    val df = rows.toDF("g", "v")
    val exact = df.groupBy("g", "v").agg(count(lit(1)).as("n_exact"))
    def est(width: Int) = {
      val regs = Cms.registers(df, Seq("g"), "v", depth = 4, width = width)
      Cms.estimate(regs, exact, Seq("g"), "v", depth = 4, width = width)
        .join(exact, Seq("g", "v"))
        .collect().map(r => r.getAs[String]("v") ->
          (r.getAs[Long]("cms_count"), r.getAs[Long]("n_exact"))).toMap
    }
    // tight width: collisions guaranteed, but NEVER an underestimate
    val tight = est(16)
    assert(tight.size === 200)
    tight.foreach { case (v, (cms, ex)) => assert(cms >= ex, s"$v: $cms < $ex") }
    assert(tight.exists { case (_, (cms, ex)) => cms > ex })
    // ample width at depth 4: every estimate collapses to the exact count
    // (a single clean row is enough for the min; md5 is fixed, so this is
    // a deterministic regression pin, not a probabilistic claim)
    val ample = est(1 << 14)
    ample.foreach { case (v, (cms, ex)) => assert(cms === ex, s"$v: $cms != $ex") }
    // a value the sketch never saw still answers (possibly >0 on collision,
    // never negative); left-join reconstructs empty buckets as 0
    val regs = Cms.registers(df, Seq("g"), "v", depth = 4, width = 16)
    val ghost = Seq(("g", "never_seen_1"), ("g", "never_seen_2")).toDF("g", "v")
    val g = Cms.estimate(regs, ghost, Seq("g"), "v", depth = 4, width = 16)
      .collect().map(r => r.getAs[Long]("cms_count"))
    assert(g.length === 2 && g.forall(_ >= 0))
  }

  test("registers fold is order-independent: shuffled input gives identical frame") {
    import spark.implicits._
    val vals = (0 until 5000).map(i => ("g", s"tok_${i % 500}"))
    val fwd = Cms.registers(vals.toDF("g", "v"), Seq("g"), "v", 3, 64)
    val rev = Cms.registers(
      scala.util.Random.shuffle(vals).toDF("g", "v").repartition(7),
      Seq("g"), "v", 3, 64)
    assert(regSet(fwd) === regSet(rev))
  }

  test("innerProduct: never underestimates the true join size; exact at ample width") {
    import spark.implicits._
    // skewed key frequencies: true join size = sum fA(k)*fB(k)
    val a = (0 until 600).map(i => s"k${i % 40}").toDF("v")
    val b = (0 until 300).map(i => s"k${i % 60}").toDF("v")
    val exact = (0 until 40).map { k =>
      val fa = 600 / 40 // 15 each
      val fb = (0 until 300).count(i => i % 60 == k)
      fa.toLong * fb
    }.sum
    def est(width: Int): Long = Cms.innerProduct(
      Cms.registers(a, Nil, "v", depth = 4, width = width),
      Cms.registers(b, Nil, "v", depth = 4, width = width),
      Nil).head().getAs[Long]("join_size_est")
    // tight width: collisions force a LIVE overestimate, never under
    val tight = est(16)
    assert(tight >= exact, s"underestimate: $tight < $exact")
    assert(tight > exact, "16 buckets for 60 keys must collide")
    // ample width (2^14 for 60 keys): md5 is fixed, so no row collides and
    // the estimate is EXACT — a deterministic regression pin
    assert(est(1 << 14) === exact)
  }

  test("innerProduct: disjoint key sets estimate 0, never NULL (zero-overlap rows reach the min)") {
    import spark.implicits._
    val a = (0 until 500).map(i => s"a${i % 25}").toDF("v")
    val b = (0 until 500).map(i => s"b${i % 25}").toDF("v")
    // ample width: the disjoint key sets share no bucket in any hash row,
    // so every per-row inner product is 0 and the estimate must be 0 —
    // before the round-13 fix the inner bucket join dropped exactly those
    // rows, reporting NULL here (and a collision-inflated min whenever
    // only SOME rows had zero overlap)
    val rows = Cms.innerProduct(
      Cms.registers(a, Nil, "v", depth = 4, width = 1 << 14),
      Cms.registers(b, Nil, "v", depth = 4, width = 1 << 14),
      Nil).collect()
    assert(rows.length === 1)
    assert(!rows.head.isNullAt(rows.head.fieldIndex("join_size_est")))
    assert(rows.head.getAs[Long]("join_size_est") === 0L)
  }

  test("rollup: sum-folded fine-cell registers == registers built directly " +
      "at the coarse level, at every cube level incl. grand total") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rows = (0 until 5000).map { i =>
      (s"s${i % 3}", s"p${i % 4}", rnd.nextInt(300).toLong)
    }.toDF("st", "pr", "v")
    val (depth, width) = (3, 64)
    val fine = Cms.registers(rows, Seq("st", "pr"), "v", depth, width)
    def regSet(df: org.apache.spark.sql.DataFrame, ks: Seq[String]) =
      df.collect().map(r => (ks.map(r.getAs[String]), r.getAs[Int]("_row"),
        r.getAs[Long]("_bucket"), r.getAs[Long]("_cnt"))).toSet
    for (ks <- Seq(Seq("st"), Seq("pr"), Nil)) {
      assert(regSet(Cms.rollup(fine, ks), ks) ===
        regSet(Cms.registers(rows, ks, "v", depth, width), ks),
        s"rollup to $ks diverged from the direct registers")
    }
  }
}
