package graft

import org.apache.spark.sql.functions._

import graft.operators.Kmv

class KmvSpec extends SparkSpec {

  import spark.implicits._

  test("sketch: the k smallest distinct hashes, order-independent; below-capacity is exact") {
    val vals = (0 until 2000).map(i => ("g", s"user_${i % 700}"))
    val sk = Kmv.sketch(vals.toDF("g", "v"), Nil, "v", k = 64)
      .collect().map(_.getLong(0))
    assert(sk.length === 64)
    assert(sk.toSeq === sk.sorted.toSeq)
    assert(sk.distinct.length === 64)
    val shuffled = Kmv.sketch(
      scala.util.Random.shuffle(vals).toDF("g", "v").repartition(7),
      Nil, "v", k = 64).collect().map(_.getLong(0))
    assert(shuffled.toSeq === sk.toSeq)
    // below capacity: the sketch IS the distinct set, estimate exact
    val small = (0 until 30).map(i => ("g", s"x_$i")).toDF("g", "v")
    val est = Kmv.estimate(Kmv.sketch(small, Nil, "v", k = 64), Nil, 64)
      .collect().head.getDouble(0)
    assert(est === 30.0)
  }

  test("merge: merge(sketch(A), sketch(B)) == sketch(A union B) exactly; idempotent") {
    val a = (0 until 4000).map(i => ("g", s"m_$i")).toDF("g", "v")
    val b = (2000 until 7000).map(i => ("g", s"m_$i")).toDF("g", "v")
    def hs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val sa = Kmv.sketch(a, Seq("g"), "v", 128)
    val sb = Kmv.sketch(b, Seq("g"), "v", 128)
    val merged = Kmv.merge(sa, sb, Seq("g"), 128)
    val direct = Kmv.sketch(a.unionByName(b), Seq("g"), "v", 128)
    assert(hs(merged) === hs(direct))
    assert(hs(Kmv.merge(sa, sa, Seq("g"), 128)) === hs(sa))
  }

  test("estimate: within 15% of truth at k=256 over 20k distincts, per group") {
    val df = (0 until 20000).flatMap(i =>
      Seq.fill(2)((if (i % 2 == 0) "even" else "odd", s"id_$i"))).toDF("g", "v")
    val got = Kmv.estimate(
      Kmv.sketch(df, Seq("g"), "v", k = 256), Seq("g"), k = 256)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set("even", "odd"))
    got.values.foreach(e => assert(math.abs(e - 10000) / 10000.0 < 0.15, e))
  }

  test("intersectEstimate: tracks true overlap; disjoint sets estimate 0") {
    // A = 0..6000, B = 4000..10000 -> |A ∩ B| = 2000
    val a = (0 until 6000).map(i => s"u_$i").toDF("v")
    val b = (4000 until 10000).map(i => s"u_$i").toDF("v")
    val k = 512
    val sa = Kmv.sketch(a, Nil, "v", k)
    val sb = Kmv.sketch(b, Nil, "v", k)
    val inter = Kmv.intersectEstimate(sa, sb, Nil, k)
      .collect().head.getDouble(0)
    assert(math.abs(inter - 2000) / 2000.0 < 0.2, inter)
    // disjoint: exactly one output row, estimate 0 (empty common sample)
    val c = (90000 until 95000).map(i => s"w_$i").toDF("v")
    val zero = Kmv.intersectEstimate(sa, Kmv.sketch(c, Nil, "v", k), Nil, k)
      .collect()
    assert(zero.length === 1 && zero.head.getDouble(0) === 0.0)
  }

  test("grouped intersect: per-key thresholds; one-sided keys estimate 0") {
    val a = (0 until 3000).map(i => (s"k${i % 2}", s"u_$i")).toDF("g", "v")
    // overlap only in k0; k1's b-side values are fresh; k2 exists only in b
    val b = ((0 until 1500).map(i => ("k0", s"u_$i")) ++
      (0 until 1500).map(i => ("k1", s"fresh_$i")) ++
      (0 until 100).map(i => ("k2", s"solo_$i"))).toDF("g", "v")
    val k = 256
    val sa = Kmv.sketch(a, Seq("g"), "v", k)
    val sb = Kmv.sketch(b, Seq("g"), "v", k)
    val got = Kmv.intersectEstimate(sa, sb, Seq("g"), k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // keys present in BOTH sketches (the threshold join is inner); k2 is
    // b-only and drops out
    assert(got.keySet === Set("k0", "k1"))
    // k0: A has u_0..2998 even.. actually u_i with i%2==0 -> 1500 values;
    // B's k0 = u_0..u_1499 -> overlap = u_i, i even, i < 1500 -> 750
    assert(math.abs(got("k0") - 750) / 750.0 < 0.35, got("k0"))
    assert(got("k1") === 0.0)
  }

  test("rollup: re-truncated union of fine-cell samples == the sketch built " +
      "directly at the coarse level, at every cube level incl. grand total") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 6000).map { i =>
      (s"s${i % 3}", s"p${i % 4}", s"v${rnd.nextInt(900)}")
    }.toDF("st", "pr", "v")
    val k = 64
    val fine = Kmv.sketch(rows, Seq("st", "pr"), "v", k)
    def hset(df: org.apache.spark.sql.DataFrame, ks: Seq[String]) =
      df.collect().map(r => (ks.map(r.getAs[String]), r.getAs[Long]("_h"))).toSet
    for (ks <- Seq(Seq("st"), Seq("pr"), Nil)) {
      assert(hset(Kmv.rollup(fine, ks, k), ks) ===
        hset(Kmv.sketch(rows, ks, "v", k), ks),
        s"rollup to $ks diverged from the direct sketch")
    }
    val est = Kmv.estimate(Kmv.rollup(fine, Nil, k), Nil, k)
      .head().getDouble(0)
    assert(math.abs(est - 900.0) / 900.0 < 0.25, s"grand total est $est")
  }
}
