package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(
      left: Seq[(Long, Long, Long)],            // (id, key, t)
      right: Seq[(Long, Long, Long, Double)],   // (key, t, pk, v)
      inclusive: Boolean): Map[Long, Option[(Long, Double)]] =
    left.map { case (id, k, t) =>
      val cands = right.filter { case (rk, rt, _, _) =>
        rk == k && (if (inclusive) rt <= t else rt < t)
      }
      // max by (t, payload struct) = (t, pk, v) lexicographic
      id -> (if (cands.isEmpty) None
             else {
               val m = cands.maxBy { case (_, rt, pk, v) => (rt, pk, v) }
               Some((m._3, m._4))
             })
    }.toMap

  private def run(
      left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long, Double)],
      inclusive: Boolean): Map[Long, Option[(Long, Double)]] = {
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("rk", "rt", "pk", "v")
    AsOfJoin.asOf(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("pk", "v"),
        inclusive = inclusive)
      .collect()
      .map {
        case Row(id: Long, _, _, pk, v) =>
          id -> Option(pk).map(p => (p.asInstanceOf[Long],
            v.asInstanceOf[Double]))
      }.toMap
  }

  test("asOf matches naive on random data, inclusive and exclusive") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(50).toLong))
    val right = (0 until 300).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, i.toLong,
        rnd.nextInt(5).toDouble))
    for (inclusive <- Seq(true, false)) {
      assert(run(left, right, inclusive) === naive(left, right, inclusive),
        s"inclusive=$inclusive")
    }
  }

  test("ties on (key, time) resolve to the greatest payload deterministically") {
    val left = Seq((1L, 1L, 10L))
    val right = Seq((1L, 10L, 5L, 1.0), (1L, 10L, 9L, 2.0), (1L, 10L, 7L, 3.0))
    assert(run(left, right, inclusive = true)(1L) === Some((9L, 2.0)))
    // exclusive: simultaneous rows invisible, no earlier row -> null
    assert(run(left, right, inclusive = false)(1L) === None)
  }

  test("unmatched left rows carry null payload columns") {
    val out = run(Seq((1L, 1L, 5L), (2L, 2L, 5L)), Seq((1L, 3L, 11L, 1.5)),
      inclusive = true)
    assert(out(1L) === Some((11L, 1.5)))
    assert(out(2L) === None)
  }

  private def runBucketed(
      left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long, Double)],
      inclusive: Boolean,
      width: Long): Map[Long, Option[(Long, Double)]] = {
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("rk", "rt", "pk", "v")
    AsOfJoin.asOfBucketed(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("pk", "v"),
        bucketWidth = width, inclusive = inclusive)
      .collect()
      .map {
        case Row(id: Long, _, _, pk, v) =>
          id -> Option(pk).map(p => (p.asInstanceOf[Long],
            v.asInstanceOf[Double]))
      }.toMap
  }

  test("asOfBucketed matches naive for widths from degenerate to one-bucket") {
    val rnd = new scala.util.Random(11)
    val left = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(100).toLong - 50))
    val right = (0 until 300).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(100).toLong - 50, i.toLong,
        rnd.nextInt(5).toDouble))
    val expectInc = naive(left, right, inclusive = true)
    val expectExc = naive(left, right, inclusive = false)
    // width 1 = every instant its own bucket (carry pass does all the work);
    // width 7 = mixed; width 512 = one bucket (pure pass-1, equals asOf);
    // negative times exercise the floor division
    for (w <- Seq(1L, 7L, 512L)) {
      assert(runBucketed(left, right, inclusive = true, w) === expectInc,
        s"inclusive width=$w")
      assert(runBucketed(left, right, inclusive = false, w) === expectExc,
        s"exclusive width=$w")
    }
  }

  test("asOfBucketed: adversarial single hot key matches naive") {
    val rnd = new scala.util.Random(13)
    val left = (0 until 500).map(i => (i.toLong, 1L, rnd.nextInt(200).toLong))
    val right = (0 until 200).map(i =>
      (1L, rnd.nextInt(200).toLong, i.toLong, rnd.nextInt(3).toDouble))
    assert(runBucketed(left, right, inclusive = true, 16L)
      === naive(left, right, inclusive = true))
  }

  test("asOfBucketed ties resolve exactly like asOf") {
    val left = Seq((1L, 1L, 10L))
    val right = Seq((1L, 10L, 5L, 1.0), (1L, 10L, 9L, 2.0), (1L, 10L, 7L, 3.0))
    assert(runBucketed(left, right, inclusive = true, 4L)(1L) === Some((9L, 2.0)))
    assert(runBucketed(left, right, inclusive = false, 4L)(1L) === None)
  }

  test("hot key: plain form serializes one task, bucketed form balances") {
    // deterministic skew matrix: with AQE coalescing off, the final stage of
    // each plan keeps its window partitioning, so per-partition output row
    // counts measure exactly how the hot key spread over tasks
    val n = 20000
    val left = (0 until n).map(i => (i.toLong, 1L, (i * 7 % 50000).toLong))
      .toDF("id", "k", "t")
    val right = (0 until 2000).map(i => (1L, (i * 25 % 50000).toLong, i.toLong, 1.0))
      .toDF("rk", "rt", "pk", "v")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def partCounts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().toSeq
      // autoSkewMinRows = 0: this test MEASURES the plain form's hot-key
      // serialization, so the auto-router must not rescue it
      val plain = partCounts(AsOfJoin.asOf(
        left, right, Seq("k"), Seq("rk"), "t", "rt", Seq("pk", "v"),
        autoSkewMinRows = 0))
      val bucketed = partCounts(AsOfJoin.asOfBucketed(
        left, right, Seq("k"), Seq("rk"), "t", "rt", Seq("pk", "v"),
        bucketWidth = 1000L))
      assert(plain.max === plain.sum,
        s"plain as-of should put the hot key in ONE task: $plain")
      assert(bucketed.max <= (bucketed.sum * 0.4).toLong,
        s"bucketed as-of should spread the hot key: $bucketed")
      info(s"plain per-task rows: $plain")
      info(s"bucketed per-task rows: $bucketed")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("asOf auto-routes a 90%-hot-key input to the bucketed plan, output unchanged") {
    val n = 5000
    // 90% of left rows on key 1; the rest spread over keys 2..8
    val left = (0 until n).map(i =>
      (i.toLong, if (i % 10 == 0) (i % 7 + 2).toLong else 1L,
        (i.toLong * 13) % 40000))
    val right = (0 until 1000).map(i =>
      ((i % 9).toLong, (i.toLong * 40) % 40000, i.toLong, (i % 5).toDouble))
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("rk", "rt", "pk", "v")
    val routed = AsOfJoin.asOf(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("pk", "v"))
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("_graft_asof_b"),
      s"hot-key input must plan the bucketed form:\n${plan.take(4000)}")
    // identical output to the un-routed plain form (multiset compare)
    val plain = AsOfJoin.asOf(l, r, Seq("k"), Seq("rk"), "t", "rt",
      Seq("pk", "v"), autoSkewMinRows = 0)
    assert(!plain.queryExecution.executedPlan.toString.contains("_graft_asof_b"))
    assert(routed.collect().map(_.toString).sorted.toSeq
      === plain.collect().map(_.toString).sorted.toSeq)
    // a uniform key histogram stays on the single-exchange plain plan
    val uni = (0 until 1000).map(i => (i.toLong, (i % 50).toLong, i.toLong))
      .toDF("id", "k", "t")
    val planU = AsOfJoin.asOf(uni, r, Seq("k"), Seq("rk"), "t", "rt",
      Seq("pk", "v")).queryExecution.executedPlan.toString
    assert(!planU.contains("_graft_asof_b"),
      s"uniform input must keep the plain plan:\n${planU.take(4000)}")
  }

  test("auto-route triggers on a KEY-SORTED hot layout (hot key beyond the head)") {
    // 1000 cold rows over keys 100..119 FIRST, then 5000 rows of hot key 1:
    // the retired head-sample probe saw only cold keys (or, sorted the
    // other way, one key and refused to route); the exact aggregate sees
    // hot = 5000/6000 wherever the rows sit
    val left = ((0 until 1000).map(i =>
      (i.toLong, (100 + i % 20).toLong, (i.toLong * 7) % 40000)) ++
      (0 until 5000).map(i =>
        ((1000 + i).toLong, 1L, (i.toLong * 13) % 40000)))
      .toDF("id", "k", "t")
      .sortWithinPartitions("k")
    val right = (0 until 500).map(i =>
      ((i % 25).toLong, (i.toLong * 80) % 40000, i.toLong, (i % 3).toDouble))
      .toDF("rk", "rt", "pk", "v")
    val routed = AsOfJoin.asOf(
      left, right, Seq("k"), Seq("rk"), "t", "rt", Seq("pk", "v"))
    assert(routed.queryExecution.executedPlan.toString.contains("_graft_asof_b"),
      "sorted hot layout must route to the bucketed plan")
    val plain = AsOfJoin.asOf(left, right, Seq("k"), Seq("rk"), "t", "rt",
      Seq("pk", "v"), autoSkewMinRows = 0)
    assert(routed.collect().map(_.toString).sorted.toSeq
      === plain.collect().map(_.toString).sorted.toSeq)
  }

  test("auto-route triggers on a SINGLE-key corpus (the most serialized input)") {
    val left = (0 until 4096).map(i => (i.toLong, 1L, (i.toLong * 13) % 40000))
      .toDF("id", "k", "t")
    val right = (0 until 200).map(i =>
      (1L, (i.toLong * 200) % 40000, i.toLong, 1.0)).toDF("rk", "rt", "pk", "v")
    val routed = AsOfJoin.asOf(
      left, right, Seq("k"), Seq("rk"), "t", "rt", Seq("pk", "v"))
    assert(routed.queryExecution.executedPlan.toString.contains("_graft_asof_b"),
      "a one-key corpus must route to the bucketed plan")
    val plain = AsOfJoin.asOf(left, right, Seq("k"), Seq("rk"), "t", "rt",
      Seq("pk", "v"), autoSkewMinRows = 0)
    assert(routed.collect().map(_.toString).sorted.toSeq
      === plain.collect().map(_.toString).sorted.toSeq)
  }

  test("plan shuffles once by key: single Exchange, no joins") {
    val l = (0 until 100).map(i => (i.toLong, (i % 5).toLong, i.toLong))
      .toDF("id", "k", "t")
    val r = (0 until 100).map(i => ((i % 5).toLong, i.toLong, i.toLong, 1.0))
      .toDF("rk", "rt", "pk", "v")
    val plan = AsOfJoin.asOf(l, r, Seq("k"), Seq("rk"), "t", "rt",
      Seq("pk", "v")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      s"expected at most one hash exchange:\n$plan")
  }
}
