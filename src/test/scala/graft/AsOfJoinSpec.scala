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
