package graft

import scala.util.Random

import org.apache.spark.sql.Row

import graft.operators.IntervalJoin

/** Property: the range-bucketed equi-join rewrite is semantically identical
  * to the naive theta overlap join (SURVEY §5.3), across random interval
  * sets, keys, and bucket widths — including widths that do and don't divide
  * the interval lengths. */
class IntervalJoinSpec extends SparkSpec {

  private def randomIntervals(rng: Random, n: Int, tag: String) = {
    import spark.implicits._
    (1 to n).map { i =>
      val u = rng.nextInt(3).toLong
      val s = rng.nextInt(100).toLong
      val e = s + 1 + rng.nextInt(25)
      (u, s, e, s"$tag$i")
    }.toDF("u", s"${tag}s", s"${tag}e", s"${tag}v")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map((r: Row) => r.toSeq).toSet
  }

  for (seed <- Seq(1, 42, 2026); bucket <- Seq(7L, 10L, 64L)) {
    test(s"overlapJoinBucketed == overlapJoin (seed=$seed, bucket=$bucket)") {
      val rng = new Random(seed)
      val left = randomIntervals(rng, 40, "l")
      val right = randomIntervals(rng, 40, "r")
      val naive = IntervalJoin.overlapJoin(
        left, right, Seq("u"), "ls", "le", "rs", "re")
      val bucketed = IntervalJoin.overlapJoinBucketed(
        left, right, Seq("u"), "ls", "le", "rs", "re", bucket)
      assert(asSet(bucketed) == asSet(naive))
      assert(bucketed.count() == naive.count()) // no dup rows either
    }
  }

  test("clamped produces the interval intersection") {
    import spark.implicits._
    val l = Seq((1L, 10L, 20L, "a")).toDF("u", "ls", "le", "lv")
    val r = Seq((1L, 15L, 30L, "b")).toDF("u", "rs", "re", "rv")
    val out = IntervalJoin.clamped(
      IntervalJoin.overlapJoin(l, r, Seq("u"), "ls", "le", "rs", "re"),
      "ls", "le", "rs", "re")
    val row = out.select("fact_start", "fact_end").head()
    assert(row.getLong(0) == 15L && row.getLong(1) == 20L)
  }

  test("non-overlapping intervals produce no rows in either form") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10L, "a")).toDF("u", "ls", "le", "lv")
    val r = Seq((1L, 10L, 20L, "b")).toDF("u", "rs", "re", "rv") // touching, half-open
    assert(IntervalJoin.overlapJoin(l, r, Seq("u"), "ls", "le", "rs", "re").count() == 0)
    assert(IntervalJoin.overlapJoinBucketed(
      l, r, Seq("u"), "ls", "le", "rs", "re", 8L).count() == 0)
  }
}
