package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec {

  private def results(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Boolean)] =
    df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("row-level constraints: hand-counted violations, null semantics per kind") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 0.05, "A"), (2L, 0.20, "N"), (null, 0.05, "X"),
      (4L, null, "R"), (5L, -0.01, null)
    ).toDF("k", "d", "f")
    val got = results(Expectations.check(df, Seq(
      NotNull("k"),
      InRange("d", 0.0, 0.1),
      AcceptedValues("f", Seq("A", "N", "R")),
      MatchesRegex("f", "^[ANR]$"))))
    assert(got("not_null(k)") == ((5L, 1L, false)))
    // nulls are NOT range violations (NotNull's business): 0.20 and -0.01
    assert(got("in_range(d, 0.0, 0.1)") == ((5L, 2L, false)))
    // null value not an accepted-values violation either: only "X"
    assert(got("accepted_values(f)") == ((5L, 1L, false)))
    assert(got("matches_regex(f)") == ((5L, 1L, false)))
  }

  test("in_range: a non-null value that fails the double cast is a VIOLATION") {
    import spark.implicits._
    val df = Seq("0.5", "N/A", "0.7", "abc", null).toDF("score")
    val got = results(Expectations.check(df, Seq(InRange("score", 0.0, 1.0))))
    // "N/A" and "abc" must be caught; null stays NotNull's business
    assert(got("in_range(score, 0.0, 1.0)") == ((5L, 2L, false)))
  }

  test("unique: surplus rows beyond one per key; null keys group like values") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "a"), (1L, "b"), (null, "x"), (null, "x")
    ).toDF("k", "s")
    val got = results(Expectations.check(df, Seq(Unique(Seq("k", "s")))))
    // groups: (1,a)x2, (1,b), (null,x)x2 -> 5 rows - 3 groups = 2 surplus
    assert(got("unique(k, s)") == ((5L, 2L, false)))
  }

  test("ref integrity: broadcast anti-join count; null FK is not a violation") {
    import spark.implicits._
    val fact = Seq[java.lang.Long](1L, 2L, 3L, 99L, null).toDF("fk")
    val dim = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val got = results(Expectations.check(fact,
      Seq(RefIntegrity("fk", dim, "pk"), NotNull("fk"))))
    assert(got("ref_integrity(fk -> pk)") == ((5L, 1L, false)))
    assert(got("not_null(fk)") == ((5L, 1L, false)))
  }

  test("clean table passes every constraint") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val got = results(Expectations.check(df, Seq(
      NotNull("k"), Unique(Seq("k")),
      AcceptedValues("s", Seq("a", "b")))))
    assert(got.values.forall { case (t, v, p) => t == 2L && v == 0L && p })
  }

  test("empty table: zero totals, everything passes") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "s").where(lit(false))
    val got = results(Expectations.check(df, Seq(NotNull("k"), Unique(Seq("k")))))
    assert(got("not_null(k)") == ((0L, 0L, true)))
    assert(got("unique(k)") == ((0L, 0L, true)))
  }

  test("streaming attach: per-batch gate equals batch check on the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.StreamingExpectations
    val stream = MemoryStream[(java.lang.Long, String)](spark)
    val df = stream.toDF().toDF("k", "s")
    val suite = Seq(NotNull("k"), AcceptedValues("s", Seq("a", "b")), Unique(Seq("k")))
    val seen = scala.collection.mutable.Map[Long, Map[String, (Long, Long, Boolean)]]()
    val q = StreamingExpectations.attach(df, suite, tmpDir("se-ckpt")) {
      (batch, id) => seen.synchronized { seen(id) = results(batch) }
    }
    try {
      stream.addData((1L, "a"), (2L, "x"), (null, "b"))
      q.processAllAvailable()
      stream.addData((5L, "a"), (5L, "a"))
      q.processAllAvailable()
      val b0 = seen.synchronized(seen(0L))
      assert(b0("not_null(k)") == ((3L, 1L, false)))
      assert(b0("accepted_values(s)") == ((3L, 1L, false)))
      assert(b0("unique(k)") == ((3L, 0L, true)))
      val b1 = seen.synchronized(seen(1L))
      assert(b1("unique(k)") == ((2L, 1L, false)))
      assert(b1("not_null(k)") == ((2L, 0L, true)))
      // parity: the batch operator over batch-1's rows gives the same table
      val batchEq = results(Expectations.check(
        Seq((5L, "a"), (5L, "a")).toDF("k", "s"), suite))
      assert(b1 == batchEq)
    } finally q.stop()
  }

  test("row-level suite is ONE scan regardless of constraint count") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val checked = Expectations.check(df, Seq(
      NotNull("l_orderkey"), NotNull("l_partkey"),
      InRange("l_discount", 0.0, 0.1),
      AcceptedValues("l_returnflag", Seq("A", "N", "R")),
      MatchesRegex("l_linestatus", "^[OF]$")))
    // all five constraints resolved into literals by the single eager pass:
    // the returned plan contains NO scan at all for row-level-only suites
    val plan = checked.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"row-level-only suite must not rescan in the result plan:\n${plan.take(2000)}")
  }
}
