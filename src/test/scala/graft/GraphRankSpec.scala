package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphRank

class GraphRankSpec extends SparkSpec {

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("single undirected edge: both nodes stay at uniform rank (norm 1.0)") {
    import spark.implicits._
    val e = Seq(("a", "b")).toDF("s", "t")
    val got = ranks(GraphRank.pageRank(e, "s", "t", iters = 5))
    assert(got == Map("a" -> 1.0, "b" -> 1.0))
  }

  test("undirected star: center outranks leaves; symmetric leaves tie; mass conserved") {
    import spark.implicits._
    val e = Seq(("hub", "l1"), ("hub", "l2"), ("hub", "l3")).toDF("s", "t")
    val got = ranks(GraphRank.pageRank(e, "s", "t", iters = 10))
    assert(got.size == 4)
    assert(got("l1") == got("l2") && got("l2") == got("l3"))
    assert(got("hub") > got("l1"))
    // rank_norm = rank * N, so conservation means the norms sum to N
    assert(math.abs(got.values.sum - 4.0) < 1e-4)
  }

  test("one undirected iteration matches the hand recurrence on a path graph") {
    import spark.implicits._
    // a - b - c: deg a=1, b=2, c=1; r0 = 1/3 each
    // r1(a) = 0.05 + 0.85 * r0(b)/2 = 0.05 + 0.85/6
    // r1(b) = 0.05 + 0.85 * (r0(a) + r0(c)) = 0.05 + 0.85 * 2/3
    val e = Seq(("a", "b"), ("b", "c")).toDF("s", "t")
    val got = ranks(GraphRank.pageRank(e, "s", "t", iters = 1))
    def norm(r: Double) = math.rint((r * 3 + 1e-9) * 1e6) / 1e6
    assert(got("a") == norm(0.05 + 0.85 / 6))
    assert(got("c") == norm(0.05 + 0.85 / 6))
    assert(got("b") == norm(0.05 + 0.85 * 2.0 / 3))
  }

  test("duplicate and self-loop edges are dropped before degrees") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "a")).toDF("s", "t")
    val got = ranks(GraphRank.pageRank(e, "s", "t", iters = 3))
    assert(got == Map("a" -> 1.0, "b" -> 1.0))
  }

  test("directed: node set is the src set, sink mass leaks (documented variant)") {
    import spark.implicits._
    // a -> b, b -> a, a -> sink: sink never appears as src -> not a node;
    // a's mass split halves, so totals shrink below 1 each iteration
    val e = Seq(("a", "b"), ("b", "a"), ("a", "sink")).toDF("s", "t")
    val got = ranks(GraphRank.pageRank(e, "s", "t", iters = 2, undirected = false))
    assert(got.keySet == Set("a", "b"))
    assert(got.values.sum < 2.0) // leaked: rank_norm would sum to N=2 if conserved
  }

  test("null endpoints are dropped, not nodes") {
    import spark.implicits._
    val e = Seq[(String, String)](("a", "b"), (null, "c"), ("d", null)).toDF("s", "t")
    val got = ranks(GraphRank.pageRank(e, "s", "t", iters = 2))
    assert(got.keySet == Set("a", "b"))
  }

  test("edge table is shuffled once: per-iteration exchanges touch only rank rows") {
    import spark.implicits._
    // (i*7+1)%50 is never equal to i%50 (6i+1 is odd mod 50), so no
    // self-loops and every one of the 50 nodes keeps at least one edge
    val e = (0 until 200).map(i => (s"n${i % 50}", s"n${(i * 7 + 1) % 50}")).toDF("s", "t")
    val out = GraphRank.pageRank(e, "s", "t", iters = 3)
    // the adjacency (edges+degrees) is persisted pre-partitioned; the final
    // plan reads it from the InMemoryRelation rather than re-scanning the
    // (here, local) edge source per iteration
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"adjacency must come from the persisted cache:\n${plan.take(3000)}")
    assert(math.abs(ranks(out).values.sum - 50.0) < 1e-3)
  }
}
