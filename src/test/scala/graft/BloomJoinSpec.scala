package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  // 5k fact rows over 1k keys; dim covers 3% of the key space
  private lazy val fact = (0 until 5000).map(i => ((i % 1000).toLong, i.toLong))
    .toDF("fk", "v")
  private lazy val dim = (0L until 1000L).filter(_ % 33 == 0).map(k => (k, s"d$k"))
    .toDF("dk", "name")

  private def keys(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("fk"), r.getAs[Long]("v"))).toSet

  test("semiPruned == plain left_semi join") {
    val plain = fact.join(dim, fact("fk") === dim("dk"), "left_semi")
    val pruned = BloomJoin.semiPruned(fact, "fk", dim, "dk")
    assert(pruned.columns.toSeq === plain.columns.toSeq)
    assert(keys(pruned) === keys(plain))
    assert(keys(pruned).nonEmpty)
  }

  test("the Bloom probe never false-negatives and prunes most non-members") {
    val bc = BloomJoin.buildFilter(dim, "dk", fpp = 0.01)
    val probed = spark.range(0, 1000).toDF("k")
      .select(col("k"), BloomJoin.mightContain(bc, col("k")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val members = (0L until 1000L).filter(_ % 33 == 0).toSet
    // no false negatives — every dim key must probe true
    assert(members.forall(probed(_)), "Bloom dropped a real member")
    // false-positive rate stays near fpp (generous 10x bound for a tiny n)
    val fp = probed.count { case (k, hit) => hit && !members(k) }
    assert(fp <= 100, s"$fp false positives out of ~970 non-members")
  }

  test("null fact keys are dropped, matching plain semi-join semantics") {
    val withNull = fact.unionByName(
      Seq((Option.empty[Long], -1L)).toDF("fk", "v"))
    val plain = withNull.join(dim, withNull("fk") === dim("dk"), "left_semi")
    val pruned = BloomJoin.semiPruned(withNull, "fk", dim, "dk")
    assert(keys(pruned) === keys(plain))
  }

  test("probe predicate compiles into the scan stage (no exchange before it)") {
    // a non-local source so ConvertToLocalRelation can't pre-evaluate the
    // filter in the driver — the shape we're pinning is scan → filter with
    // the probe inside codegen and no shuffle underneath
    val bc = BloomJoin.buildFilter(dim, "dk")
    val probed = spark.range(0, 10000).toDF("fk")
      .filter(BloomJoin.mightContain(bc, col("fk")))
    probed.count()
    val plan = probed.queryExecution.executedPlan
    assert(plan.toString.contains("bloom_might_contain"))
    assert(!plan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }, s"Bloom probe should run pre-shuffle:\n$plan")
    // and it stays inside whole-stage codegen (the `*(n)` stage marker on
    // the Filter line — a CodegenFallback probe would print unstarred)
    assert(plan.toString.linesIterator.exists(l =>
      l.contains("Filter bloom_might_contain") && l.contains("*(")),
      s"probe fell out of codegen:\n$plan")
  }
}
