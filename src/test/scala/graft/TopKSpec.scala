package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)))
      .filter(col("rank") <= k)

  test("perGroup equals the single-window form, ties included") {
    val rnd = new scala.util.Random(31)
    // scores drawn from a small range so ties are common; tie-break on id
    val df = (0 until 3000).map(i =>
      ((i % 11).toLong, rnd.nextInt(20).toDouble, i.toLong)).toDF("g", "s", "id")
      .repartition(7) // multiple input partitions so the local pass matters
    for (k <- Seq(1, 4, 50, 5000)) {
      val got = TopK.perGroup(df, Seq("g"), Seq(col("s").desc, col("id").asc), k)
        .select("g", "rank", "id", "s").collect().map(_.toSeq).toSet
      val want = naive(df, k).select("g", "rank", "id", "s")
        .collect().map(_.toSeq).toSet
      assert(got === want, s"k=$k")
    }
  }

  test("groups smaller than k return all rows, ranked") {
    val df = Seq((1L, 2.0, 1L), (1L, 1.0, 2L)).toDF("g", "s", "id")
    val out = TopK.perGroup(df, Seq("g"), Seq(col("s").desc, col("id").asc), 10)
      .select("rank", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(out === Set((1, 1L), (2, 2L)))
  }

  test("hot group: local pass discards below-k rows before the global window") {
    // one group owns ~everything; after the local pass at most k×partitions
    // rows per group reach the per-group window, so the global sort input is
    // bounded regardless of group size
    val df = (0 until 40000).map(i => (1L, (i % 97).toDouble, i.toLong))
      .toDF("g", "s", "id").repartition(8)
    val k = 5
    val out = TopK.perGroup(df, Seq("g"), Seq(col("s").desc, col("id").asc), k)
    assert(out.count() === k)
    // structural check: the plan has two Window nodes (local then global) —
    // the local one partitioned by (g, partition id)
    val plan = out.queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).size >= 2, s"expected two windows:\n$plan")
    assert(plan.contains("_tk_pid"), s"local pass must slice by partition id:\n$plan")
  }

  test("stratifiedSample: exact k per stratum, stable under repartitioning") {
    val df = (0 until 2000).map(i => ((i % 4).toLong, i.toLong, s"payload$i"))
      .toDF("lang", "doc_id", "text")
    val a = TopK.stratifiedSample(df, Seq("lang"), "doc_id", 7)
      .select("lang", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = TopK.stratifiedSample(df.repartition(13), Seq("lang"), "doc_id", 7)
      .select("lang", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b, "selection must not depend on physical layout")
    assert(a.groupBy(_._1).forall(_._2.size == 7), "exactly k per stratum")
  }

  test("weightedStratifiedSample: ceil(f·n) per stratum, layout-stable, md5 order") {
    // strata sizes differ; fractions keyed off the stratum value
    val df = (0 until 1000).map(i => (s"src${i % 5}", i.toLong))
      .toDF("source", "doc_id")
    val frac = when(col("source").isin("src0", "src2", "src4"), 0.3).otherwise(0.1)
    val out = TopK.weightedStratifiedSample(df, Seq("source"), "doc_id", frac)
      .select("source", "doc_id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    // 200 rows per stratum: ceil(.3*200)=60 even, ceil(.1*200)=20 odd
    assert(bySrc === Map(
      "src0" -> 60, "src1" -> 20, "src2" -> 60, "src3" -> 20, "src4" -> 60))
    // same selection regardless of physical layout
    val again = TopK.weightedStratifiedSample(
        df.repartition(11), Seq("source"), "doc_id", frac)
      .select("source", "doc_id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet === again.toSet)
    // the quota cuts the md5-ordered prefix: rank r holds the r-th smallest
    // md5 within the stratum
    val src1 = out.filter(_._1 == "src1").sortBy(_._3).map(_._2)
    val wantSrc1 = (0 until 1000).filter(_ % 5 == 1).map(_.toLong)
      .sortBy(id => (org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString), id))
      .take(20)
    assert(src1.toSeq === wantSrc1)
  }

  test("temperatureWeights up-samples the tail and sums to one") {
    import spark.implicits._
    val df = Seq(
      ("a", "x y z"), ("a", "x y z"),   // 6 tokens => p = 0.75
      ("b", "x y")                      // 2 tokens => p = 0.25
    ).toDF("source", "text")
    val out = TopK.temperatureWeights(
        df, "source", org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split($"text", " ")), alpha = 0.5)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val z = math.sqrt(0.75) + math.sqrt(0.25)
    assert(out("a")._1 == 2L && out("a")._2 == 6L)
    assert(out("b")._1 == 1L && out("b")._2 == 2L)
    assert(math.abs(out("a")._3 - 0.75) < 1e-6)
    assert(math.abs(out("a")._4 - math.sqrt(0.75) / z) < 1e-6)
    assert(math.abs(out("b")._4 - math.sqrt(0.25) / z) < 1e-6)
    // α < 1 up-samples the tail, down-samples the head; q still sums to 1
    assert(out("b")._5 > 1.0 && out("a")._5 < 1.0)
    assert(math.abs(out("a")._4 + out("b")._4 - 1.0) < 1e-5)
  }

  test("weightedSampleNoReplacement == Scala A-ES model; weight drives inclusion") {
    import spark.implicits._
    // ids 0..199; weight = 1 for most, 1000 for ids 0..9 — the heavy ids
    // should essentially always be sampled
    val df = (0L until 200L).map(i => (i, if (i < 10) 1000.0 else 1.0))
      .toDF("id", "w")

    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.take(14), 16).toDouble + 0.5) / math.pow(2, 56)
    }
    val expect = (0L until 200L)
      .map(i => (i, math.log(u(i)) / (if (i < 10) 1000.0 else 1.0)))
      .sortBy { case (id, k) => (-k, id) }
      .take(20).map(_._1).toSet

    val got = TopK.weightedSampleNoReplacement(df, "id", "w", 20)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    assert((0L until 10L).toSet.subsetOf(got)) // heavy weights dominate
    // layout-stable: a different physical partitioning samples identically
    val got2 = TopK.weightedSampleNoReplacement(df.repartition(17), "id", "w", 20)
      .collect().map(_.getLong(0)).toSet
    assert(got2 == got)
  }

  test("weightedSampleNoReplacement excludes non-positive and null weights") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Double)](
      (1L, 5.0), (2L, 0.0), (3L, -1.0), (4L, null), (5L, 2.0))
      .toDF("id", "w")
    val got = TopK.weightedSampleNoReplacement(df, "id", "w", 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 5L))
  }

  test("reciprocalRankFusion: hand model — consensus beats single-list winners") {
    import spark.implicits._
    // list A ranks 1,2,3 as docs 10,11,12; list B ranks 1,2,3 as 20,11,12.
    // doc 11 (rank 2 in both) must fuse above both list winners (10, 20):
    // 2/62 > 1/61 + 0 — the consensus property RRF exists for.
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val got = TopK.reciprocalRankFusion(Seq(a, b), "id", "rank", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(11L, 12L, 10L, 20L))
    val expect11 = BigDecimal(2.0 / 62.0 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head == ((11L, 2L, expect11)))
    // single-list docs carry n_lists = 1 and exactly their own term
    val exp10 = BigDecimal(1.0 / 61.0 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.find(_._1 == 10L).get == ((10L, 1L, exp10)))
    // tie on fused score (10 vs 20, both rank-1 singletons) breaks on id
    assert(got.indexWhere(_._1 == 10L) < got.indexWhere(_._1 == 20L))
  }

  test("rankBounded == row_number over (score desc, id asc), ties on id, no WindowExec") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.5), (4L, 0.1), (5L, 0.9)
    ).toDF("id", "score")
    val got = TopK.rankBounded(df, "id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    // score desc, id asc: 2(.9) < 5(.9) < 1(.5) < 3(.5) < 4(.1)
    assert(got == Set(
      (2L, 0.9, 1), (5L, 0.9, 2), (1L, 0.5, 3), (3L, 0.5, 4), (4L, 0.1, 5)))
    // the plan must carry no Window at all — that is the operator's point
    val plan = TopK.rankBounded(df, "id", "score")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"windowless contract violated:\n$plan")
    assert(TopK.rankBounded(df.where(lit(false)), "id", "score").count() == 0)
  }

  test("hashSample: deterministic, map-only, nested across rates, union-mergeable") {
    import spark.implicits._
    val df = (0 until 20000).map(i => (i.toLong, s"k_$i")).toDF("id", "k")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.getLong(0)).toSet
    val s5 = ids(TopK.hashSample(df, col("k"), 0.05))
    // rate lands near 5% (md5 is fixed — this is a regression pin)
    assert(math.abs(s5.size - 1000.0) / 1000.0 < 0.15, s5.size)
    // deterministic under repartitioning
    assert(ids(TopK.hashSample(df.repartition(7), col("k"), 0.05)) === s5)
    // nested: the 5% sample is a subset of the 20% sample (tighten the
    // threshold to subsample — never resample)
    val s20 = ids(TopK.hashSample(df, col("k"), 0.20))
    assert(s5.subsetOf(s20))
    // union-mergeable: sample(A ∪ B) == sample(A) ∪ sample(B)
    val (a, b) = ((0 until 12000).map(i => (i.toLong, s"k_$i")),
      (12000 until 20000).map(i => (i.toLong, s"k_$i")))
    assert(ids(TopK.hashSample(a.toDF("id", "k"), col("k"), 0.05)) ++
      ids(TopK.hashSample(b.toDF("id", "k"), col("k"), 0.05)) === s5)
    // map-only: no exchange in the plan
    val plan = TopK.hashSample(df, col("k"), 0.05)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashSample must not shuffle:\n$plan")
  }
}
