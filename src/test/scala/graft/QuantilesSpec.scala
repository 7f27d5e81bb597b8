package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Quantiles

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p0" -> 0.0,
    "p100" -> 1.0)

  private def viaPercentile(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("v").isNotNull).groupBy("g")
      .agg(ps.map { case (n, p) =>
        expr(s"percentile(v, $p)").as(n)
      }.head, ps.tail.map { case (n, p) => expr(s"percentile(v, $p)").as(n) }: _*)

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
    df.collect().map { r =>
      r.getAs[Long]("g") -> ps.map { case (n, _) => r.getAs[Double](n) }
    }.toMap

  private def assertClose(a: Map[Long, Seq[Double]], b: Map[Long, Seq[Double]]): Unit = {
    assert(a.keySet === b.keySet)
    for (k <- a.keySet; ((x, y), i) <- a(k).zip(b(k)).zipWithIndex)
      assert(math.abs(x - y) < 1e-9, s"group $k quantile ${ps(i)._1}: $x vs $y")
  }

  test("exactGrouped matches the percentile built-in on random grouped data") {
    val rnd = new scala.util.Random(17)
    // mixed group sizes incl. a singleton group and heavy duplicate values
    val rows = (0 until 5000).map { _ =>
      val g = rnd.nextInt(7).toLong
      (g, rnd.nextInt(40).toDouble / 4.0)
    } :+ (99L, 42.0)
    val df = rows.toDF("g", "v")
    assertClose(
      toMap(Quantiles.exactGrouped(df, Seq("g"), "v", ps)),
      toMap(viaPercentile(df)))
  }

  test("nulls are excluded, like percentile and quantile_cont") {
    val df = Seq[(Long, Option[Double])](
      (1L, Some(1.0)), (1L, None), (1L, Some(3.0)), (1L, Some(2.0)),
      (2L, Some(5.0)), (2L, None)).toDF("g", "v")
    assertClose(
      toMap(Quantiles.exactGrouped(df, Seq("g"), "v", ps)),
      toMap(viaPercentile(df)))
  }

  test("interpolation is exact at fractional ranks") {
    // n=4: p50 rank = 1 + .5*3 = 2.5 -> (20+30)/2 = 25
    val df = Seq((1L, 10.0), (1L, 20.0), (1L, 30.0), (1L, 40.0)).toDF("g", "v")
    val out = Quantiles.exactGrouped(df, Seq("g"), "v", Seq("p50" -> 0.5))
      .collect()
    assert(out.toSeq === Seq(Row(1L, 25.0)))
  }

  test("plan buffers no group values and sorts no whole group") {
    val df = (0 until 1000).map(i => ((i % 3).toLong, i.toDouble)).toDF("g", "v")
    val plan = Quantiles.exactGrouped(df, Seq("g"), "v", Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    // the exact built-in would buffer every group value in one aggregation
    // buffer; the only sketch allowed is the BOUNDED approx cut-point
    // aggregate that balances the slices
    assert("(?<!approx_)percentile\\(".r.findFirstIn(plan).isEmpty,
      s"must not fall back to the exact percentile built-in:\n$plan")
    val objAggs = "ObjectHashAggregate[^\n]*".r.findAllIn(plan).toSeq
    assert(objAggs.forall(_.contains("percentile_approx")),
      s"the only object-buffer aggregate allowed is the bounded cut-point " +
        s"sketch:\n${objAggs.mkString("\n")}")
    // the rank window must partition by group AND slice, never group alone
    // over the value frame (the whole-group sort this operator exists to
    // avoid); the offset window over the tiny per-slice frame has no _v
    assert(plan.contains("windowspecdefinition(g#") || plan.contains("_slice"),
      s"expected the slice-partitioned window:\n${plan.take(2000)}")
  }

  test("exactGroupedMulti == per-column exactGrouped, one melted job") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 3000).map { _ =>
      val g = rnd.nextInt(5).toLong
      (g, rnd.nextInt(40).toDouble / 4.0,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble() * 1000))
    }
    val df = rows.toDF("g", "a", "b")
    val multi = Quantiles.exactGroupedMulti(
        df, Seq("g"),
        Seq(
          "a" -> Seq("a_p25" -> 0.25, "a_p50" -> 0.5),
          "b" -> Seq("b_p90" -> 0.9)))
      .collect()
      .map(r => r.getAs[Long]("g") ->
        (r.getAs[Double]("a_p25"), r.getAs[Double]("a_p50"), r.getAs[Double]("b_p90")))
      .toMap
    val a = Quantiles.exactGrouped(df, Seq("g"), "a",
        Seq("a_p25" -> 0.25, "a_p50" -> 0.5))
      .collect().map(r => r.getAs[Long]("g") ->
        (r.getAs[Double]("a_p25"), r.getAs[Double]("a_p50"))).toMap
    val b = Quantiles.exactGrouped(df, Seq("g"), "b", Seq("b_p90" -> 0.9))
      .collect().map(r => r.getAs[Long]("g") -> r.getAs[Double]("b_p90")).toMap
    assert(multi.keySet === a.keySet)
    multi.foreach { case (g, (a25, a50, b90)) =>
      assert(math.abs(a25 - a(g)._1) < 1e-9, s"g=$g a_p25")
      assert(math.abs(a50 - a(g)._2) < 1e-9, s"g=$g a_p50")
      assert(math.abs(b90 - b(g)) < 1e-9, s"g=$g b_p90")
    }
  }

  test("exactGroupedMulti: an all-null column yields a null quantile, group kept") {
    // deliberate divergence from per-column inner-join composition (which
    // would drop the group) — pinned so it stays a decision, not a drift
    val df = Seq(
      (1L, Some(1.0), Some(10.0)), (1L, Some(2.0), Some(20.0)),
      (2L, Some(3.0), None), (2L, Some(5.0), None)
    ).toDF("g", "a", "b")
    val out = Quantiles.exactGroupedMulti(
        df, Seq("g"), Seq("a" -> Seq("a_p50" -> 0.5), "b" -> Seq("b_p50" -> 0.5)))
      .collect().map(r => r.getAs[Long]("g") ->
        (Option(r.getAs[Any]("a_p50")), Option(r.getAs[Any]("b_p50")))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1.contains(1.5) && out(1L)._2.contains(15.0))
    assert(out(2L)._1.contains(4.0) && out(2L)._2.isEmpty)
  }

  test("a value at 90% frequency compresses before any sort, result exact") {
    // one value owns 90% of the group — the old range-slice design needed a
    // salt to keep its copies from serializing one slice; here the
    // map-side-combined (group, value) aggregate collapses them into ONE
    // row before anything sorts or shuffles in volume
    val rows = (0 until 10000).map(i =>
      (1L, if (i % 10 == 0) (i % 997).toDouble else 777.0))
    // CACHED input on purpose: a cached frame is exactly what broke the
    // old range-slice design (independent boundary samples once exchange
    // reuse is gone) — the pure-function slicing must stay exact over it
    val df = rows.toDF("g", "v").repartition(8).persist()
    df.count()
    assertClose(
      toMap(Quantiles.exactGrouped(df, Seq("g"), "v", ps)),
      toMap(viaPercentile(df)))
    // measured: NO stage shuffles anywhere near the 10k input rows — the
    // distinct frame (≤ 998 values) is all that ever crosses an exchange
    val perTask = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) perTask.synchronized {
          perTask += ((e.stageId, m.shuffleReadMetrics.recordsRead))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Quantiles.exactGrouped(df, Seq("g"), "v", Seq("p50" -> 0.5)).collect()
      // the listener bus is asynchronous and waitUntilEmpty is
      // private[spark]: poll until shuffle reads land (bounded)
      def stages() = perTask.synchronized(perTask.toSeq).groupBy(_._1)
        .view.mapValues(_.map(_._2).sum).toMap
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (stages().isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      Thread.sleep(300) // settle: late same-stage task events
      val byStage = stages()
      assert(byStage.nonEmpty, "no shuffle observed at all")
      assert(byStage.values.forall(_ <= 3000),
        s"duplicates must compress in the map-side combine before any " +
          s"exchange — a stage shuffled near input volume: $byStage")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      df.unpersist()
    }
  }

  test("withQuantileBucket: every row bucketed, deciles near-uniform, edges right") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 2000).map(i =>
      ((i % 2).toLong, rnd.nextInt(100000).toDouble)).toDF("g", "v")
    val out = Quantiles.withQuantileBucket(df, Seq("g"), "v", nBuckets = 10)
    assert(out.count() === 2000, "bucketing must not drop or duplicate rows")
    val buckets = out.groupBy("g", "bucket").count().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(buckets.keys.map(_._2).toSet === (1L to 10L).toSet)
    // continuous-ish values: each of the 10 buckets holds ~100 of each group
    buckets.foreach { case ((g, b), n) =>
      assert(n >= 80 && n <= 120, s"group $g bucket $b holds $n of ~100")
    }
    // brute-force check on a tiny frame: value above p90 cut -> bucket 10,
    // below p10 cut -> bucket 1
    val tiny = (1 to 100).map(i => (1L, i.toDouble)).toDF("g", "v")
    val t = Quantiles.withQuantileBucket(tiny, Seq("g"), "v", nBuckets = 10)
      .select("v", "bucket").collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    assert(t(1.0) === 1L)
    assert(t(100.0) === 10L)
    // p50 cut for 1..100 = 50.5 -> 50 in bucket 5, 51 in bucket 6
    assert(t(50.0) === 5L)
    assert(t(51.0) === 6L)
  }

  test("exactGrouped keeps a NULL group key as a real group (null-safe internal joins)") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), 1.0), (Option("a"), 2.0), (Option("a"), 3.0),
      (Option.empty[String], 10.0), (Option.empty[String], 20.0))
      .toDF("g", "v")
    val got = Quantiles.exactGrouped(df, Seq("g"), "v", Seq("p50" -> 0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(got(Some("a")) == 2.0)
    assert(got(None) == 15.0) // linear interpolation at rank 1.5
  }

  test("percentileNormalize: midrank ties, null value -> NULL pct, null group is real") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10.0)), (2L, Some("a"), Some(10.0)),
      (3L, Some("a"), Some(20.0)), (4L, Some("a"), Some(30.0)),
      (5L, Some("a"), None),
      (6L, None, Some(1.0)), (7L, None, Some(2.0)))
      .toDF("id", "g", "v")
    val got = Quantiles.percentileNormalize(df, Seq("g"), "v")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // group a, n=4: ties at 10 share (0 + 2/2)/4 = 0.25; 20 -> (2+0.5)/4;
    // 30 -> (3+0.5)/4
    assert(got(1L) == Some(0.25) && got(2L) == Some(0.25))
    assert(got(3L) == Some(0.625) && got(4L) == Some(0.875))
    // null value: row kept, pct NULL
    assert(got(5L) == None)
    // null group key ranks within its own group (n=2)
    assert(got(6L) == Some(0.25) && got(7L) == Some(0.75))
    // midrank symmetry: mean pct = 0.5 within every fully-ranked group
    val aMean = Seq(got(1L), got(2L), got(3L), got(4L)).flatten.sum / 4
    assert(math.abs(aMean - 0.5) < 1e-9)
    // layout-stable
    val b = Quantiles.percentileNormalize(df.repartition(7), Seq("g"), "v")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(b == got)
  }

  test("randomized stress: 12 seeded datasets x {plain, cached} == percentile built-in") {
    // the regression net for the deterministic-slicing rewrite: varied
    // group counts, duplicate rates, sizes, and null mixes, each checked
    // against the exact built-in — and re-checked over a CACHED input,
    // the shape that silently corrupted the range-slice design
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val nGroups = 1 + rnd.nextInt(6)
      val n = 200 + rnd.nextInt(3000)
      val dupPool = 1 + rnd.nextInt(50) // small pool -> heavy duplicates
      val rows = (0 until n).map { _ =>
        val g = rnd.nextInt(nGroups).toLong
        val v: Option[Double] =
          if (rnd.nextInt(20) == 0) None
          else if (rnd.nextBoolean()) Some(rnd.nextInt(dupPool).toDouble)
          else Some(rnd.nextDouble() * 1000 - 500)
        (g, v)
      }
      val base = rows.toDF("g", "v").repartition(1 + rnd.nextInt(7))
      val df = if (seed % 2 == 0) { val p = base.persist(); p.count(); p }
               else base
      try assertClose(
        toMap(Quantiles.exactGrouped(df, Seq("g"), "v", ps)),
        toMap(viaPercentile(df)))
      catch { case e: Throwable =>
        throw new AssertionError(s"seed=$seed cached=${seed % 2 == 0}: $e", e)
      }
      finally if (seed % 2 == 0) df.unpersist()
    }
  }
}
