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

  test("plan has no ObjectHashAggregate value buffer and no whole-group sort") {
    val df = (0 until 1000).map(i => ((i % 3).toLong, i.toDouble)).toDF("g", "v")
    val plan = Quantiles.exactGrouped(df, Seq("g"), "v", Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      s"distributed rank selection must not buffer group values:\n$plan")
    // the only windows are the slice-rank (partitioned by group AND slice id)
    // and the tiny offset window over per-slice counts
    assert(!plan.contains("percentile"), s"must not fall back to percentile:\n$plan")
  }
}
