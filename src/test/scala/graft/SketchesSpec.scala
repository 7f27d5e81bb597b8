package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 50k values over ~7.7k distinct keys with a zipf-ish head
  private lazy val data = (0 until 50000).map { i =>
    val k = if (i % 3 == 0) (i % 10).toLong else (i % 25000).toLong
    (k, s"key_$k")
  }.toDF("id", "name")

  test("approxDistinct is within the advertised rsd of exact") {
    val exact = data.select(countDistinct("id")).head().getLong(0)
    val approx = data.select(Sketches.approxDistinct(col("id"), 0.05))
      .head().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.15, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("HLL sketches merge: per-partition sketches union to the global estimate") {
    val exact = data.select(countDistinct("id")).head().getLong(0)
    // sketch each half independently, then union — the cross-day pattern
    val halves = data
      .withColumn("half", col("id") % 2)
      .groupBy("half")
      .agg(Sketches.hllAgg(col("id")).as("sk"))
    val merged = halves
      .agg(Sketches.hllEstimate(Sketches.hllUnionAgg(col("sk"))).as("est"))
      .head().getLong(0)
    val relErr = math.abs(merged - exact).toDouble / exact
    assert(relErr < 0.1, s"exact=$exact merged-est=$merged relErr=$relErr")
  }

  test("approxQuantiles bracket the exact quantiles") {
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val qs = df.select(
        Sketches.approxQuantiles(col("v"), Seq(0.1, 0.5, 0.99)).as("q"))
      .head().getSeq[Double](0)
    assert(math.abs(qs(0) - 1000) < 50, s"p10=${qs(0)}")
    assert(math.abs(qs(1) - 5000) < 50, s"p50=${qs(1)}")
    assert(math.abs(qs(2) - 9900) < 50, s"p99=${qs(2)}")
  }

  test("countMin point estimates: never under, within eps*N over") {
    val sk = Sketches.countMin(data, "id", eps = 0.001, confidence = 0.99)
    val n = data.count()
    val exact = data.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the hot head keys and a few tail keys
    for (k <- Seq(0L, 3L, 6L, 9L, 101L, 20003L).filter(exact.contains)) {
      val est = sk.estimateCount(k)
      assert(est >= exact(k), s"count-min underestimated key $k")
      assert(est <= exact(k) + (0.001 * 3 * n).toLong,
        s"key $k: est=$est exact=${exact(k)} beyond 3x eps*N")
    }
  }
}
