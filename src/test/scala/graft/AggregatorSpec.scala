package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators
import graft.model.Event

/** Typed Aggregator (§2.10 UDAF surface) vs built-in SQL aggregates. */
class AggregatorSpec extends SparkSpec {

  test("momentsOf == SQL count/avg/stddev_samp/min/max per group (typed path)") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val rows = (1L to 500L).map(i =>
      Event(i, i % 7, s"t${i % 3}", 1700000000000000L + i, rng.nextDouble() * 10, "{}"))
    val ds = rows.toDS()
    val got = ds.groupByKey(_.event_type)
      .agg(Aggregators.momentsOf[Event](_.value).name("m"))
      .collect()
      .map { case (k, m) => k -> m }.toMap
    val expect = ds.toDF().groupBy("event_type")
      .agg(count(lit(1)).as("n"), avg("value").as("mean"),
        stddev_samp(col("value")).as("std"),
        min("value").as("mn"), max("value").as("mx"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, m) =>
      val (n, mean, std, mn, mx) = expect(k)
      assert(m.n == n)
      assert(math.abs(m.mean - mean) < 1e-9)
      assert(math.abs(m.std - std) < 1e-6) // different summation order
      assert(m.min == mn && m.max == mx)
    }
  }

  test("momentsUdaf: same Aggregator over the untyped DataFrame/SQL surface") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val r = df.agg(Aggregators.momentsUdaf(col("v")).as("m"))
      .select("m.n", "m.mean", "m.std", "m.min", "m.max").head()
    assert(r.getLong(0) == 4 && math.abs(r.getDouble(1) - 2.5) < 1e-12)
    assert(math.abs(r.getDouble(2) - math.sqrt(5.0 / 3.0)) < 1e-12)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 4.0)
    // registered for SQL users too
    spark.udf.register("moments", Aggregators.momentsUdaf)
    val s = df.createOrReplaceTempView("mo_in")
    val viaSql = spark.sql("SELECT moments(v).mean FROM mo_in").head().getDouble(0)
    assert(math.abs(viaSql - 2.5) < 1e-12)
  }
}
