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
    df.createOrReplaceTempView("mo_in")
    val viaSql = spark.sql("SELECT moments(v).mean FROM mo_in").head().getDouble(0)
    assert(math.abs(viaSql - 2.5) < 1e-12)
  }

  test("momentsUdaf skips NULLs like built-in aggregates") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val r = df.agg(Aggregators.momentsUdaf(col("v")).as("m"))
      .select("m.n", "m.mean", "m.min", "m.max").head()
    assert(r.getLong(0) == 2, "NULL must not count")
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-12, "NULL must not enter the mean as 0.0")
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 3.0)
  }

  test("moments std is numerically stable at large magnitude (Welford/Chan)") {
    import spark.implicits._
    // epoch-micros-scale values: the naive sumSq - n*mean^2 form returns 0.0
    val base = 1.7e15
    val df = (0 until 1000).map(i => base + i).toDF("v").repartition(8)
    val got = df.agg(Aggregators.momentsUdaf(col("v")).as("m"))
      .select("m.std").head().getDouble(0)
    val expect = df.agg(stddev_samp(col("v"))).head().getDouble(0)
    // both engines compute central moments from 1.7e15-magnitude inputs, so
    // agreement is ~1e-6 relative (ULP of the input scale); the naive
    // sumSq − n·mean² form returned EXACTLY 0.0 here
    assert(math.abs(got - expect) / expect < 1e-4, s"got $got expect $expect")
    assert(got > 250 && got < 320) // truly nonzero
  }

  test("moments over empty input: n=0 and NaN stats, no infinity leak") {
    import spark.implicits._
    val r = Seq(1.0).toDF("v").filter(lit(false))
      .agg(Aggregators.momentsUdaf(col("v")).as("m"))
      .select("m.n", "m.mean", "m.std", "m.min", "m.max").head()
    assert(r.getLong(0) == 0)
    (1 to 4).foreach(i => assert(r.getDouble(i).isNaN, s"field $i must be NaN"))
  }
}
