package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Profiling
import graft.streaming.StreamingSeasonal

/** Seasonal profile + streaming monitor: hand-computed moments, the exact
  * integer 3σ boundary (strictly greater — a point AT mean+3σ is not an
  * outlier), stream==batch scoring parity, unseen-bucket accounting, and
  * planted-spike alarms through the attach. */
class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01 (Monday) 05:00:00 UTC, in epoch micros
  private val baseUs = 1704085200L * 1000000L

  private def ev(rows: (Long, Double)*): DataFrame =
    rows.toDF("_us", "value")
      .select(
        lit("g").as("k"), timestamp_micros(col("_us") + baseUs).as("ts"),
        col("value"))

  test("seasonalProfile: hand moments; a point exactly AT 3σ is not an outlier") {
    // 9×10.0 + 1×20.0 in one bucket: mean 11.0, σ 3.0 → 20.0 = mean + 3σ
    val df = ev((0 until 9).map(i => (i.toLong * 1000000L, 10.0)) :+
      ((9L * 1000000L, 20.0)): _*)
    val p = Profiling.seasonalProfile(df, Seq("k"), "ts", "value").head()
    assert(p.getAs[Int]("dow") == 2 && p.getAs[Int]("hod") == 5)
    assert(p.getAs[Long]("n") == 10L)
    assert(p.getAs[Double]("mean_value") == 11.0)
    assert(p.getAs[Double]("sd_value") == 3.0)
    assert(p.getAs[Long]("n_outliers") == 0L)
  }

  test("seasonalProfile: a genuine spike flags, the base points do not") {
    val df = ev((0 until 20).map(i => (i.toLong * 1000000L, 10.0)) :+
      ((20L * 1000000L, 30.0)): _*)
    val p = Profiling.seasonalProfile(df, Seq("k"), "ts", "value").head()
    assert(p.getAs[Long]("n_outliers") == 1L)
  }

  test("large-magnitude values: the decimal branch flags exactly where BIGINT would wrap") {
    // cents ~1e9 ⇒ (n·c − S)² ~1e20 > Long.MaxValue (9.2e18): the old
    // BIGINT form wrapped silently here (round-12 advice). 20 base points
    // at 1e7 + one 3e7 spike: mean ≈ 1.095e7, σ ≈ 4.36e6 → only the spike
    // exceeds 3σ, and no base point may flag (a wrapped square could flag
    // anything).
    val df = ev((0 until 20).map(i => (i.toLong * 1000000L, 1.0e7)) :+
      ((20L * 1000000L, 3.0e7)): _*)
    val p = Profiling.seasonalProfile(df, Seq("k"), "ts", "value").head()
    assert(p.getAs[Long]("n_outliers") == 1L)
    // and the symmetric no-variance case at large magnitude stays quiet
    val flat = ev((0 until 20).map(i => (i.toLong * 1000000L, 1.0e7)): _*)
    val pf = Profiling.seasonalProfile(flat, Seq("k"), "ts", "value").head()
    assert(pf.getAs[Long]("n_outliers") == 0L)
  }

  test("buckets split by hour and day; registers stay ≤ 168 per key") {
    val df = ev(
      (0L, 10.0), (3600L * 1000000L, 20.0),
      (86400L * 1000000L, 30.0))
    val regs = Profiling.seasonalRegisters(df, Seq("k"), "ts", "value")
    assert(regs.count() == 3)
    assert(regs.agg(sum("n")).head().getLong(0) == 3L)
  }

  test("score: parity with the batch profile when frozen on the same data") {
    val rnd = new scala.util.Random(45)
    val df = ev((0 until 2000).map(i =>
      (i.toLong * 7000000L, rnd.nextDouble() * 100)): _*)
    val frozen = Profiling.seasonalRegisters(df, Seq("k"), "ts", "value")
    val batchOutliers = Profiling.seasonalProfile(df, Seq("k"), "ts", "value")
      .agg(sum("n_outliers")).head().getLong(0)
    val s = StreamingSeasonal.score(df, frozen, Seq("k"), "ts", "value", 3)
      .head()
    assert(s.getAs[Long]("n_scored") == 2000L)
    assert(s.getAs[Long]("n_outliers") == batchOutliers)
    assert(s.getAs[Long]("n_unseen") == 0L)
  }

  test("attach: planted spikes alarm, unseen buckets counted, in-profile quiet") {
    val fit = ev((0 until 500).map(i => (i.toLong * 1000000L % 3000000000L,
      10.0 + (i % 5))): _*) // values 10..14 in one hour bucket
    val frozen = Profiling.seasonalRegisters(fit, Seq("k"), "ts", "value")
      .cache()
    try {
      frozen.count()
      val stream = MemoryStream[(Long, Double)](spark)
      val seen = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
      val q = StreamingSeasonal.attach(
        stream.toDF().toDF("_us", "value")
          .select(lit("g").as("k"),
            timestamp_micros(col("_us") + baseUs).as("ts"), col("value")),
        frozen, Seq("k"), "ts", "value", 3, tmpDir("sseas-ckpt")) {
        (df, id) =>
          val r = df.head()
          seen(id) = (r.getAs[Long]("n_scored"), r.getAs[Long]("n_outliers"),
            r.getAs[Long]("n_unseen"))
      }
      try {
        // wave 0: in-profile values -> quiet
        stream.addData((0 until 50).map(i => (i.toLong * 1000000L, 12.0)): _*)
        q.processAllAvailable()
        assert(seen(0L) == ((50L, 0L, 0L)))
        // wave 1: spikes in-bucket + rows in an hour the profile never saw
        stream.addData(
          Seq((1000000L, 500.0), (2000000L, 500.0),
            (7200L * 1000000L, 12.0)): _*)
        q.processAllAvailable()
        assert(seen(1L) == ((2L, 2L, 1L)))
      } finally q.stop()
    } finally frozen.unpersist(blocking = false)
  }
}
