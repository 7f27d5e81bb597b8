package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Kll
import graft.streaming.StreamingKll

/** Streaming KLL sketch: EXACT frame parity with the batch fold expression
  * (the md5 coins make the fold a pure function of (prefix, batch) — unlike
  * StreamingQuantiles' q-digest, parity here is register-for-register, not
  * contract-only), weight == rows seen at every trigger, estimate sanity
  * over everything seen, and restart/incarnation discipline. */
class StreamingKllSpec extends SparkSpec {

  import spark.implicits._

  private val (buckets, k, rounds, sweep) = (4, 16, 8, 14)

  private def batchBuild(rows: Seq[(String, Long, Double)]): DataFrame =
    Kll.registers(rows.toDF("g", "id", "v"), Seq("g"), "v", "id",
      buckets, k, rounds, "skll")

  private def stateSet(df: DataFrame): Set[(String, Int, Double)] =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet

  test("attach: streamed state == the batch fold expression, register-for-register") {
    val statePath = tmpDir("skll") + "/state"
    val stream = MemoryStream[(String, Long, Double)](spark)
    val ns = scala.collection.mutable.Map.empty[Long, Long]
    val q = StreamingKll.attach(
      stream.toDF().toDF("g", "id", "v"), Seq("g"), "v", "id",
      buckets, k, rounds, sweep, Seq("p50" -> 0.5),
      statePath, tmpDir("skll-ckpt")) { (est, id) =>
      ns(id) = est.head().getAs[Long]("n")
    }
    val rnd = new scala.util.Random(21)
    val waves = (0 until 3).map(w =>
      (0 until 1500).map(i =>
        ("g", (w * 10000 + i).toLong, rnd.nextDouble() * 100 - 50)))
    try {
      waves.zipWithIndex.foreach { case (w, i) =>
        stream.addData(w: _*); q.processAllAvailable()
        val seen = waves.take(i + 1)
        // weight == rows seen, every trigger
        assert(ns(i.toLong) === seen.map(_.size).sum.toLong)
        // exact parity: merge(delta_i, merge(delta_{i-1}, ... delta_0))
        val expected = seen.map(batchBuild).reduceLeft((prefix, delta) =>
          Kll.merge(delta, prefix, Seq("g"), k, sweep, "skll"))
        val got = StreamingKll.currentRegisters(spark, statePath).get
        assert(stateSet(got) === stateSet(expected))
        // estimate lands within the additive bound of the true median
        val est = Kll.estimate(got, Seq("g"), Seq("p50" -> 0.5))
          .head().getAs[Double]("p50")
        val vals = seen.flatten.map(_._3).sorted
        val trueRank = vals.count(_ <= est)
        assert(math.abs(trueRank - vals.size / 2) <=
          4.0 * (i + 2) * vals.size / k)
      }
    } finally q.stop()
  }

  test("attach: restart continues the fold; a fresh incarnation purges forward state") {
    val statePath = tmpDir("skll-r") + "/state"
    val ckpt = tmpDir("skll-r-ckpt")
    val ns = scala.collection.mutable.Map.empty[Long, Long]
    def run(stream: MemoryStream[(String, Long, Double)], checkpoint: String) =
      StreamingKll.attach(
        stream.toDF().toDF("g", "id", "v"), Seq("g"), "v", "id",
        buckets, k, rounds, sweep, Seq("p50" -> 0.5),
        statePath, checkpoint) { (est, id) => ns(id) = est.head().getAs[Long]("n") }

    val b1 = (0 until 500).map(i => ("g", i.toLong, i.toDouble))
    val b2 = (500 until 800).map(i => ("g", i.toLong, i.toDouble))
    val s1 = MemoryStream[(String, Long, Double)](spark)
    val q1 = run(s1, ckpt)
    try {
      s1.addData(b1: _*)
      q1.processAllAvailable()
      assert(ns(0L) === 500L)
    } finally q1.stop()

    // same checkpoint -> continuation: batch 0 REPLAYS from the new source
    // (purge-at-or-above rewrites staging 0 instead of double-applying),
    // then batch 1 folds b2 onto it
    val s2 = MemoryStream[(String, Long, Double)](spark)
    s2.addData(b1: _*)
    s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try {
      q2.processAllAvailable()
      assert(ns.values.max === 800L)
    } finally q2.stop()

    // FRESH checkpoint -> batch ids restart at 0; the attach must purge
    // stagings at/above its id instead of folding onto future state
    val s3 = MemoryStream[(String, Long, Double)](spark)
    val q3 = run(s3, tmpDir("skll-r-ckpt2"))
    try {
      s3.addData((0 until 100).map(i => ("g", i.toLong, i.toDouble)): _*)
      q3.processAllAvailable()
      assert(ns(0L) === 100L)
      val w = StreamingKll.currentRegisters(spark, statePath).get
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), _level)")))
        .head().getLong(0)
      assert(w === 100L)
    } finally q3.stop()
  }

  test("attach: keys = Nil maintains a global sketch end-to-end (round-13 advice)") {
    val statePath = tmpDir("skll-g") + "/state"
    val stream = MemoryStream[(String, Long, Double)](spark)
    val got = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    // before the fix this attach started cleanly and died inside
    // foreachBatch at the first trigger (Kll.estimate required keys)
    val q = StreamingKll.attach(
      stream.toDF().toDF("g", "id", "v"), Nil, "v", "id",
      buckets, k, rounds, sweep, Seq("p50" -> 0.5),
      statePath, tmpDir("skll-g-ckpt")) { (est, id) =>
      val r = est.head()
      got(id) = (r.getAs[Long]("n"), r.getAs[Double]("p50"))
    }
    try {
      stream.addData((0 until 1000).map(i => ("g", i.toLong, i.toDouble)): _*)
      q.processAllAvailable()
      val (n, p50) = got(0L)
      assert(n === 1000L)
      // single trigger, no merge slack: |rank(p50) - n/2| <= 4n/k
      assert(math.abs(p50 - 500.0) <= 4.0 * 1000 / k + 1)
    } finally q.stop()
  }
}
