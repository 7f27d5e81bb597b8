package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Profiling
import graft.streaming.StreamingZscore

class StreamingZscoreSpec extends SparkSpec {

  private def sec(s: Long): Long = s * 1000000L

  test("parity: anomalies emitted across triggers equal the batch operator") {
    import spark.implicits._
    // per key: stable baseline, one mid-stream spike, split across triggers
    def series(k: String, base: Double): Seq[(String, Long, Double)] =
      (1 to 12).map(i => (k, sec(i * 10), base + (i % 3) * 0.1)) :+
        ((k, sec(125), base + 30.0)) :+ ((k, sec(130), base - 0.1))
    val all = series("a", 5.0) ++ series("b", 80.0)
    val (t1, t2) = all.sortBy(_._2).splitAt(14) // in-order split per key

    val stream = MemoryStream[(String, Long, Double)](spark)
    val df = stream.toDF().toDF("k", "ts", "v")
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Double, Long, Double)]()
    val q = StreamingZscore.attach(
      df, "k", "ts", "v", windowSize = sec(100), zThreshold = 2.0,
      minCount = 5, tmpDir("sz-ckpt")) { (batch, _) =>
      val rows = batch.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      got.synchronized { got ++= rows }
    }
    try {
      stream.addData(t1: _*)
      q.processAllAvailable()
      stream.addData(t2: _*)
      q.processAllAvailable()
      val want = Profiling.rollingZscore(
        all.toDF("k", "ts", "v"), Seq("k"), "ts", "v",
        windowSize = sec(100), zThreshold = 2.0, minCount = 5)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(want.nonEmpty, "fixture must actually contain anomalies")
      assert(got.synchronized(got.toSet) == want)
    } finally q.stop()
  }

  test("equal-ts events in one trigger score against a window including each other") {
    import spark.implicits._
    val all = (1 to 8).map(i => ("k", sec(i), 1.0 + (i % 2) * 0.2)) ++
      Seq(("k", sec(9), 9.0), ("k", sec(9), 9.2)) // equal-ts pair, both spikes
    val stream = MemoryStream[(String, Long, Double)](spark)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Double, Long)]()
    val q = StreamingZscore.attach(
      stream.toDF().toDF("k", "ts", "v"), "k", "ts", "v",
      windowSize = sec(100), zThreshold = 1.5, minCount = 5,
      tmpDir("sz2-ckpt")) { (batch, _) =>
      val rows = batch.collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
      got.synchronized { got ++= rows }
    }
    try {
      stream.addData(all: _*)
      q.processAllAvailable()
      val want = Profiling.rollingZscore(
        all.toDF("k", "ts", "v"), Seq("k"), "ts", "v", sec(100), 1.5, 5)
        .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      // both equal-ts spikes see n_window = 10 (each other included)
      assert(want.forall(_._3 == 10L))
      assert(got.synchronized(got.toSet) == want)
    } finally q.stop()
  }

  test("idle keys evict after the inactivity horizon; live keys keep their window") {
    import spark.implicits._
    val stream = MemoryStream[(String, Long, Double)](spark)
    val q = StreamingZscore.attach(
      stream.toDF().toDF("k", "ts", "v"), "k", "ts", "v",
      windowSize = sec(50), zThreshold = 2.0, minCount = 5,
      tmpDir("sz3-ckpt"), inactivity = java.time.Duration.ofSeconds(60)) {
      // must consume every partition or the state commit is invalidated
      (batch, _) => { batch.count(); () }
    }
    try {
      stream.addData(("idle", sec(10), 1.0), ("live", sec(30), 1.0))
      q.processAllAvailable()
      // watermark 150s > idle's 10s + 60s horizon -> idle evicted
      stream.addData(("live", sec(150), 1.1))
      q.processAllAvailable()
      stream.addData(("live", sec(151), 1.2))
      q.processAllAvailable()
      val counts = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal)
      assert(counts.max >= 2, s"both keys resident at some point: $counts")
      assert(counts.last == 1, s"only the live key should remain: $counts")
    } finally q.stop()
  }
}
