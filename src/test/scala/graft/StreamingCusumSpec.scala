package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingCusum

/** Page's online CUSUM at ingest: in-control silence, up/down alarms,
  * cross-trigger accumulation, slack suppression, and Page's restart. */
class StreamingCusumSpec extends SparkSpec {

  private val t0 = 1700000000000000L

  private def run(
      waves: Seq[Seq[(String, Long, Double)]],
      ref: Map[String, Double], k: Double, h: Double)
      : Seq[(String, Long, Double, String, Double)] = {
    import spark.implicits._
    val stream = MemoryStream[(String, Long, Double)](spark)
    val out = StreamingCusum.updates(stream.toDS(), ref, k, h)
    val name = s"cusum_${waves.hashCode.abs}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      waves.foreach { w => stream.addData(w: _*); q.processAllAvailable() }
      spark.table(name)
        .as[(String, Long, Double, String, Double)].collect().toSeq
    } finally q.stop()
  }

  test("in-control stream never alarms; a level shift alarms upward and restarts") {
    // baseline mu0 = 10, k = 0.5 swallows the ±0.4 wobble
    val inControl = (0 until 20).map(i =>
      ("m", t0 + i * 1000L, 10.0 + (if (i % 2 == 0) 0.4 else -0.4)))
    assert(run(Seq(inControl), Map("m" -> 10.0), 0.5, 3.0).isEmpty)
    // shift to 12 AFTER the in-control window: each event adds
    // 2 - 0.5 = 1.5; alarm at event 3 (S = 4.5 > 3), restart, alarm again
    // at event 6 — Page's re-alarm on a persisting shift
    val shifted = (0 until 6).map(i => ("m", t0 + (100 + i) * 1000L, 12.0))
    val got = run(Seq(inControl ++ shifted), Map("m" -> 10.0), 0.5, 3.0)
    assert(got.map(_._4).distinct == Seq("up"))
    assert(got.map(_._2) == Seq(t0 + 102000L, t0 + 105000L),
      s"alarm at the 3rd shifted event, restart, re-alarm at the 6th: $got")
    assert(got.head._5 == 4.5)
  }

  test("downward drift alarms 'down'; a shift split ACROSS triggers still accumulates") {
    val w1 = (0 until 2).map(i => ("m", t0 + i * 1000L, 7.0))  // mu0=10, k=0.5
    val w2 = (2 until 4).map(i => ("m", t0 + i * 1000L, 7.0))
    // each event adds 2.5 to S-; alarm when S- > 8 -> 4th event (S=10)
    val got = run(Seq(w1, w2), Map("m" -> 10.0), 0.5, 8.0)
    assert(got.map(t => (t._4, t._2)) == Seq(("down", t0 + 3000L)),
      s"state must carry S- = 5 across the trigger boundary: $got")
    assert(got.head._5 == 10.0)
  }

  test("keys without a frozen reference are dropped; keys alarm independently") {
    val rows = (0 until 4).map(i => ("known", t0 + i * 1000L, 20.0)) ++
      (0 until 4).map(i => ("unknown", t0 + i * 1000L, 99.0))
    val got = run(Seq(rows), Map("known" -> 10.0), 0.0, 25.0)
    assert(got.map(_._1).distinct == Seq("known"))
    // 10 per event: alarm at event 3 (S=30 > 25), restart, none after
    assert(got.map(_._2) == Seq(t0 + 2000L))
  }
}
