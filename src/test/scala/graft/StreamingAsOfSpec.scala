package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.AsOfJoin
import graft.streaming.StreamingAsOf

/** The streaming-native as-of version store: batch parity on an out-of-order
  * corpus (the round-6 verdict's stretch task), and the scale contract — the
  * per-batch shuffle stays flat while the accumulated version history grows
  * (the verdict's top finding against the foreachBatch temporal form). */
class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  private type E = (Long, Long, Long)              // (id, k, t)
  private type V = (Long, Long, Long, Double)      // (k, t, pk, v)

  private def startEnriched(
      stream: MemoryStream[(Int, E, V)], name: String, delay: String) = {
    // one MemoryStream multiplexes both sides (tag 0 = cdc, 1 = event) so a
    // single addData can interleave them arbitrarily out of order
    val both = stream.toDS()
    val events = both.filter(_._1 == 1).map(_._2)
    val cdc = both.filter(_._1 == 0).map(_._3)
    StreamingAsOf.enrich[Long, E, V](
        events, cdc,
        eventKey = _._2, eventTime = _._3,
        cdcKey = _._1, cdcTime = _._2,
        delay = delay,
        tieBreak = implicitly[Ordering[V]])
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", tmpDir(s"ckpt-$name"))
      .start()
  }

  test("parity with batch AsOfJoin.asOf over an out-of-order interleaving") {
    val base = 1700000000000000L
    val rnd = new scala.util.Random(23)
    val events: Seq[E] = (0 until 300).map(i =>
      (i.toLong, 1L + rnd.nextInt(6), base + rnd.nextInt(600) * 1000000L))
    // tie-free (k, t) so both engines are deterministic without tie-breaks
    val cdc: Seq[V] = rnd.shuffle((0 until 600).toList).take(150).zipWithIndex
      .map { case (t, i) =>
        (1L + (i % 6), base + t * 1000000L, i.toLong, (i % 7).toDouble) }
    val mixed = rnd.shuffle(
      events.map(e => (1, e, null.asInstanceOf[V])) ++
        cdc.map(v => (0, null.asInstanceOf[E], v)))

    val stream = MemoryStream[(Int, E, V)](spark)
    val q = startEnriched(stream, "asof_parity", delay = "20 minutes")
    try {
      mixed.grouped(90).foreach { b => stream.addData(b); q.processAllAvailable() }
      // two flush rounds: the first advances the watermark past every event,
      // the second gives the event-time timeouts a batch to fire in
      for (i <- 0 to 1) {
        stream.addData(Seq((1, (9000L + i, 99L, base + 3600 * 1000000L), null.asInstanceOf[V])))
        q.processAllAvailable()
      }
      val got = spark.table("asof_parity").collect().map { r =>
        val e = r.getStruct(0)
        val p = Option(r.getStruct(1)).map(v => (v.getLong(2), v.getDouble(3)))
        e.getLong(0) -> p
      }.toMap.filter(_._1 < 9000L)
      val expect = AsOfJoin.asOf(
          events.toDF("id", "k", "t"), cdc.toDF("rk", "rt", "pk", "v"),
          Seq("k"), Seq("rk"), "t", "rt", Seq("pk", "v"))
        .collect().map { r =>
          r.getLong(0) -> Option(r.get(3)).map(p =>
            (p.asInstanceOf[Long], r.getDouble(4)))
        }.toMap
      assert(got.size === events.size, "every event must emit exactly once")
      assert(got === expect)
    } finally q.stop()
  }

  test("per-batch shuffle stays flat while the version history grows") {
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        ()
      }
    }
    def settled(): Long = {
      var prev = -1L; var cur = shuffleRecords.get()
      while (cur != prev) { prev = cur; Thread.sleep(150); cur = shuffleRecords.get() }
      cur
    }
    val base = 1700000000000000L
    spark.sparkContext.addSparkListener(listener)
    val stream = MemoryStream[(Int, E, V)](spark)
    // delay longer than the whole run -> nothing prunes, history only GROWS
    val q = startEnriched(stream, "asof_flat", delay = "10 hours")
    try {
      val perBatch = (0 until 24).map { b =>
        val t0 = base + b * 60 * 1000000L
        val rows =
          (0 until 40).map(i => (0, null.asInstanceOf[E],
            ((i % 8).toLong, t0 + i * 1000000L, b * 100L + i, 1.0): V)) ++
          (0 until 40).map(i => (1,
            (b * 1000L + i, (i % 8).toLong, t0 + i * 1000000L): E,
            null.asInstanceOf[V]))
        val before = settled()
        stream.addData(rows); q.processAllAvailable()
        settled() - before
      }
      // steady state: batches 4.. see identical input sizes against an
      // ever-growing per-key version history; a history-proportional
      // re-exchange (the foreachBatch form's defect) would grow ~6x here
      val steady = perBatch.drop(4)
      info(s"per-batch shuffle records: $perBatch")
      assert(steady.max <= math.max(2 * steady.min, steady.min + 200),
        s"per-batch shuffle must not grow with history: $perBatch")
      val progress = q.recentProgress.filter(_.stateOperators.nonEmpty)
      val stateRows = progress.map(_.stateOperators(0).numRowsTotal)
      assert(stateRows.last >= 8L, s"state must hold the keys: ${stateRows.toSeq}")
    } finally {
      q.stop()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("late-admissible event selects the version at ITS time, not current") {
    val base = 1700000000000000L
    val stream = MemoryStream[(Int, E, V)](spark)
    val q = startEnriched(stream, "asof_late", delay = "10 minutes")
    try {
      // two versions for key 1, then advance time far ahead
      stream.addData(Seq(
        (0, null.asInstanceOf[E], (1L, base, 100L, 1.0): V),
        (0, null.asInstanceOf[E], (1L, base + 300 * 1000000L, 200L, 2.0): V)))
      q.processAllAvailable()
      // an event OLDER than the newest version but still admissible: must
      // pick version 100 (at its event time), not 200 (current)
      stream.addData(Seq(
        (1, (1L, 1L, base + 100 * 1000000L): E, null.asInstanceOf[V]),
        (1, (2L, 1L, base + 400 * 1000000L): E, null.asInstanceOf[V])))
      q.processAllAvailable()
      for (i <- 0 to 1) {
        stream.addData(Seq(
          (1, (9000L + i, 99L, base + 7200 * 1000000L): E, null.asInstanceOf[V])))
        q.processAllAvailable()
      }
      val got = spark.table("asof_late").collect().map { r =>
        (r.getStruct(0).getLong(0), Option(r.getStruct(1)).map(_.getLong(2)))
      }.toMap
      assert(got(1L) === Some(100L))
      assert(got(2L) === Some(200L))
    } finally q.stop()
  }
}
