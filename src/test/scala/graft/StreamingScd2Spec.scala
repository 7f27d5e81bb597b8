package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Compaction
import graft.streaming.StreamingScd2

/** Streaming SCD2 maintenance: stream == batch parity after EVERY trigger
  * (the interval table maintained by per-trigger delete+insert deltas
  * equals Compaction.scd2 over everything seen), late rows close/reopen
  * ONLY the affected keys, and restart/incarnation discipline. */
class StreamingScd2Spec extends SparkSpec {

  import spark.implicits._

  private type Row5 = (Long, Long, Long, Double, String)
  private type Interval = (Long, Double, Long, Option[Long], Boolean)

  private def ivSet(df: DataFrame): Set[Interval] =
    df.collect().map { r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))
    }.toSet

  private def batchScd2(rows: Seq[Row5]): Set[Interval] =
    ivSet(Compaction.scd2(
      rows.toDF("k", "ts", "seq", "v", "op"), Seq("k"), "ts", Seq("v"),
      seqCol = Some("seq"), opCol = Some("op")))

  test("attach: per-trigger deltas maintain the table; late rows reopen only their key") {
    val statePath = tmpDir("sscd2") + "/state"
    // the externally maintained interval table: delete affected, insert
    // refreshed — the documented sink contract
    val table = scala.collection.mutable.Map.empty[Long, Set[Interval]]
    var lastAffected: Set[Long] = Set.empty
    val stream = MemoryStream[Row5](spark)
    val q = StreamingScd2.attach(
      stream.toDF().toDF("k", "ts", "seq", "v", "op"), Seq("k"), "ts",
      Seq("v"), statePath, tmpDir("sscd2-ckpt"),
      seqCol = Some("seq"), opCol = Some("op")) { (refreshed, affected, _) =>
      val aff = affected.collect().map(_.getLong(0)).toSet
      lastAffected = aff
      aff.foreach(table.remove)
      ivSet(refreshed).groupBy(_._1).foreach { case (k, ivs) =>
        table(k) = ivs
      }
    }
    val w1: Seq[Row5] = Seq(
      (1L, 10L, 0L, 1.0, "U"), (1L, 20L, 1L, 2.0, "U"),
      (2L, 10L, 2L, 9.0, "U"),
      (3L, 15L, 3L, 5.0, "U"), (3L, 15L, 4L, 6.0, "U")) // same-ts tie
    val w2: Seq[Row5] = Seq(
      (1L, 30L, 5L, 0.0, "D")) // tombstone, touches ONLY key 1
    val w3: Seq[Row5] = Seq(
      (2L, 5L, 6L, 8.0, "U"), // LATE row: rewrites key 2's history head
      (4L, 40L, 7L, 4.0, "U"))
    try {
      var seen = Seq.empty[Row5]
      for ((w, i) <- Seq(w1, w2, w3).zipWithIndex) {
        stream.addData(w: _*); q.processAllAvailable()
        seen ++= w
        // the incrementally maintained table == the batch expression
        assert(table.values.flatten.toSet === batchScd2(seen), s"wave $i")
        // and so does the bootstrap/audit readout
        assert(ivSet(StreamingScd2.currentIntervals(
          spark, statePath, Seq("k"), "ts", Seq("v"),
          opCol = Some("op")).get) === batchScd2(seen), s"wave $i")
      }
      // wave 2: only key 1 was closed (tombstone); wave 3's late row
      // reopened only keys 2 and 4
      assert(lastAffected === Set(2L, 4L))
      // the late row became key 2's history head: [5,10) then [10,inf)
      assert(table(2L) === Set(
        (2L, 8.0, 5L, Some(10L), false), (2L, 9.0, 10L, None, true)))
      // key 1 ended on a tombstone: closed interval, no current row
      assert(table(1L) === Set(
        (1L, 1.0, 10L, Some(20L), false), (1L, 2.0, 20L, Some(30L), false)))
    } finally q.stop()
  }

  test("attach: restart continues the fold; a fresh incarnation purges forward state") {
    val statePath = tmpDir("sscd2-r") + "/state"
    val ckpt = tmpDir("sscd2-r-ckpt")
    def run(stream: MemoryStream[Row5], checkpoint: String) =
      StreamingScd2.attach(
        stream.toDF().toDF("k", "ts", "seq", "v", "op"), Seq("k"), "ts",
        Seq("v"), statePath, checkpoint,
        seqCol = Some("seq"), opCol = Some("op")) { (_, _, _) => () }
    def current(): Set[Interval] =
      ivSet(StreamingScd2.currentIntervals(
        spark, statePath, Seq("k"), "ts", Seq("v"), opCol = Some("op")).get)

    val b1: Seq[Row5] = (0 until 50).map(i =>
      ((i % 5).toLong, (i / 5).toLong, i.toLong, i.toDouble, "U"))
    val b2: Seq[Row5] = Seq((0L, 99L, 100L, 7.0, "U"))
    val s1 = MemoryStream[Row5](spark)
    val q1 = run(s1, ckpt)
    try {
      s1.addData(b1: _*); q1.processAllAvailable()
      assert(current() === batchScd2(b1))
    } finally q1.stop()

    // same checkpoint -> continuation: batch 0 REPLAYS from the new source
    // (purge-at-or-above rewrites staging 0 instead of double-applying)
    val s2 = MemoryStream[Row5](spark)
    s2.addData(b1: _*)
    s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try {
      q2.processAllAvailable()
      assert(current() === batchScd2(b1 ++ b2))
    } finally q2.stop()

    // FRESH checkpoint -> batch ids restart at 0; the attach must purge
    // stagings at/above its id instead of folding onto future state
    val b3: Seq[Row5] = Seq((9L, 1L, 0L, 3.0, "U"))
    val s3 = MemoryStream[Row5](spark)
    val q3 = run(s3, tmpDir("sscd2-r-ckpt2"))
    try {
      s3.addData(b3: _*); q3.processAllAvailable()
      assert(current() === batchScd2(b3))
    } finally q3.stop()
  }
}
