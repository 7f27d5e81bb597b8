package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Experiment
import graft.streaming.StreamingBt

/** Streaming Bradley–Terry: exact stream==batch parity (the fit is a pure
  * function of sum-folded pair counts), replay safety via batch-id
  * staging, restart continuation, and incarnation reset. */
class StreamingBtSpec extends SparkSpec {

  import spark.implicits._

  private def fitMap(
      df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Double)] =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

  private def batchFit(trials: Seq[(String, String)]) =
    fitMap(Experiment.bradleyTerry(
      trials.toDF("winner", "loser"), "winner", "loser", iters = 3))

  test("attach: per-trigger leaderboard equals the batch fit over everything seen, exactly") {
    val statePath = tmpDir("sbt") + "/state"
    val stream = MemoryStream[(String, String)](spark)
    val seen = scala.collection.mutable.Map.empty[Long, Map[String, (Long, Long, Double)]]
    val q = StreamingBt.attach(
      stream.toDF().toDF("winner", "loser"), "winner", "loser", iters = 3,
      statePath, tmpDir("sbt-ckpt")) { (fit, id) => seen(id) = fitMap(fit) }
    val b1 = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("C", "A"))
    val b2 = Seq(("A", "B"), ("B", "A"), ("A", "C"), ("B", "C"))
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(seen(0L) === batchFit(b1))
    // b2 repeats (A,B): a double-counting fold would drift from the batch
    // fit over the union — exact equality pins the staging discipline
    assert(seen(1L) === batchFit(b1 ++ b2))
  }

  test("attach: restart continues the fold; a fresh incarnation purges prior state") {
    val statePath = tmpDir("sbt-r") + "/state"
    val ckpt = tmpDir("sbt-r-ckpt")
    val out = scala.collection.mutable.Map.empty[Long, Map[String, (Long, Long, Double)]]
    def run(stream: MemoryStream[(String, String)], checkpoint: String) =
      StreamingBt.attach(
        stream.toDF().toDF("winner", "loser"), "winner", "loser", iters = 3,
        statePath, checkpoint) { (fit, id) => out(id) = fitMap(fit) }

    val b1 = Seq(("X", "Y"), ("Y", "Z"), ("X", "Z"), ("Z", "Y"))
    val b2 = Seq(("Y", "X"), ("Y", "X"), ("Z", "X"))
    val s1 = MemoryStream[(String, String)](spark)
    val q1 = run(s1, ckpt)
    try { s1.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()

    // same checkpoint -> continuation: the replayed-source rows land in a
    // NEW batch id; the sum-fold must not double-count b1
    val s2 = MemoryStream[(String, String)](spark)
    s2.addData(b1: _*)
    s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(out.maxBy(_._1)._2 === batchFit(b1 ++ b2))

    // fresh checkpoint, same statePath -> incarnation reset
    val s3 = MemoryStream[(String, String)](spark)
    s3.addData(("P", "Q"), ("P", "Q"), ("Q", "P"))
    val q3 = run(s3, tmpDir("sbt-r-ckpt2"))
    try q3.processAllAvailable() finally q3.stop()
    assert(out(0L) === batchFit(Seq(("P", "Q"), ("P", "Q"), ("Q", "P"))))
  }
}
