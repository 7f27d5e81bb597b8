package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Hll
import graft.streaming.StreamingHll

/** Streaming HLL sketch: exact stream==batch parity (the merge is a max
  * over integer registers), replay-idempotent sinks, restart continuation,
  * and incarnation-reset purging. */
class StreamingHllSpec extends SparkSpec {

  import spark.implicits._

  private def estMap(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("attach: per-trigger estimate equals the batch sketch over everything seen, exactly") {
    val statePath = tmpDir("shll") + "/state"
    val stream = MemoryStream[(String, String)](spark)
    val seen = scala.collection.mutable.Map.empty[Long, Map[String, Double]]
    val q = StreamingHll.attach(
      stream.toDF().toDF("g", "v"), Seq("g"), "v", p = 8,
      statePath, tmpDir("shll-ckpt")) { (est, id) =>
      seen(id) = estMap(est)
    }
    val b1 = (0 until 800).map(i => (if (i % 2 == 0) "a" else "b", s"u$i"))
    val b2 = (500 until 1500).map(i => (if (i % 2 == 0) "a" else "b", s"u$i"))
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val batch1 = estMap(Hll.distinctSketch(b1.toDF("g", "v"), Seq("g"), "v", p = 8))
    val batchAll = estMap(
      Hll.distinctSketch((b1 ++ b2).toDF("g", "v"), Seq("g"), "v", p = 8))
    assert(seen(0L) === batch1)
    // the batches OVERLAP (500..799 repeat): a fold that double-counted
    // would drift from the batch sketch — exact equality pins idempotence
    assert(seen(1L) === batchAll)
  }

  test("attach: restart continues the fold; a fresh incarnation purges prior state") {
    val statePath = tmpDir("shll-r") + "/state"
    val ckpt = tmpDir("shll-r-ckpt")
    val out = scala.collection.mutable.Map.empty[Long, Map[String, Double]]
    def run(stream: MemoryStream[(String, String)], checkpoint: String) =
      StreamingHll.attach(
        stream.toDF().toDF("g", "v"), Seq("g"), "v", p = 8,
        statePath, checkpoint) { (est, id) => out(id) = estMap(est) }

    val b1 = (0 until 600).map(i => ("g", s"x$i"))
    val b2 = (600 until 900).map(i => ("g", s"x$i"))
    val s1 = MemoryStream[(String, String)](spark)
    val q1 = run(s1, ckpt)
    try { s1.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()

    // same checkpoint -> continuation: trigger 2 folds onto trigger 1
    val s2 = MemoryStream[(String, String)](spark)
    s2.addData(b1: _*) // replayed source rows land in a NEW batch id — the
    s2.addData(b2: _*) // fold must stay idempotent on the overlap
    val q2 = run(s2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val batchAll = estMap(
      Hll.distinctSketch((b1 ++ b2).toDF("g", "v"), Seq("g"), "v", p = 8))
    assert(out.maxBy(_._1)._2 === batchAll)

    // fresh checkpoint, same statePath -> incarnation reset: the estimate
    // reflects ONLY the new run's data
    val s3 = MemoryStream[(String, String)](spark)
    s3.addData(("g", "solo1"), ("g", "solo2"))
    val q3 = run(s3, tmpDir("shll-r-ckpt2"))
    try q3.processAllAvailable() finally q3.stop()
    val fresh = estMap(Hll.distinctSketch(
      Seq(("g", "solo1"), ("g", "solo2")).toDF("g", "v"), Seq("g"), "v", p = 8))
    assert(out(0L) === fresh)
  }
}
