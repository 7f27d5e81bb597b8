package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Cms
import graft.streaming.StreamingCms

/** Streaming CMS sketch: exact stream==batch parity over the ingested
  * MULTISET (counts add — an overlap between triggers counts twice, by
  * definition of a frequency sketch), restart continuation with
  * exactly-once folding, and incarnation-reset purging. */
class StreamingCmsSpec extends SparkSpec {

  import spark.implicits._

  private def regMap(
      df: org.apache.spark.sql.DataFrame): Map[(String, Int, Long), Long] =
    df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap

  test("attach: per-trigger registers equal the batch sketch over the ingested multiset") {
    val statePath = tmpDir("scms") + "/state"
    val stream = MemoryStream[(String, String)](spark)
    val seen = scala.collection.mutable.Map.empty[Long, Map[(String, Int, Long), Long]]
    val q = StreamingCms.attach(
      stream.toDF().toDF("g", "v"), Seq("g"), "v", depth = 3, width = 32,
      statePath, tmpDir("scms-ckpt")) { (regs, id) =>
      seen(id) = regMap(regs)
    }
    val b1 = (0 until 800).map(i => (if (i % 2 == 0) "a" else "b", s"u${i % 120}"))
    val b2 = (0 until 600).map(i => (if (i % 2 == 0) "a" else "b", s"u${i % 90}"))
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val batch1 = regMap(
      Cms.registers(b1.toDF("g", "v"), Seq("g"), "v", 3, 32))
    // the triggers OVERLAP heavily in values: counts must ADD (multiset
    // semantics), exactly matching one batch sketch over the concatenation
    val batchAll = regMap(
      Cms.registers((b1 ++ b2).toDF("g", "v"), Seq("g"), "v", 3, 32))
    assert(seen(0L) === batch1)
    assert(seen(1L) === batchAll)
  }

  test("attach: restart folds exactly once; a fresh incarnation purges prior state") {
    val statePath = tmpDir("scms-r") + "/state"
    val ckpt = tmpDir("scms-r-ckpt")
    val out = scala.collection.mutable.Map.empty[Long, Map[(String, Int, Long), Long]]
    def run(stream: MemoryStream[(String, String)], checkpoint: String) =
      StreamingCms.attach(
        stream.toDF().toDF("g", "v"), Seq("g"), "v", depth = 3, width = 32,
        statePath, checkpoint) { (regs, id) => out(id) = regMap(regs) }

    val b1 = (0 until 500).map(i => ("g", s"x${i % 80}"))
    val b2 = (0 until 300).map(i => ("g", s"x${i % 60}"))
    val s1 = MemoryStream[(String, String)](spark)
    val q1 = run(s1, ckpt)
    try { s1.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()

    // same checkpoint -> continuation: the checkpoint resumes AT b2 (the
    // re-added b1 only recreates source offsets), so a non-idempotent sum
    // still folds every row exactly once
    val s2 = MemoryStream[(String, String)](spark)
    s2.addData(b1: _*)
    s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val batchAll = regMap(
      Cms.registers((b1 ++ b2).toDF("g", "v"), Seq("g"), "v", 3, 32))
    assert(out.maxBy(_._1)._2 === batchAll)

    // fresh checkpoint, same statePath -> incarnation reset: the registers
    // reflect ONLY the new run's data
    val s3 = MemoryStream[(String, String)](spark)
    s3.addData(("g", "solo"), ("g", "solo"), ("g", "other"))
    val q3 = run(s3, tmpDir("scms-r-ckpt2"))
    try q3.processAllAvailable() finally q3.stop()
    val fresh = regMap(Cms.registers(
      Seq(("g", "solo"), ("g", "solo"), ("g", "other")).toDF("g", "v"),
      Seq("g"), "v", 3, 32))
    assert(out(0L) === fresh)
  }
}
