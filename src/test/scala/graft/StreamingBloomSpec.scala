package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Bloom
import graft.streaming.StreamingBloom

/** Streaming Bloom filter: exact stream==batch parity (the merge is a
  * bitwise OR over integer registers), replay-idempotent folds, restart
  * continuation, incarnation-reset purging, and the frozen-filter probe's
  * no-false-negative gate. */
class StreamingBloomSpec extends SparkSpec {

  import spark.implicits._

  private def regSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("_word", "_bits").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("attach: per-trigger registers equal the batch filter over everything seen, exactly") {
    val statePath = tmpDir("sbloom") + "/state"
    val stream = MemoryStream[String](spark)
    val stats = scala.collection.mutable.Map.empty[Long, Long]
    val q = StreamingBloom.attach(
      stream.toDF().toDF("v"), Nil, "v", mBits = 4096, k = 3,
      statePath, tmpDir("sbloom-ckpt")) { (st, id) =>
      stats(id) = st.collect().head.getAs[Long]("bits_set")
    }
    val b1 = (0 until 500).map(i => s"u$i")
    val b2 = (300 until 900).map(i => s"u$i") // overlaps b1: OR must not drift
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val streamed = StreamingBloom.currentRegisters(spark, statePath).get
      val batchAll = Bloom.registers((b1 ++ b2).toDF("v"), Nil, "v", 4096, 3)
      assert(regSet(streamed) === regSet(batchAll))
    } finally q.stop()
    val bits1 = Bloom.stats(
      Bloom.registers(b1.toDF("v"), Nil, "v", 4096, 3), Nil, 4096, 3)
      .head.getAs[Long]("bits_set")
    assert(stats(0L) === bits1)
    assert(stats(1L) > stats(0L), "new values must set new bits")
  }

  test("attach: restart continues the fold; a fresh incarnation purges prior state") {
    val statePath = tmpDir("sbloom-r") + "/state"
    val ckpt = tmpDir("sbloom-r-ckpt")
    def run(stream: MemoryStream[String], checkpoint: String) =
      StreamingBloom.attach(
        stream.toDF().toDF("v"), Nil, "v", mBits = 2048, k = 3,
        statePath, checkpoint) { (_, _) => () }

    val b1 = (0 until 400).map(i => s"x$i")
    val b2 = (400 until 700).map(i => s"x$i")
    val s1 = MemoryStream[String](spark)
    val q1 = run(s1, ckpt)
    try { s1.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()

    // same checkpoint -> continuation; replayed rows land in a new batch
    // id and the OR-fold stays idempotent on the overlap
    val s2 = MemoryStream[String](spark)
    s2.addData(b1: _*)
    s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(regSet(StreamingBloom.currentRegisters(spark, statePath).get) ===
      regSet(Bloom.registers((b1 ++ b2).toDF("v"), Nil, "v", 2048, 3)))

    // fresh checkpoint, same statePath -> incarnation reset
    val s3 = MemoryStream[String](spark)
    s3.addData("solo1", "solo2")
    val q3 = run(s3, tmpDir("sbloom-r-ckpt2"))
    try q3.processAllAvailable() finally q3.stop()
    assert(regSet(StreamingBloom.currentRegisters(spark, statePath).get) ===
      regSet(Bloom.registers(
        Seq("solo1", "solo2").toDF("v"), Nil, "v", 2048, 3)))
  }

  test("attachFilter: frozen-filter probe flags every member (no false negatives), batch after batch") {
    val members = (0 until 300).map(i => s"blocked_$i")
    val regs = Bloom.registers(members.toDF("v"), Nil, "v", 1 << 16, 3)
    val stream = MemoryStream[(Int, String)](spark)
    val flagged = scala.collection.mutable.Map.empty[Long, Map[Int, Boolean]]
    val at = StreamingBloom.attachFilter(
      stream.toDF().toDF("id", "v"), regs, Nil, Seq("id"), "v",
      mBits = 1 << 16, k = 3, tmpDir("sbloom-f-ckpt")) { (out, id) =>
      flagged(id) = out.collect()
        .map(r => r.getAs[Int]("id") -> r.getAs[Boolean]("might_contain")).toMap
    }
    try {
      stream.addData((1, "blocked_7"), (2, "clean_a"), (3, "blocked_250"))
      at.query.processAllAvailable()
      stream.addData((4, "clean_b"), (5, "blocked_0"))
      at.query.processAllAvailable()
    } finally { at.query.stop(); at.unpersistArtifacts() }
    assert(flagged(0L) === Map(1 -> true, 2 -> false, 3 -> true))
    assert(flagged(1L) === Map(4 -> false, 5 -> true))
  }
}
