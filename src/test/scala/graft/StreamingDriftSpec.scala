package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Profiling
import graft.streaming.StreamingDrift

/** Ingest-time JSD drift monitor: per-trigger score equals the batch
  * operator on the same rows, an on-mix batch scores ~0, a shifted batch
  * scores high. */
class StreamingDriftSpec extends SparkSpec {

  test("attachJsd: per-batch JSD vs frozen reference == batch jsDivergence; shift detected") {
    import spark.implicits._
    // frozen reference mix: 80% en, 20% de
    val reference = (Seq.fill(80)("en") ++ Seq.fill(20)("de")).toDF("lang")
    val stream = MemoryStream[String](spark)
    val df = stream.toDF().toDF("lang")
    val seen = scala.collection.mutable.Map[Long, (Long, Long, Long, Double)]()
    val q = StreamingDrift.attachJsd(df, reference, "lang", tmpDir("sd-ckpt")) {
      (out, id) =>
        val r = out.head()
        seen.synchronized {
          seen(id) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
        }
    }
    try {
      // trigger 0: the reference mix itself -> jsd 0
      val onMix = Seq.fill(8)("en") ++ Seq.fill(2)("de")
      stream.addData(onMix: _*)
      q.processAllAvailable()
      // trigger 1: a shifted feed (all-new language)
      val shifted = Seq.fill(10)("zh")
      stream.addData(shifted: _*)
      q.processAllAvailable()
      val b0 = seen.synchronized(seen(0L))
      val b1 = seen.synchronized(seen(1L))
      assert(b0 == ((10L, 100L, 2L, 0.0)), s"on-mix batch must score 0: $b0")
      assert(b1._4 == 1.0, s"disjoint support is the full bit: $b1")
      // parity with the batch operator over trigger-1's rows
      val batchEq = Profiling
        .jsDivergence(shifted.toDF("lang"), reference, "lang").head()
      assert((b1._1, b1._2, b1._3, b1._4) ==
        ((batchEq.getLong(0), batchEq.getLong(1), batchEq.getLong(2),
          batchEq.getDouble(3))))
    } finally q.stop()
  }

  test("attachOov: per-batch OOV == batch operator; drifted feed scores high") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val vocab = graft.operators.TextAnalysis.vocabulary(
      Seq("the cat sat", "the cat ran", "the dog ran").toDF("text"),
      "text", minCount = 2)
    val stream = MemoryStream[(Long, String)](spark)
    val df = stream.toDF().toDF("doc_id", "text")
    val seen = scala.collection.mutable.Map[Long, Map[Long, (Long, Long, Double)]]()
    val q = StreamingDrift.attachOov(df, "doc_id", "text", vocab,
      tmpDir("oov-ckpt")) { (out, id) =>
      val rows = out.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      seen.synchronized { seen(id) = rows }
    }
    try {
      stream.addData((1L, "the cat ran"), (2L, "zebra quark flux"))
      q.processAllAvailable()
      val b0 = seen.synchronized(seen(0L))
      assert(b0(1L) == ((3L, 0L, 0.0)))
      assert(b0(2L) == ((3L, 3L, 1.0)), s"drifted doc must score 1.0: $b0")
      // parity with the batch operator over the same rows
      val batchEq = graft.operators.TextAnalysis.oovRate(
        Seq((1L, "the cat ran"), (2L, "zebra quark flux")).toDF("doc_id", "text"),
        "doc_id", "text", vocab)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(b0 == batchEq)
    } finally q.stop()
  }
}
