package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextAnalysis
import graft.streaming.StreamingNovelty

/** Streaming n-gram novelty: per-trigger output == the batch t49 operator
  * over the concatenated corpus (docs arriving in id order — the monitor's
  * documented contract), gram-store deltas hold only NEW grams, and
  * restart/incarnation discipline. */
class StreamingNoveltySpec extends SparkSpec {

  import spark.implicits._

  private type NovRow = (Long, Long, Long, Option[Double])

  private def rows(df: DataFrame): Set[NovRow] =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSet

  private def mkDocs(ids: Range, seed: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    ids.map(i =>
      (i.toLong, (0 until 12).map(_ => "w" + rng.nextInt(15)).mkString(" ")))
  }

  test("attach: streamed per-trigger novelty == batch t49 over everything seen") {
    val statePath = tmpDir("snov") + "/state"
    val got = scala.collection.mutable.Map.empty[Long, Set[NovRow]]
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingNovelty.attach(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", 3,
      statePath, tmpDir("snov-ckpt")) { (nov, id) => got(id) = rows(nov) }
    // overlapping vocab across waves; wave 2 carries a null text and a
    // gram-free short doc; wave 3 repeats wave-1 phrases (novelty sinks)
    val w1 = mkDocs(0 until 8, 11)
    val w2 = mkDocs(8 until 14, 11) ++ // same seed -> heavy overlap with w1
      Seq((14L, null.asInstanceOf[String]), (15L, "w1 w2"))
    val w3 = w1.map { case (i, t) => (i + 16L, t) } // exact replays: 0 novel
    try {
      var seen = Seq.empty[(Long, String)]
      for ((w, i) <- Seq(w1, w2, w3).zipWithIndex) {
        stream.addData(w: _*); q.processAllAvailable()
        seen ++= w
        val batchIds = w.map(_._1).toSet
        val expected = rows(
          TextAnalysis.ngramNovelty(seen.toDF("doc_id", "text"),
            "doc_id", "text", 3)).filter(r => batchIds(r._1))
        assert(got(i.toLong) === expected, s"wave $i")
      }
      // wave 3 is an exact replay of wave 1: zero novel grams anywhere
      assert(got(2L).forall(_._3 == 0L))
      // the store holds each gram exactly once (deltas are disjoint)
      val store = StreamingNovelty.currentGrams(spark, statePath).get
      assert(store.count() === store.distinct().count())
      // and equals the batch corpus's distinct grams
      val batchGrams = seen.toDF("doc_id", "text")
        .where($"text".isNotNull)
        .select(org.apache.spark.sql.functions.explode(
          TextAnalysis.tokenNgrams($"text", 3)).as("_g"))
        .distinct()
      assert(store.count() === batchGrams.count())
    } finally q.stop()
  }

  test("attach: fresh incarnation purges forward gram state") {
    val statePath = tmpDir("snov-r") + "/state"
    def run(stream: MemoryStream[(Long, String)], ckpt: String) =
      StreamingNovelty.attach(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text", 3,
        statePath, ckpt) { (_, _) => () }
    val s1 = MemoryStream[(Long, String)](spark)
    val q1 = run(s1, tmpDir("snov-r-c1"))
    try {
      s1.addData(mkDocs(0 until 5, 3): _*); q1.processAllAvailable()
      s1.addData(mkDocs(5 until 9, 4): _*); q1.processAllAvailable()
    } finally q1.stop()
    // fresh checkpoint -> ids restart at 0; the old deltas must not leak
    // into the new incarnation's store
    val s2 = MemoryStream[(Long, String)](spark)
    val q2 = run(s2, tmpDir("snov-r-c2"))
    try {
      val w = mkDocs(0 until 4, 9)
      s2.addData(w: _*); q2.processAllAvailable()
      val store = StreamingNovelty.currentGrams(spark, statePath).get
      val expect = w.toDF("doc_id", "text")
        .select(org.apache.spark.sql.functions.explode(
          TextAnalysis.tokenNgrams($"text", 3)).as("_g")).distinct()
      assert(store.count() === expect.count())
    } finally q2.stop()
  }
}
