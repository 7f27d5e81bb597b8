package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.StreamingHeaps

/** Streaming Heaps-law growth: the per-trigger cumulative curve equals the
  * batch t50 operator's totals over the concatenated corpus after every
  * trigger, word deltas hold each type once, and a fresh incarnation
  * restarts the curve. */
class StreamingHeapsSpec extends SparkSpec {

  import spark.implicits._

  private def mkDocs(ids: Range, seed: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    ids.map(i =>
      (i.toLong, (0 until 10).map(_ => "w" + rng.nextInt(40)).mkString(" ")))
  }

  test("attach: per-trigger cumulative totals == batch t50 over everything seen") {
    val statePath = tmpDir("sheaps") + "/state"
    val got = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long, Double)]
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingHeaps.attach(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      statePath, tmpDir("sheaps-ckpt")) { (stats, id) =>
      val r = stats.head()
      got(id) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_new_types"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("cum_types"),
        r.getAs[Double]("ttr"))
    }
    val waves = Seq(
      mkDocs(0 until 10, 1),
      mkDocs(10 until 20, 2),
      mkDocs(20 until 30, 1)) // replayed vocab: few-to-no new types
    try {
      var seen = Seq.empty[(Long, String)]
      for ((w, i) <- waves.zipWithIndex) {
        stream.addData(w: _*); q.processAllAvailable()
        seen ++= w
        // batch t50 totals at the corpus end
        val last = TextAnalysis.heapsGrowth(
            seen.toDF("doc_id", "text"), "doc_id", "text")
          .orderBy(col("doc_id").desc).limit(1).head()
        val (bt, bn, ct, cy, ttr) = got(i.toLong)
        assert(ct === last.getAs[Long]("cum_tokens"), s"wave $i")
        assert(cy === last.getAs[Long]("cum_types"), s"wave $i")
        assert(ttr === last.getAs[Double]("ttr"), s"wave $i")
        assert(bt === w.size.toLong * 10)
        // batch increments reconcile with the curve
        if (i > 0) {
          val prev = got(i.toLong - 1)
          assert(ct === prev._3 + bt && cy === prev._4 + bn)
        }
      }
      // wave 3 reuses wave 1's seed: its vocab is already in the store
      assert(got(2L)._2 === 0L)
      // the totals audit view matches the last trigger
      val cur = StreamingHeaps.currentTotals(spark, statePath).get.head()
      assert(cur.getAs[Long]("cum_tokens") === got(2L)._3)
    } finally q.stop()
  }

  test("attach: fresh incarnation restarts the curve") {
    val statePath = tmpDir("sheaps-r") + "/state"
    def run(stream: MemoryStream[(Long, String)], ckpt: String) =
      StreamingHeaps.attach(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
        statePath, ckpt) { (_, _) => () }
    val s1 = MemoryStream[(Long, String)](spark)
    val q1 = run(s1, tmpDir("sheaps-r-c1"))
    try {
      s1.addData(mkDocs(0 until 6, 5): _*); q1.processAllAvailable()
    } finally q1.stop()
    val s2 = MemoryStream[(Long, String)](spark)
    val q2 = run(s2, tmpDir("sheaps-r-c2"))
    try {
      val w = mkDocs(0 until 3, 6)
      s2.addData(w: _*); q2.processAllAvailable()
      val cur = StreamingHeaps.currentTotals(spark, statePath).get.head()
      assert(cur.getAs[Long]("cum_tokens") === 30L) // 3 docs x 10 tokens
      val types = w.toDF("doc_id", "text")
        .select(explode(TextAnalysis.tokens($"text")).as("_w"))
        .where(length($"_w") > 0).distinct().count()
      assert(cur.getAs[Long]("cum_types") === types)
    } finally q2.stop()
  }
}
