package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Similarity
import graft.streaming.StreamingEval

/** Streaming ranking-quality monitor: per-trigger scores equal the batch
  * operator on the same rows (stateless frozen-judgment parity), and a
  * planted ordering regression between triggers moves the metrics the
  * right way while recall-style hit counts stay blind to it. */
class StreamingEvalSpec extends SparkSpec {

  import spark.implicits._

  test("attach: per-trigger batch parity; an ordering regression is visible, hit counts are not") {
    val judgments = Seq(
      ("q1", "good", 2), ("q1", "ok", 1)).toDF("q", "doc", "rel")
    val stream = MemoryStream[(String, String, Int)](spark)
    val seen = scala.collection.mutable.Map.empty[Long, Map[String, Double]]
    val query = StreamingEval.attach(
      stream.toDF().toDF("q", "doc", "rank"), judgments,
      "q", "doc", "rank", "rel", k = 3, tmpDir("seval-ckpt")) { (df, id) =>
      seen(id) = df.collect().map(r =>
        "ndcg" -> r.getAs[Double]("ndcg_at_3")).toMap ++
        df.collect().map(r => "mrr" -> r.getAs[Double]("mrr_at_3")).toMap
    }
    try {
      // trigger 0: ideal ordering -> ndcg 1
      val w0 = Seq(("q1", "good", 1), ("q1", "ok", 2), ("q1", "junk", 3))
      stream.addData(w0: _*)
      query.processAllAvailable()
      assert(seen(0L)("ndcg") === 1.0 && seen(0L)("mrr") === 1.0)
      // trigger 1: same HIT SET, degraded ordering -> ndcg/mrr drop while
      // a recall-style overlap count would be identical
      val w1 = Seq(("q1", "junk", 1), ("q1", "ok", 2), ("q1", "good", 3))
      stream.addData(w1: _*)
      query.processAllAvailable()
      assert(seen(1L)("ndcg") < 1.0)
      assert(seen(1L)("mrr") === 0.5)
      // parity: each trigger equals the batch operator on the same rows
      def batch(rows: Seq[(String, String, Int)]): Map[String, Double] = {
        val r = Similarity.rankingMetrics(
          rows.toDF("q", "doc", "rank"), judgments,
          "q", "doc", "rank", "rel", 3).head()
        Map("ndcg" -> r.getAs[Double]("ndcg_at_3"),
          "mrr" -> r.getAs[Double]("mrr_at_3"))
      }
      assert(seen(0L) === batch(w0))
      assert(seen(1L) === batch(w1))
    } finally query.stop()
  }
}
