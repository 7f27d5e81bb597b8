package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingMg

/** Streaming Misra-Gries: bounded state across triggers, bracket contract
  * vs exact counts of everything seen, replay determinism, and
  * incarnation-reset purging. */
class StreamingMgSpec extends SparkSpec {

  import spark.implicits._

  private val k = 8

  test("attach: state stays ≤ k+1 rows; brackets contain true counts of everything seen") {
    val statePath = tmpDir("smg") + "/state"
    val stream = MemoryStream[(String, String)](spark)
    val ests = scala.collection.mutable.Map.empty[Long, DataFrame]
    val q = StreamingMg.attach(
      stream.toDF().toDF("g", "item"), Seq("g"), "item", k,
      statePath, tmpDir("smg-ckpt")) { (est, id) => ests(id) = est.cache() }
    val rnd = new scala.util.Random(8)
    val waves = (0 until 3).map(_ => (0 until 3000).map { _ =>
      val u = rnd.nextDouble()
      ("g", s"w${(100 * u * u * u).toInt}")
    })
    try {
      waves.zipWithIndex.foreach { case (w, i) =>
        stream.addData(w: _*); q.processAllAvailable()
        val seen = waves.take(i + 1).flatten
        val st = StreamingMg.currentState(spark, statePath).get
        assert(st.count() <= (k + 1).toLong, "state exceeded k+1 rows")
        assert(st.where(col("_item").isNull).head().getAs[Long]("_n") ==
          seen.size.toLong)
        val truth = seen.toDF("g", "item")
          .groupBy("item").agg(count(lit(1)).as("true_c"))
        val bad = ests(i.toLong).join(truth, "item")
          .where(col("true_c") < col("w_min") || col("true_c") > col("w_max"))
          .count()
        assert(bad == 0, s"trigger $i: $bad items outside bracket")
      }
    } finally {
      q.stop(); ests.values.foreach(_.unpersist(blocking = false))
    }
  }

  test("attach: replay rebuilds identical state; fresh incarnation purges") {
    val statePath = tmpDir("smg-r") + "/state"
    val ckpt = tmpDir("smg-r-ckpt")
    def run(stream: MemoryStream[(String, String)], sp: String, cp: String) =
      StreamingMg.attach(
        stream.toDF().toDF("g", "item"), Seq("g"), "item", k, sp, cp)((_, _) => ())
    val b1 = (0 until 2000).map(i => ("g", s"w${i % 37}"))
    val s1 = MemoryStream[(String, String)](spark)
    val q1 = run(s1, statePath, ckpt)
    try { s1.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()
    val after1 = StreamingMg.currentState(spark, statePath).get
      .orderBy("_item").collect().toSeq

    val s2 = MemoryStream[(String, String)](spark)
    s2.addData(b1: _*)
    val statePath2 = tmpDir("smg-r2") + "/state"
    val q2 = run(s2, statePath2, tmpDir("smg-r2-ckpt"))
    try q2.processAllAvailable() finally q2.stop()
    val replay = StreamingMg.currentState(spark, statePath2).get
      .orderBy("_item").collect().toSeq
    assert(replay == after1)

    // fresh checkpoint, same statePath -> incarnation reset
    val s3 = MemoryStream[(String, String)](spark)
    s3.addData(("g", "solo"), ("g", "solo"))
    val q3 = run(s3, statePath, tmpDir("smg-r-ckpt2"))
    try q3.processAllAvailable() finally q3.stop()
    val fresh = StreamingMg.currentState(spark, statePath).get
    assert(fresh.where(col("_item").isNull).head().getAs[Long]("_n") == 2L)
  }
}
