package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Kmv
import graft.streaming.StreamingKmv

/** Streaming KMV sketch: exact stream==batch parity (bottom-k of a union
  * is idempotent), restart continuation, incarnation reset — and the
  * payoff: an ingest-time sketch intersecting a foreign store's. */
class StreamingKmvSpec extends SparkSpec {

  import spark.implicits._

  private def hashes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq.sorted

  test("attach: per-trigger sketch equals the batch sketch over everything seen; intersects a store") {
    val statePath = tmpDir("skmv") + "/state"
    val stream = MemoryStream[String](spark)
    val seen = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    val q = StreamingKmv.attach(
      stream.toDF().toDF("v"), Nil, "v", k = 128,
      statePath, tmpDir("skmv-ckpt")) { (sk, id) =>
      seen(id) = hashes(sk)
    }
    val b1 = (0 until 3000).map(i => s"u_$i")
    val b2 = (2000 until 6000).map(i => s"u_$i") // overlaps b1
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(seen(0L) === hashes(Kmv.sketch(b1.toDF("v"), Nil, "v", 128)))
    // overlap folds idempotently: stream == one batch sketch over b1 ∪ b2
    assert(seen(1L) === hashes(
      Kmv.sketch((b1 ++ b2).toDF("v"), Nil, "v", 128)))

    // the ingest-time payoff: intersect the live sketch with a separate
    // store's sketch, estimate tracks the true overlap (0..6000 ∩
    // 4000..9000 = 2000)
    val store = Kmv.sketch(
      (4000 until 9000).map(i => s"u_$i").toDF("v"), Nil, "v", 128)
    val live = StreamingKmv.currentSketch(spark, statePath).get
    val est = Kmv.intersectEstimate(live, store, Nil, 128)
      .collect().head.getDouble(0)
    assert(math.abs(est - 2000) / 2000.0 < 0.4, est)
  }

  test("attach: restart continues the fold; a fresh incarnation purges prior state") {
    val statePath = tmpDir("skmv-r") + "/state"
    val ckpt = tmpDir("skmv-r-ckpt")
    val out = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    def run(stream: MemoryStream[String], checkpoint: String) =
      StreamingKmv.attach(
        stream.toDF().toDF("v"), Nil, "v", k = 64,
        statePath, checkpoint) { (sk, id) => out(id) = hashes(sk) }

    val b1 = (0 until 800).map(i => s"x_$i")
    val b2 = (800 until 1200).map(i => s"x_$i")
    val s1 = MemoryStream[String](spark)
    val q1 = run(s1, ckpt)
    try { s1.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()

    val s2 = MemoryStream[String](spark)
    s2.addData(b1: _*)
    s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(out.maxBy(_._1)._2 === hashes(
      Kmv.sketch((b1 ++ b2).toDF("v"), Nil, "v", 64)))

    val s3 = MemoryStream[String](spark)
    s3.addData("solo_a", "solo_b")
    val q3 = run(s3, tmpDir("skmv-r-ckpt2"))
    try q3.processAllAvailable() finally q3.stop()
    assert(out(0L) === hashes(Kmv.sketch(
      Seq("solo_a", "solo_b").toDF("v"), Nil, "v", 64)))
  }
}
