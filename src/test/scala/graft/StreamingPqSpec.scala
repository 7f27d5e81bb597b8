package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Pq
import graft.streaming.StreamingPq

/** Self-extending streaming PQ: a vector ingested in trigger 1 is
  * ADC-retrievable by a trigger-2 probe without a restart, with exact
  * parity against the batch encode+probe over the same state. */
class StreamingPqSpec extends SparkSpec {

  import spark.implicits._

  private def corners(n: Int, idBase: Long, a: Double, b: Double): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      val jit = (d: Int) => 0.01 * ((i * 7 + d * 3) % 5 - 2)
      (idBase + i, Seq.tabulate(8)(d => (if (d < 4) a else b) + jit(d)))
    }

  test("attach: trigger-1 ingests become retrievable in trigger 2; batch parity; restart-safe") {
    // base corpus: two opposite corners; codebook fit on it
    val base = (corners(30, 0L, 3.0, 3.0) ++ corners(30, 100L, -3.0, -3.0))
      .toDF("id", "v")
    val cb = Pq.fit(base, "id", "v", dims = 8, m = 2, k = 2, iters = 2)
    val baseCodes = Pq.encode(base, "id", "v", cb).persist()
    baseCodes.count()

    val statePath = tmpDir("spq") + "/state"
    val ckpt = tmpDir("spq-ckpt")
    val out = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long, Double)]]
    def run(stream: MemoryStream[(Long, Seq[Double])], checkpoint: String) =
      StreamingPq.attachSelfExtending(
        stream.toDF().toDF("qid", "qv"), cb, baseCodes,
        "id", "qid", "qv", k = 5, statePath, checkpoint) { (res, id) =>
        out(id) = res.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
          .map { case (q, rank, hit) => (q, rank, hit.toDouble) }
      }

    // trigger 1: vectors in a corner the BASE has never seen (+3, -3)
    val b1 = corners(10, 500L, 3.0, -3.0)
    // trigger 2: queries in that same new corner — their nearest ADC
    // neighbors must include trigger-1 ids (cell pattern (+half, -half))
    val b2 = corners(3, 900L, 3.0, -3.0)
    val s1 = MemoryStream[(Long, Seq[Double])](spark)
    val q1 = run(s1, ckpt)
    try {
      s1.addData(b1: _*); q1.processAllAvailable()
      s1.addData(b2: _*); q1.processAllAvailable()
    } finally q1.stop()

    val hits2 = out(1L).map { case (_, _, hit) => hit.toLong }.toSet
    assert(hits2.nonEmpty)
    // every trigger-2 hit is a trigger-1 stream vector: the new corner's
    // code word (cell of +half, cell of -half) matches no base vector,
    // and ADC distance to the own-corner codes is minimal
    assert(hits2.forall(h => h >= 500L && h < 510L), hits2)

    // batch parity: the streamed probe equals the batch ADC probe over
    // base ∪ trigger-1 codes (strictly-below-id state)
    val batchState = baseCodes.unionByName(
      Pq.encode(b1.toDF("id", "v"), "id", "v", cb))
    val expect = Pq.adcTopK(
      cb, batchState, "id", b2.toDF("qid", "qv"), "qid", "qv", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      .map { case (q, rank, hit) => (q, rank, hit.toDouble) }
    assert(out(1L) === expect)

    // restart: replayed source offsets do not double-stage; the committed
    // state still holds exactly base ∪ b1 ∪ b2 codes
    val s2 = MemoryStream[(Long, Seq[Double])](spark)
    s2.addData(b1: _*); s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val state = StreamingPq.currentCodes(spark, statePath, baseCodes)
    assert(state.count() === 60 + 10 + 3)
    assert(state.select("id").distinct().count() === 73)
    baseCodes.unpersist(blocking = false)
  }
}
