package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.QDigest
import graft.streaming.StreamingQuantiles

/** Streaming q-digest sketch: per-trigger contract parity (count preserved
  * bit-exactly, size ≤ 3k, additive rank-slack bound vs the exact quantile
  * of everything seen), replay-determinism of the fold, restart
  * continuation, and incarnation-reset purging. Unlike StreamingHll the
  * fold is not bit-identical to a one-shot batch build (q-digest merge is
  * deterministic but not structurally associative) — the CONTRACT, not the
  * register layout, is what stream==batch parity means here. */
class StreamingQuantilesSpec extends SparkSpec {

  import spark.implicits._

  private val (lo, hi, bits, k) = (0.0, 1000.0, 10, 64)

  private def attach(
      stream: MemoryStream[(String, Double)], statePath: String, ckpt: String)(
      sink: (DataFrame, Long) => Unit) =
    StreamingQuantiles.attach(
      stream.toDF().toDF("g", "v"), Seq("g"), "v", lo, hi, bits, k,
      Seq("p50" -> 0.5), statePath, ckpt)(sink)

  /** |true rank of reported edge − target| against everything seen. */
  private def rankErr(seen: Seq[(String, Double)], est: DataFrame): Long = {
    val data = seen.toDF("g", "v")
    val row = data
      .join(broadcast(est.select(col("g"), col("p50_leaf"), col("n"))), "g")
      .groupBy("g")
      .agg(
        sum(when(QDigest.leafIndex(col("v"), lo, hi, bits) <=
          col("p50_leaf"), 1L).otherwise(0L)).as("tr"),
        ceil(lit(0.5) * max("n")).cast("long").as("r"))
      .head()
    math.abs(row.getAs[Long]("tr") - row.getAs[Long]("r"))
  }

  test("attach: per-trigger estimates satisfy the sketch contract over everything seen") {
    val statePath = tmpDir("sqd") + "/state"
    val stream = MemoryStream[(String, Double)](spark)
    val ests = scala.collection.mutable.Map.empty[Long, DataFrame]
    val q = attach(stream, statePath, tmpDir("sqd-ckpt")) { (est, id) =>
      ests(id) = est.cache()
    }
    val rnd = new scala.util.Random(12)
    val waves = (0 until 3).map(_ =>
      (0 until 4000).map(_ => ("g", rnd.nextDouble() * 1000.0)))
    try {
      waves.zipWithIndex.foreach { case (w, i) =>
        stream.addData(w: _*); q.processAllAvailable()
        val seen = waves.take(i + 1).flatten
        val est = ests(i.toLong)
        assert(est.head().getAs[Long]("n") == seen.size.toLong)
        val regs = StreamingQuantiles.currentRegisters(spark, statePath).get
        assert(regs.count() <= 3L * k)
        // additive slack: one build + one merge-recompress per trigger
        val slack = bits.toLong * (2 * (i + 1)) * (seen.size.toLong / k)
        val cellMax = seen.toDF("g", "v")
          .groupBy(QDigest.leafIndex(col("v"), lo, hi, bits)).count()
          .agg(max("count")).head().getLong(0)
        assert(rankErr(seen, est) <= slack + cellMax,
          s"trigger $i: rank err ${rankErr(seen, est)} > $slack + $cellMax")
      }
    } finally {
      q.stop(); ests.values.foreach(_.unpersist(blocking = false))
    }
  }

  test("attach: restart continues the fold deterministically; fresh incarnation purges") {
    val statePath = tmpDir("sqd-r") + "/state"
    val ckpt = tmpDir("sqd-r-ckpt")
    val out = scala.collection.mutable.Map.empty[Long, Long]
    def run(stream: MemoryStream[(String, Double)], checkpoint: String) =
      attach(stream, statePath, checkpoint) { (est, id) =>
        out(id) = est.head().getAs[Long]("n")
      }
    val b1 = (0 until 500).map(i => ("g", (i % 997).toDouble))
    val b2 = (0 until 300).map(i => ("g", (i * 3 % 997).toDouble))
    val s1 = MemoryStream[(String, Double)](spark)
    val q1 = run(s1, ckpt)
    try { s1.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()
    val regsAfter1 = StreamingQuantiles.currentRegisters(spark, statePath).get
      .orderBy("g", "_node").collect().toSeq

    // same checkpoint -> continuation: replayed rows land in a NEW batch id;
    // the count-sum contract makes double-apply visible immediately
    val s2 = MemoryStream[(String, Double)](spark)
    s2.addData(b1: _*)
    s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(out.maxBy(_._1)._2 == (b1.size + b2.size).toLong)

    // replay determinism: rebuilding trigger 1's staging from the same
    // (prefix, batch) pair must reproduce the identical register frame —
    // rerun a fresh stream over the same data through a fresh checkpoint
    val s4 = MemoryStream[(String, Double)](spark)
    s4.addData(b1: _*)
    val statePath2 = tmpDir("sqd-r2") + "/state"
    val q4 = StreamingQuantiles.attach(
      s4.toDF().toDF("g", "v"), Seq("g"), "v", lo, hi, bits, k,
      Seq("p50" -> 0.5), statePath2, tmpDir("sqd-r2-ckpt"))((_, _) => ())
    try q4.processAllAvailable() finally q4.stop()
    val regsReplay = StreamingQuantiles.currentRegisters(spark, statePath2).get
      .orderBy("g", "_node").collect().toSeq
    assert(regsReplay == regsAfter1)

    // fresh checkpoint, same statePath -> incarnation reset
    val s3 = MemoryStream[(String, Double)](spark)
    s3.addData(("g", 1.0), ("g", 2.0))
    val q3 = run(s3, tmpDir("sqd-r-ckpt2"))
    try q3.processAllAvailable() finally q3.stop()
    assert(out(0L) == 2L)
  }
}
