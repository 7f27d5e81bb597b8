package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSession
import graft.operators.{Similarity, TextAnalysis}
import graft.streaming.{StreamingBm25, StreamingSimilarity}

/** Ingest-attach soak for the remaining round-10 streaming additions
  * (→ SCALE.md): the self-extending IVF attach and the BM25 index
  * maintainer, driven for `triggers` triggers each, measuring per-trigger
  * wall trend as history grows and END-STATE parity with the chained batch
  * extension over the same rows.
  *
  * Expected shapes: the IVF trigger pays batch assignment + a probe whose
  * corpus side grows with history (scan-bound, the near-dup soak's
  * pattern); the BM25 trigger pays ONLY the batch's index build (no probe
  * in the attach), so its wall must stay flat at any history length. */
object IngestSoak {
  def main(args: Array[String]): Unit = {
    val base = args.lift(0).map(_.toInt).getOrElse(50000)
    val perTrigger = args.lift(1).map(_.toInt).getOrElse(500)
    val triggers = args.lift(2).map(_.toInt).getOrElse(24)
    val spark = GraftSession.build("local[32]", "graft-ingest-soak", 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- IVF self-extending attach ----
    val rng = new scala.util.Random(31)
    def vec(i: Long): (Long, Seq[Double]) =
      (i, Seq.tabulate(32)(d =>
        (if (d == (i % 8).toInt * 4) 1.0 else 0.0) + rng.nextGaussian() * 0.05))
    val baseVecs = (0L until base.toLong).map(vec)
    val ivf = Similarity.buildIvfIndexAuto(
      baseVecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nCells = 64).persisted()
    val ivfState = java.nio.file.Files.createTempDirectory("ivf-soak").toString + "/state"
    var nextV = 1000000L
    def vecBatch(): Seq[(Long, Seq[Double])] =
      (0 until perTrigger).map { _ => nextV += 1; vec(nextV) }
    val vStream = MemoryStream[(Long, Seq[Double])](spark)
    val vq = StreamingSimilarity.attachIvfSelfExtending(
      vStream.toDF().toDF("vec_id", "embedding"), ivf,
      "vec_id", "embedding", k = 5, nProbe = 4, ivfState,
      java.nio.file.Files.createTempDirectory("ivf-ckpt").toString) {
      (out, _) => out.write.format("noop").mode("overwrite").save()
    }
    var vBatches = Seq.empty[Seq[(Long, Seq[Double])]]
    val vWalls = try {
      (1 to triggers).map { t =>
        val b = vecBatch(); vBatches :+= b
        vStream.addData(b)
        val t0 = System.nanoTime()
        vq.processAllAvailable()
        val w = (System.nanoTime() - t0) / 1e9
        if (t % 8 == 0 || t == 1) println(f"[ingest-soak] ivf trigger $t%3d wall=$w%5.2f s")
        w
      }
    } finally vq.stop()
    // end-state parity: serving view == chained batch extension
    val cur = StreamingSimilarity.currentIvf(spark, ivf, ivfState)
    val chained = vBatches.foldLeft(ivf)((ix, b) =>
      Similarity.extendIvfIndex(ix, b.toDF("vec_id", "embedding")))
    val probeQ = Seq(vec(7777777L)).toDF("vec_id", "embedding")
    def top(ix: Similarity.IvfIndex) = Similarity.probeIvf(
        ix, probeQ, "vec_id", "embedding", k = 10, nProbe = 8,
        guardBroadcast = false)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ivfParity = top(cur) == top(chained)
    println(f"[ingest-soak] ivf: first-4 mean=${vWalls.take(4).sum / 4}%5.2f s " +
      f"last-4 mean=${vWalls.takeRight(4).sum / 4}%5.2f s parity_vs_batch_extend=$ivfParity")

    // ---- BM25 ingest attach ----
    def docRow(i: Long): (Long, String) = {
      val r = new scala.util.Random(i.toInt)
      (i, Seq.fill(40)(s"w${r.nextInt(30000)}").mkString(" "))
    }
    // scale the BM25 corpus with the same CLI knob as the IVF base
    // (2/5 ratio preserves the default 50k-vector / 20k-doc proportions)
    val baseDocs = (0L until (base.toLong * 2 / 5)).map(docRow)
    val bm = TextAnalysis.buildBm25Index(
      baseDocs.toDF("doc_id", "text"), "doc_id", "text").persisted()
    val bmState = java.nio.file.Files.createTempDirectory("bm-soak").toString + "/state"
    var nextD = 2000000L
    def docBatch(): Seq[(Long, String)] =
      (0 until perTrigger).map { _ => nextD += 1; docRow(nextD) }
    val dStream = MemoryStream[(Long, String)](spark)
    val dq = StreamingBm25.attachBm25Ingest(
      dStream.toDF().toDF("doc_id", "text"), bm, "text", bmState,
      java.nio.file.Files.createTempDirectory("bm-ckpt").toString)()
    var dBatches = Seq.empty[Seq[(Long, String)]]
    val dWalls = try {
      (1 to triggers).map { t =>
        val b = docBatch(); dBatches :+= b
        dStream.addData(b)
        val t0 = System.nanoTime()
        dq.processAllAvailable()
        val w = (System.nanoTime() - t0) / 1e9
        if (t % 8 == 0 || t == 1) println(f"[ingest-soak] bm25 trigger $t%3d wall=$w%5.2f s")
        w
      }
    } finally dq.stop()
    val curBm = StreamingBm25.currentBm25Index(spark, bm, bmState)
    val chainedBm = dBatches.foldLeft(bm)((ix, b) =>
      TextAnalysis.extendBm25Index(ix, b.toDF("doc_id", "text"), "text"))
    def bmTop(ix: TextAnalysis.Bm25Index) = TextAnalysis
      .probeBm25(ix, Seq("w17", "w4242"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val bmParity = bmTop(curBm) == bmTop(chainedBm)
    println(f"[ingest-soak] bm25: first-4 mean=${dWalls.take(4).sum / 4}%5.2f s " +
      f"last-4 mean=${dWalls.takeRight(4).sum / 4}%5.2f s parity_vs_batch_extend=$bmParity")
    spark.stop()
    if (!ivfParity || !bmParity) sys.exit(1)
  }
}
