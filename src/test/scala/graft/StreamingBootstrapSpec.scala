package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Experiment
import graft.streaming.StreamingBootstrap

/** Streaming Poisson bootstrap: streamed estimates == the batch operator
  * over the concatenation at every trigger (contract parity — both paths
  * 6dp-round before comparison), plus restart/incarnation discipline. */
class StreamingBootstrapSpec extends SparkSpec {

  import spark.implicits._

  private val R = 40

  private def batchCi(rows: Seq[(String, Double, Long)]): Set[String] =
    Experiment.poissonBootstrap(
      rows.toDF("g", "v", "id"), Seq("g"), "v", Seq("id"), R, "sbt")
      .collect().map(_.toString).toSet

  test("attach: streamed CI == batch operator over everything seen, every trigger") {
    val statePath = tmpDir("sboot") + "/state"
    val stream = MemoryStream[(String, Double, Long)](spark)
    val got = scala.collection.mutable.Map.empty[Long, Set[String]]
    val q = StreamingBootstrap.attach(
      stream.toDF().toDF("g", "v", "id"), Seq("g"), "v", Seq("id"), R,
      "sbt", statePath, tmpDir("sboot-ckpt")) { (est, id) =>
      got(id) = est.collect().map(_.toString).toSet
    }
    // two groups, deterministic pseudo-noise, ids disjoint across waves
    val waves = (0 until 3).map(w =>
      (0 until 400).map { i =>
        val id = (w * 1000 + i).toLong
        (if (i % 2 == 0) "a" else "b",
          100.0 * (w + 1) + math.sin(id * 12.9898) * 43758.5453 % 10, id)
      })
    try {
      waves.zipWithIndex.foreach { case (wv, i) =>
        stream.addData(wv: _*); q.processAllAvailable()
        assert(got(i.toLong) === batchCi(waves.take(i + 1).flatten),
          s"trigger $i diverged from the batch fold")
      }
      // the interval genuinely moved as the stream's distribution shifted
      assert(got(0L) !== got(2L))
    } finally q.stop()
  }

  test("attach: restart continues the fold; a fresh incarnation purges forward state") {
    val statePath = tmpDir("sboot-r") + "/state"
    val ckpt = tmpDir("sboot-r-ckpt")
    val got = scala.collection.mutable.Map.empty[Long, Set[String]]
    def run(stream: MemoryStream[(String, Double, Long)], checkpoint: String) =
      StreamingBootstrap.attach(
        stream.toDF().toDF("g", "v", "id"), Seq("g"), "v", Seq("id"), R,
        "sbt", statePath, checkpoint) { (est, id) =>
        got(id) = est.collect().map(_.toString).toSet
      }
    val b1 = (0 until 300).map(i => ("a", i.toDouble % 37, i.toLong))
    val b2 = (300 until 500).map(i => ("a", i.toDouble % 37, i.toLong))
    val s1 = MemoryStream[(String, Double, Long)](spark)
    val q1 = run(s1, ckpt)
    try { s1.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()
    assert(got(0L) === batchCi(b1))

    // same checkpoint -> batch 0 REPLAYS (rewrites its staging, no
    // double-add), then batch 1 folds b2 on top
    val s2 = MemoryStream[(String, Double, Long)](spark)
    s2.addData(b1: _*); s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try {
      q2.processAllAvailable()
      assert(got(1L) === batchCi(b1 ++ b2))
    } finally q2.stop()

    // fresh checkpoint -> ids restart at 0; forward stagings must purge
    val s3 = MemoryStream[(String, Double, Long)](spark)
    val q3 = run(s3, tmpDir("sboot-r-ckpt2"))
    try {
      val b3 = (0 until 100).map(i => ("a", i.toDouble, i.toLong))
      s3.addData(b3: _*)
      q3.processAllAvailable()
      assert(got(0L) === batchCi(b3))
    } finally q3.stop()
  }
}
