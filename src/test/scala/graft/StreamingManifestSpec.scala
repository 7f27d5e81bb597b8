package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.streaming.StreamingManifest

/** Streaming pruning manifest: per-trigger file stats match the batch
  * fileStats expression row-for-row, the q88 prune estimators run
  * unchanged over the live manifest (and pruned scans stay EXACT), and
  * the replay/restart/incarnation discipline holds. */
class StreamingManifestSpec extends SparkSpec {

  import spark.implicits._

  private def rows(df: DataFrame): Set[(Long, Long, Option[Long], Option[Long], Long)] =
    df.collect().map(r => (
      r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      r.getLong(4))).toSet

  test("attach: manifest rows == per-file stats; prune decisions exact over " +
      "the live manifest; pruned scan loses no matching row") {
    val statePath = tmpDir("sman") + "/state"
    val stream = MemoryStream[(Long, Long)](spark)
    var last: Option[DataFrame] = None
    val q = StreamingManifest.attach(
      stream.toDF().toDF("id", "v"), Seq("v"), statePath,
      tmpDir("sman-ckpt")) { (man, _) => last = Some(man) }
    // three "files": v in [0,99], [100,199], [200,299]
    val waves = (0 until 3).map(w =>
      (0 until 100).map(i => ((w * 100 + i).toLong, (w * 100 + i).toLong)))
    try {
      waves.foreach { w => stream.addData(w: _*); q.processAllAvailable() }
      val man = StreamingManifest.currentManifest(spark, statePath).get
      assert(rows(man) === Set(
        (0L, 100L, Some(0L), Some(99L), 0L),
        (1L, 100L, Some(100L), Some(199L), 0L),
        (2L, 100L, Some(200L), Some(299L), 0L)))
      // the q88 estimators run unchanged on the streamed manifest
      val probed = Layout.pruneEqual(
        Layout.pruneRange(man, "v", lit(150L), lit(250L), "touch_range"),
        "v", lit(99L), "touch_eq")
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(5), r.getBoolean(6))).toMap
      assert(probed(0L) == ((false, true)))
      assert(probed(1L) == ((true, false)))
      assert(probed(2L) == ((true, false)))
      // pruning is conservative-exact: scanning ONLY surviving files
      // reproduces the full-scan answer
      val all = waves.flatten
      val survivors = probed.filter(_._2._1).keySet
      val pruned = all.zipWithIndex
        .filter { case (_, i) => survivors.contains((i / 100).toLong) }
        .map(_._1).filter { case (_, v) => v >= 150L && v < 250L }
      val full = all.filter { case (_, v) => v >= 150L && v < 250L }
      assert(pruned.toSet === full.toSet && full.nonEmpty)
    } finally q.stop()
  }

  test("attach: all-null stat column -> null bounds + full null count; range " +
      "probe skips the file, IS-NULL semantics keep it") {
    val statePath = tmpDir("sman-n") + "/state"
    val stream = MemoryStream[(Long, java.lang.Long)](spark)
    val q = StreamingManifest.attach(
      stream.toDF().toDF("id", "v"), Seq("v"), statePath,
      tmpDir("sman-n-ckpt")) { (_, _) => () }
    try {
      stream.addData((1L, java.lang.Long.valueOf(5L)), (2L, null))
      q.processAllAvailable()
      stream.addData((3L, null), (4L, null))
      q.processAllAvailable()
      val man = StreamingManifest.currentManifest(spark, statePath).get
      assert(rows(man) === Set(
        (0L, 2L, Some(5L), Some(5L), 1L),
        (1L, 2L, None, None, 2L)))
      val probed = Layout.pruneRange(man, "v", lit(0L), lit(10L), "t")
        .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
      assert(probed(0L) && !probed(1L))
      // IS NULL keeps exactly the files with nulls
      val withNulls = man.filter(col("v_nulls") > 0L)
        .select("file_id").as[Long].collect().toSet
      assert(withNulls === Set(0L, 1L))
    } finally q.stop()
  }

  test("attach: restart continues the log without double-appending; a fresh " +
      "incarnation purges forward state") {
    val statePath = tmpDir("sman-r") + "/state"
    val ckpt = tmpDir("sman-r-ckpt")
    def run(stream: MemoryStream[(Long, Long)], checkpoint: String) =
      StreamingManifest.attach(
        stream.toDF().toDF("id", "v"), Seq("v"), statePath, checkpoint) {
        (_, _) => ()
      }
    val b1 = (0 until 50).map(i => (i.toLong, i.toLong))
    val b2 = (50 until 80).map(i => (i.toLong, i.toLong))
    val s1 = MemoryStream[(Long, Long)](spark)
    val q1 = run(s1, ckpt)
    try { s1.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()

    // same checkpoint -> batch 0 REPLAYS: its staging is rewritten, not
    // appended twice; batch 1 then adds exactly one more file row
    val s2 = MemoryStream[(Long, Long)](spark)
    s2.addData(b1: _*); s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try {
      q2.processAllAvailable()
      val man = StreamingManifest.currentManifest(spark, statePath).get
      assert(rows(man) === Set(
        (0L, 50L, Some(0L), Some(49L), 0L),
        (1L, 30L, Some(50L), Some(79L), 0L)))
    } finally q2.stop()

    // FRESH checkpoint -> ids restart at 0; stale forward stagings must go
    val s3 = MemoryStream[(Long, Long)](spark)
    val q3 = run(s3, tmpDir("sman-r-ckpt2"))
    try {
      s3.addData((0 until 10).map(i => (i.toLong, (1000 + i).toLong)): _*)
      q3.processAllAvailable()
      val man = StreamingManifest.currentManifest(spark, statePath).get
      assert(rows(man) === Set((0L, 10L, Some(1000L), Some(1009L), 0L)))
    } finally q3.stop()
  }
}
