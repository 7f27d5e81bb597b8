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

  test("compact: live table repacks, manifest + bloom sidecars rewritten, " +
      "pruned reads stay exact, the resumed stream appends on top") {
    import graft.sources.{EqualProbe, PrunedScan, RangeProbe}
    val base = tmpDir("sman-c")
    val statePath = s"$base/state"
    val dataDir = s"$base/data"
    val ckpt = s"$base/ckpt"
    val (mBits, k) = (4096, 4)
    def run(stream: MemoryStream[(Long, Long)]) =
      StreamingManifest.attach(
        stream.toDF().toDF("v", "w"), Seq("v", "w"), statePath, ckpt,
        bloomCols = Seq(("w", mBits, k))) { (_, _) => () }
    // 6 tiny "files": v in [0,599), w uncorrelated
    val s1 = MemoryStream[(Long, Long)](spark)
    val waves = (0 until 6).map(wv =>
      (0 until 100).map(i => ((wv * 100 + i).toLong,
        ((wv * 100 + i) * 7919L % 600L))))
    val q1 = run(s1)
    try {
      waves.zipWithIndex.foreach { case (w, id) =>
        s1.addData(w: _*); q1.processAllAvailable()
        w.toDF("v", "w").coalesce(1)
          .write.mode("overwrite").parquet(s"$dataDir/file_id=$id")
      }
    } finally q1.stop()
    val all = waves.flatten
    def answers(probes: Seq[graft.sources.FileProbe],
        rowPred: org.apache.spark.sql.Column) = {
      val df = PrunedScan.prunedParquetLive(spark, dataDir, statePath,
        probes, Map("w" -> (mBits, k))).get.where(rowPred)
      (df.collect().map(_.getAs[Long]("v")).toSet, PrunedScan.filesRead(df))
    }
    val rProbe = Seq(RangeProbe("v", lit(150L), lit(450L)))
    val rPred = col("v") >= 150L && col("v") < 450L
    val (preRows, preFiles) = answers(rProbe, rPred)
    assert(preRows === all.filter(t => t._1 >= 150 && t._1 < 450).map(_._1).toSet)
    assert(preFiles === 4L) // files 1..4

    // compact 6 files -> ~2 (sorted by v so range pruning survives)
    val st = StreamingManifest.compact(spark, dataDir, statePath,
      Seq("v", "w"), targetFileBytes = 3L * 1024, sortCol = Some("v"),
      bloomCols = Seq(("w", mBits, k)))
    assert(st.nFilesIn === 6L && st.nFilesOut < 6L && st.nFilesOut >= 1L)
    // old dirs are gone; the manifest lists only >= 2^40 ids
    val man = StreamingManifest.currentManifest(spark, statePath).get
    val ids = man.select(col("file_id").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(ids.forall(_ >= (1L << 40)) && ids.size.toLong === st.nFilesOut)
    assert(!new java.io.File(s"$dataDir/file_id=0").exists())

    // range pruning still exact, still strictly pruning when nFilesOut > 1
    val (postRows, postFiles) = answers(rProbe, rPred)
    assert(postRows === preRows)
    assert(postFiles <= st.nFilesOut)
    // bloom equality probing still exact through the rewritten sidecar
    val probeW = all.head._2
    val (eqRows, _) = answers(Seq(EqualProbe("w", lit(probeW))),
      col("w") === probeW)
    assert(eqRows === all.filter(_._2 == probeW).map(_._1).toSet)

    // the resumed stream appends on top of the compacted prefix
    val s2 = MemoryStream[(Long, Long)](spark)
    waves.foreach(w => s2.addData(w: _*)) // replays commit nothing new
    s2.addData((600 until 700).map(i => (i.toLong, (i * 7919L) % 600L)): _*)
    val q2 = run(s2)
    try q2.processAllAvailable() finally q2.stop()
    (600 until 700).map(i => (i.toLong, (i * 7919L) % 600L))
      .toDF("v", "w").coalesce(1)
      .write.mode("overwrite").parquet(s"$dataDir/file_id=6")
    val man2 = StreamingManifest.currentManifest(spark, statePath).get
    assert(man2.count() === st.nFilesOut + 1L)
    val (tailRows, _) = answers(Seq(RangeProbe("v", lit(600L), lit(700L))),
      col("v") >= 600L && col("v") < 700L)
    assert(tailRows === (600L until 700L).toSet)
  }

  test("mgKeys: per-file MG sidecar maintained per trigger — zero-pass " +
      "routing over the LIVE table, exact through compaction and publish") {
    import graft.operators.{Mg, SkewJoin}
    import graft.sources.GraftTable
    val base = tmpDir("sman-mg")
    val statePath = s"$base/state"
    val dataDir = s"$base/data"
    // planted skew: 1/3 of every wave lands on key -1
    def keyOf(i: Long): Long = if (i % 3 == 0) -1L else i % 50
    val waves = (0 until 3).map(wv =>
      (0 until 100).map(i => ((wv * 100 + i).toLong,
        keyOf((wv * 100 + i).toLong))))
    val s1 = MemoryStream[(Long, Long)](spark)
    val q1 = StreamingManifest.attach(
      s1.toDF().toDF("v", "k"), Seq("v"), statePath, s"$base/ckpt",
      mgKeys = Seq((Seq("k"), 16))) { (_, _) => () }
    try {
      waves.zipWithIndex.foreach { case (w, id) =>
        s1.addData(w: _*); q1.processAllAvailable()
        w.toDF("v", "k").coalesce(1)
          .write.mode("overwrite").parquet(s"$dataDir/file_id=$id")
      }
    } finally q1.stop()
    // per-file parity: the staged rows for batch 1 equal the batch fold
    val perFile = StreamingManifest.currentMg(spark, statePath, Seq("k")).get
    def mgRows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(mgRows(perFile.where(col("file_id") === 1L)) === mgRows(
      Mg.summarize(
        waves(1).toDF("v", "k")
          .withColumn("file_id", lit(1L))
          .withColumn("_sj_key", SkewJoin.encodedKey(Seq("k"))),
        Seq("file_id"), "_sj_key", 16)))
    // zero-pass routing over the live state: -1 holds 1/3 ⇒ salted
    def route(): graft.operators.JoinDecision = SkewJoin.decide(
      StreamingManifest.currentKeyFreq(spark, statePath, Seq("k"), 16).get,
      Seq(51L).toDF("n"), broadcastRowLimit = 10L, skewShare = 0.15,
      nSalts = 4)
    val d1 = route()
    assert(d1.route === "salted" && d1.bigRows === 300L)
    // compaction re-derives the sidecar; scoped merge sees each key ONCE
    StreamingManifest.compact(spark, dataDir, statePath, Seq("v"),
      targetFileBytes = 3L * 1024, sortCol = Some("v"),
      mgKeys = Seq((Seq("k"), 16)))
    val d2 = route()
    assert(d2.route === "salted" && d2.bigRows === 300L)
    // publish: a path-only session routes from the persisted sidecar
    GraftTable.publishLive(spark, dataDir, statePath,
      mgKeys = Seq((Seq("k"), 16)))
    val mg = GraftTable.keyFreqSummary(spark, dataDir, Seq("k"))
    val d3 = SkewJoin.decide(mg, Seq(51L).toDF("n"),
      broadcastRowLimit = 10L, skewShare = 0.15, nSalts = 4)
    assert(d3.route === "salted" && d3.bigRows === 300L)
  }
}
