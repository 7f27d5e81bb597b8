package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, PrunedScan, Sources}

/** Self-describing table format (round-16 verdict task 1): write/adopt
  * persist the pruning manifest + Bloom sidecars + shapes under
  * `<dir>/_graft_manifest/`, and `Sources.graftTable(spark, dir)` rebuilds
  * the transparently-pruned frame FROM THE PATH ALONE — write→reopen
  * parity, fail-loud staleness, and sidecar invisibility to plain scans
  * are the pins. */
class GraftTableSpec extends SparkSpec {

  import spark.implicits._

  // v sorted into files; w uncorrelated (Bloom territory)
  private def table: DataFrame =
    (0 until 400).map(i =>
      (i.toLong, (i.toLong * 7919L) % 400L)).toDF("v", "w")

  test("write → open from the path alone: plain .where prunes (numFiles == " +
      "survivor count), answers match the stock reader, schema identical") {
    val dir = tmpDir("gt") + "/t"
    GraftTable.write(spark, table, Seq(col("v").asc), 8, dir, Seq("v", "w"),
      bloomCols = Seq(("w", 4096, 4)))
    // nothing handed over: the open reads only persisted state
    val t = Sources.graftTable(spark, dir)
    val plain = spark.read.option("basePath", dir).parquet(dir)
    assert(t.schema === plain.schema)
    // range predicate on the sort column: v∈[120,260) touches files 2..5
    val q = t.where(col("v") >= 120L && col("v") < 260L)
    assert(q.collect().map(_.getAs[Long]("v")).toSet ===
      (120L until 260L).toSet)
    assert(PrunedScan.filesRead(q) === 4L)
    // equality on the UNSORTED column: the persisted Bloom sidecar prunes
    // below the min/max-only count (w's min/max span ~every file)
    val probeW = (5L * 7919L) % 400L
    val eq = t.where(col("w") === probeW)
    assert(eq.collect().map(_.getAs[Long]("v")).toSet ===
      (0 until 400).filter(i => (i * 7919L) % 400L == probeW)
        .map(_.toLong).toSet)
    assert(PrunedScan.filesRead(eq) < 8L)
    // the sidecar is invisible to a plain scan of the same dir
    assert(plain.count() === 400L)
    assert(plain.columns.toSet === Set("v", "w", "file_id"))
  }

  test("staleness is fail-loud in every direction: a unit added, removed, " +
      "or rewritten after persist refuses to open; refresh re-opens") {
    val dir = tmpDir("gt-stale") + "/t"
    GraftTable.write(spark, table, Seq(col("v").asc), 4, dir, Seq("v"))
    Sources.graftTable(spark, dir).where(col("v") < 10L).collect()
    // out-of-band append: a new file_id dir the manifest has never seen
    Seq((9999L, 9999L)).toDF("v", "w").coalesce(1)
      .write.parquet(s"$dir/file_id=99")
    val eAdd = intercept[IllegalStateException] {
      Sources.graftTable(spark, dir)
    }
    assert(eAdd.getMessage.contains("STALE"))
    // adopt() IS the refresh: re-harvest footers, open serves again and
    // sees the appended row
    GraftTable.adopt(spark, dir, Seq("v"))
    val t = Sources.graftTable(spark, dir)
    assert(t.where(col("v") === 9999L).count() === 1L)
    // rewrite a unit in place (byte size changes): stale again
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Seq((50L, 1L), (51L, 2L), (52L, 3L)).toDF("v", "w").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/file_id=99")
    assert(intercept[IllegalStateException] {
      Sources.graftTable(spark, dir)
    }.getMessage.contains("STALE"))
    GraftTable.adopt(spark, dir, Seq("v"))
    // remove a unit: stale again
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/file_id=99"), true)
    assert(intercept[IllegalStateException] {
      Sources.graftTable(spark, dir)
    }.getMessage.contains("STALE"))
    // a dir without the sidecar fails with the write/adopt hint
    val bare = tmpDir("gt-bare") + "/t"
    table.write.parquet(bare)
    assert(intercept[IllegalStateException] {
      Sources.graftTable(spark, bare)
    }.getMessage.contains("_graft_manifest"))
  }

  test("manifest-served aggregates: exact COUNT/MIN/MAX/null counts with " +
      "zero files read, null-aware; uncovered column fails loud") {
    val dir = tmpDir("gt-agg") + "/t"
    // maybe: per-file nulls (i % 100 == 7 → null), exercises null-awareness
    val df = (0 until 400).map(i =>
      (i.toLong, if (i % 100 == 7) None else Some(i.toLong)))
      .toDF("v", "maybe")
    GraftTable.write(spark, df, Seq(col("v").asc), 8, dir, Seq("v", "maybe"))
    val ans = GraftTable.aggregate(spark, dir, Seq("v", "maybe"))
    val a = ans.collect()(0)
    assert(PrunedScan.filesRead(ans) === 0L)
    assert(a.getLong(0) === 400L)                      // n_rows
    assert(a.getLong(ans.columns.indexOf("v_min")) === 0L)
    assert(a.getLong(ans.columns.indexOf("v_max")) === 399L)
    assert(a.getLong(ans.columns.indexOf("maybe_nulls")) === 4L)
    assert(a.getLong(ans.columns.indexOf("maybe_count")) === 396L)
    // min/max ignore the null rows (SQL semantics through the manifest)
    assert(a.getLong(ans.columns.indexOf("maybe_min")) === 0L)
    assert(a.getLong(ans.columns.indexOf("maybe_max")) === 399L)
    assert(GraftTable.rowCount(spark, dir) === 400L)
    intercept[IllegalArgumentException] {
      GraftTable.aggregate(spark, dir, Seq("w"))
    }
    // staleness gates the served answer too
    Seq((9999L, Some(1L))).toDF("v", "maybe").coalesce(1)
      .write.parquet(s"$dir/file_id=99")
    intercept[IllegalStateException] {
      GraftTable.aggregate(spark, dir, Seq("v"))
    }
  }

  test("zero-pass join routing: persisted per-file MG merges to a routing " +
      "summary (no corpus scan), autoJoinFromManifest result == plain join") {
    import graft.operators.SkewJoin
    val base = tmpDir("gt-mg")
    val (bigDir, smallDir) = (s"$base/big", s"$base/small")
    // 1/4 of the big side lands on key -1 (planted skew); small is a dim
    val big = (0 until 2000).map { i =>
      val k = if (i % 4 == 0) -1L else (i % 50).toLong
      (i.toLong, k)
    }.toDF("row_id", "k")
    val small = (-1 until 50).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    GraftTable.write(spark, big, Seq(col("k").asc, col("row_id").asc), 4,
      bigDir, Seq("k"), mgKeys = Seq((Seq("k"), 16)))
    GraftTable.write(spark, small, Seq(col("k").asc), 2, smallDir, Seq("k"))
    val mg = GraftTable.keyFreqSummary(spark, bigDir, Seq("k"))
    mg.collect()
    // the decide inputs read ONLY sidecar state — zero corpus files
    assert(PrunedScan.corpusFilesRead(mg) === 0L)
    assert(GraftTable.rowCount(spark, smallDir) === 51L)
    // MG lower bound: true share 0.25; err ≤ 2n/17 can't lift others past it
    val dec = SkewJoin.decide(mg, Seq(51L).toDF("n"),
      broadcastRowLimit = 10L, skewShare = 0.15, nSalts = 4)
    assert(dec.route === "salted")
    assert(dec.bigRows === 2000L)
    val (joined, dec2) = SkewJoin.autoJoinFromManifest(spark, bigDir,
      smallDir, Seq("k"), broadcastRowLimit = 10L, skewShare = 0.15,
      nSalts = 4)
    assert(dec2.route === "salted")
    val got = joined.select("row_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = big.join(small, Seq("k")).select("row_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === want && want.size === 2000)
    // asking for an unregistered key set fails loud
    intercept[IllegalArgumentException] {
      GraftTable.keyFreqSummary(spark, bigDir, Seq("row_id"))
    }
  }

  test("the graft DataSource short name: format(\"graft\").load and SQL " +
      "USING graft serve the pruned, metadata-aggregate frame") {
    val dir = tmpDir("gt-fmt") + "/t"
    GraftTable.write(spark, table, Seq(col("v").asc), 8, dir, Seq("v", "w"))
    val t = spark.read.format("graft").load(dir)
    val q = t.where(col("v") >= 120L && col("v") < 260L)
    assert(q.collect().map(_.getAs[Long]("v")).toSet ===
      (120L until 260L).toSet)
    assert(PrunedScan.filesRead(q) === 4L)
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW gt_fmt USING graft OPTIONS (path '$dir')")
    try {
      val sq = spark.sql("SELECT v FROM gt_fmt WHERE v >= 350")
      assert(sq.collect().map(_.getLong(0)).toSet === (350L until 400L).toSet)
      assert(PrunedScan.filesRead(sq) === 1L)
      // metadata-only aggregates serve through the SQL surface too
      val agg = spark.sql("SELECT COUNT(*), MIN(v), MAX(v) FROM gt_fmt")
      val r = agg.collect()(0)
      assert(r.getLong(0) === 400L && r.getLong(1) === 0L &&
        r.getLong(2) === 399L)
      assert(PrunedScan.filesRead(agg) === 0L)
    } finally spark.catalog.dropTempView("gt_fmt")
    // a stale table refuses through the format path too
    import spark.implicits._
    Seq((1L, 1L)).toDF("v", "w").coalesce(1)
      .write.parquet(s"$dir/file_id=99")
    assert(intercept[IllegalStateException] {
      spark.read.format("graft").load(dir).collect()
    }.getMessage.contains("STALE"))
  }

  test("graft format write path: df.write.format(\"graft\") lands the " +
      "layout + sidecars; append mode is refused") {
    val dir = tmpDir("gt-wfmt") + "/t"
    table.write.format("graft")
      .option("orderBy", "v").option("nFiles", "8")
      .option("stats", "v,w").option("blooms", "w:4096:4")
      .mode("overwrite").save(dir)
    val t = spark.read.format("graft").load(dir)
    val q = t.where(col("v") >= 120L && col("v") < 260L)
    assert(q.collect().map(_.getAs[Long]("v")).toSet ===
      (120L until 260L).toSet)
    assert(PrunedScan.filesRead(q) === 4L)
    // the bloom option landed: unsorted-column equality reads < all files
    val probeW = (5L * 7919L) % 400L
    val eq = t.where(col("w") === probeW)
    eq.collect()
    assert(PrunedScan.filesRead(eq) < 8L)
    // append would break the rank-slice layout — refused loudly
    intercept[UnsupportedOperationException] {
      table.write.format("graft").option("orderBy", "v")
        .mode("append").save(dir)
    }
    // ErrorIfExists refuses an existing graft table
    intercept[IllegalStateException] {
      table.write.format("graft").option("orderBy", "v")
        .mode("error").save(dir)
    }
  }

  test("publishLive: a cleanly-stopped stream's manifest publishes as a " +
      "sidecar — open by path, pruned reads exact; a new trigger stales it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingManifest
    val base = tmpDir("gt-live")
    val statePath = s"$base/state"
    val dataDir = s"$base/data"
    val (mBits, k) = (4096, 4)
    def run(stream: MemoryStream[(Long, Long)]) =
      StreamingManifest.attach(
        stream.toDF().toDF("v", "w"), Seq("v", "w"), statePath,
        s"$base/ckpt", bloomCols = Seq(("w", mBits, k))) { (_, _) => () }
    val waves = (0 until 3).map(wv =>
      (0 until 100).map(i => ((wv * 100 + i).toLong,
        ((wv * 100 + i) * 7919L % 300L))))
    val s1 = MemoryStream[(Long, Long)](spark)
    val q1 = run(s1)
    try {
      waves.zipWithIndex.foreach { case (w, id) =>
        s1.addData(w: _*); q1.processAllAvailable()
        w.toDF("v", "w").coalesce(1)
          .write.mode("overwrite").parquet(s"$dataDir/file_id=$id")
      }
    } finally q1.stop()
    GraftTable.publishLive(spark, dataDir, statePath,
      Map("w" -> (mBits, k)))
    // a path-only open (no statePath handle) serves pruned reads
    val t = Sources.graftTable(spark, dataDir)
    val rq = t.where(col("v") >= 100L && col("v") < 200L)
    assert(rq.collect().map(_.getAs[Long]("v")).toSet ===
      (100L until 200L).toSet)
    assert(PrunedScan.filesRead(rq) === 1L)
    val probeW = (5L * 7919L) % 300L
    val eq = t.where(col("w") === probeW)
    assert(eq.collect().map(_.getAs[Long]("v")).toSet ===
      (0 until 300).filter(i => (i * 7919L) % 300L == probeW)
        .map(_.toLong).toSet)
    // the stream appends another batch: the published sidecar is stale
    val s2 = MemoryStream[(Long, Long)](spark)
    waves.foreach(w => s2.addData(w: _*))
    s2.addData((300 until 400).map(i =>
      (i.toLong, (i * 7919L) % 300L)): _*)
    val q2 = run(s2)
    try q2.processAllAvailable() finally q2.stop()
    (300 until 400).map(i => (i.toLong, (i * 7919L) % 300L))
      .toDF("v", "w").coalesce(1)
      .write.mode("overwrite").parquet(s"$dataDir/file_id=3")
    assert(intercept[IllegalStateException] {
      Sources.graftTable(spark, dataDir)
    }.getMessage.contains("STALE"))
    // republish covers the appended batch
    GraftTable.publishLive(spark, dataDir, statePath,
      Map("w" -> (mBits, k)))
    val t2 = Sources.graftTable(spark, dataDir)
    assert(t2.where(col("v") >= 300L).count() === 100L)
  }

  test("adopt a PLAIN parquet table with a Bloom column: flat layout, " +
      "file-granularity pruning, equality probe sharpened by the sidecar") {
    val dir = tmpDir("gt-adopt") + "/t"
    table.repartitionByRange(8, col("v")).sortWithinPartitions("v")
      .write.parquet(dir)
    GraftTable.adopt(spark, dir, Seq("v", "w"),
      bloomCols = Seq(("w", 4096, 4)))
    val t = Sources.graftTable(spark, dir)
    val plain = spark.read.parquet(dir)
    val nFiles = PrunedScan.filesRead(
      { val f = plain.select(sum(col("v"))); f.collect(); f })
    // range on the sorted column prunes strictly
    val q = t.where(col("v") >= 100L && col("v") < 150L)
    assert(q.collect().map(_.getAs[Long]("v")).toSet ===
      (100L until 150L).toSet)
    assert(PrunedScan.filesRead(q) < nFiles)
    // equality on the unsorted column returns exact rows and reads fewer
    // files than min/max alone would allow (w spans every file)
    val probeW = (7L * 7919L) % 400L
    val eq = t.where(col("w") === probeW)
    assert(eq.collect().map(_.getAs[Long]("v")).toSet ===
      (0 until 400).filter(i => (i * 7919L) % 400L == probeW)
        .map(_.toLong).toSet)
    assert(PrunedScan.filesRead(eq) < nFiles)
  }
}
