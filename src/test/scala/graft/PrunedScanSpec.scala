package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Bloom, Layout}
import graft.sources.{BloomSidecar, EqualProbe, NullProbe, PrunedScan, RangeProbe}
import graft.streaming.StreamingManifest

/** Manifest-driven pruned scan as a first-class source (round-14 verdict
  * task 1): pruning happens in the READ PATH — the scan node's own
  * `numFiles` metric proves fewer files were opened — while the composed
  * row-level answer stays row-for-row the full scan's. */
class PrunedScanSpec extends SparkSpec {

  import spark.implicits._

  // 400 rows, v sorted into 8 files of 50 ⇒ file k covers v ∈ [50k, 50k+49];
  // w is uncorrelated with the sort (v*7919 mod 400) so min/max on w is
  // useless but per-file Blooms are not — the q97 shape
  private def table: DataFrame =
    (0 until 400).map { i =>
      (i.toLong, (i.toLong * 7919L) % 400L,
        if (i % 100 == 7) None else Some(i.toLong))
    }.toDF("v", "w", "maybe")

  private def writeTable(dir: String): DataFrame = {
    val order = Seq(col("v").asc)
    Layout.assignedWrite(table, order, 8, dir)
    Layout.fileManifest(table, order, 8, Seq("v", "w", "maybe"))
      .localCheckpoint(true)
  }

  test("range probe: identical rows to the full scan, scan-node numFiles == " +
      "survivor count, and files were actually pruned") {
    val dir = tmpDir("pscan") + "/t"
    val man = writeTable(dir)
    val probes = Seq(RangeProbe("v", lit(120L), lit(260L)))
    // metrics live on the executed frame's own plan — collect THIS frame
    val pruned = PrunedScan.prunedParquet(spark, dir, man, probes)
      .where(col("v") >= 120L && col("v") < 260L).select("v", "w")
    val got = pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = spark.read.option("basePath", dir).parquet(dir)
      .where(col("v") >= 120L && col("v") < 260L)
      .select("v", "w").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === full)
    assert(got.size === 140)
    // files 2..5 hold [100,299] — v∈[120,260) touches exactly those 4
    val survivors = PrunedScan.survivorIds(man, probes)
    assert(survivors === Seq(2L, 3L, 4L, 5L))
    assert(PrunedScan.filesRead(pruned) === 4L)
  }

  test("bloom sidecar sharpens an equality probe min/max cannot prune — " +
      "no false negatives, metric reflects the sharpened listing") {
    val dir = tmpDir("pscan-b") + "/t"
    val man = writeTable(dir)
    val (mBits, k) = (4096, 4)
    val regs = Bloom.registers(
      Layout.fileAssignments(table, Seq(col("v").asc), 8),
      Seq("file_id"), "w", mBits, k).localCheckpoint(true)
    val probeV = 77L // w = 77 ⇔ v·7919 ≡ 77 (mod 400): exactly one row
    val probes = Seq(EqualProbe("w", lit(probeV)))
    val minmaxOnly = PrunedScan.survivorIds(man, probes)
    val sharpened = PrunedScan.survivorIds(man, probes,
      Map("w" -> BloomSidecar(regs, mBits, k)))
    // w spans ~the full range in every file ⇒ min/max keeps all 8; the
    // bloom keeps the truly-containing file(s) + fp tail only
    assert(minmaxOnly.size === 8)
    assert(sharpened.toSet.subsetOf(minmaxOnly.toSet))
    assert(sharpened.size < 8, s"bloom pruned nothing: $sharpened")
    // no false negatives: every file that truly holds w=77 survives
    val truly = Layout.fileAssignments(table, Seq(col("v").asc), 8)
      .where(col("w") === probeV).select("file_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(truly.subsetOf(sharpened.toSet))
    val pruned = PrunedScan.prunedParquet(spark, dir, man, probes,
        Map("w" -> BloomSidecar(regs, mBits, k)))
      .where(col("w") === probeV).select("v")
    val got = pruned.collect().map(_.getLong(0)).toSet
    val full = spark.read.parquet(dir).where(col("w") === probeV)
      .select("v").collect().map(_.getLong(0)).toSet
    assert(got === full && got.nonEmpty)
    assert(PrunedScan.filesRead(pruned) === sharpened.size.toLong)
  }

  test("zero survivors: empty frame with the table's schema; null probe " +
      "keeps exactly the null-holding files") {
    val dir = tmpDir("pscan-z") + "/t"
    val man = writeTable(dir)
    val none = PrunedScan.prunedParquet(spark, dir, man,
      Seq(RangeProbe("v", lit(5000L), lit(6000L))))
    assert(none.count() === 0L)
    assert(none.columns.toSet === Set("v", "w", "maybe", "file_id"))
    // maybe is null at i = 7, 107, 207, 307 — one per even file
    val nullFiles = PrunedScan.survivorIds(man, Seq(NullProbe("maybe")))
    assert(nullFiles === Seq(0L, 2L, 4L, 6L))
    val got = PrunedScan.prunedParquet(spark, dir, man, Seq(NullProbe("maybe")))
      .where(col("maybe").isNull).count()
    assert(got === 4L)
  }

  test("conjunction: a file must satisfy EVERY probe to survive") {
    val man = writeTable(tmpDir("pscan-c") + "/t")
    val both = PrunedScan.survivorIds(man, Seq(
      RangeProbe("v", lit(120L), lit(260L)), NullProbe("maybe")))
    // range keeps {2,3,4,5}, nulls keep {0,2,4,6} ⇒ conjunction {2,4}
    assert(both === Seq(2L, 4L))
  }

  test("live manifest + bloom sidecar: stream state == batch build, pruned " +
      "set parity, prunedParquetLive answers == batch pruned scan") {
    val base = tmpDir("pscan-live")
    val statePath = s"$base/state"
    val dataDir = s"$base/data"
    val (mBits, k) = (4096, 4)
    val stream = MemoryStream[(Long, Long)](spark)
    val q = StreamingManifest.attach(
      stream.toDF().toDF("v", "w"), Seq("v", "w"), statePath,
      s"$base/ckpt", bloomCols = Seq(("w", mBits, k))) { (_, id) => () }
    // the "file" a writer would emit per trigger, for the live scan to read
    val waves = (0 until 3).map(wv =>
      (0 until 100).map(i =>
        ((wv * 100 + i).toLong, ((wv * 100 + i).toLong * 7919L) % 300L)))
    try {
      waves.zipWithIndex.foreach { case (w, id) =>
        stream.addData(w: _*); q.processAllAvailable()
        w.toDF("v", "w").coalesce(1)
          .write.mode("overwrite").parquet(s"$dataDir/file_id=$id")
      }
    } finally q.stop()
    // register parity: staged per-file blooms == batch registers over the
    // same rows labeled by their batch id
    val live = StreamingManifest.currentBloom(spark, statePath, "w").get
    val batchAll = waves.zipWithIndex
      .map { case (w, id) => w.toDF("v", "w").withColumn("file_id", lit(id.toLong)) }
      .reduce(_.unionByName(_))
    val batchRegs = Bloom.registers(batchAll, Seq("file_id"), "w", mBits, k)
    def regSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(regSet(live.select(col("file_id").cast("long"), col("_word"), col("_bits")))
      === regSet(batchRegs.select(col("file_id").cast("long"), col("_word"), col("_bits"))))
    // pruned-set parity + live answer == batch answer
    val probeV = 38L
    val probes = Seq(EqualProbe("w", lit(probeV)))
    val liveMan = StreamingManifest.currentManifest(spark, statePath).get
    val liveSharp = PrunedScan.survivorIds(liveMan, probes,
      Map("w" -> BloomSidecar(live, mBits, k)))
    val batchMan = liveMan // same frame shape; parity of the SETS is the pin
    val batchSharp = PrunedScan.survivorIds(batchMan, probes,
      Map("w" -> BloomSidecar(batchRegs, mBits, k)))
    assert(liveSharp === batchSharp)
    val liveDf = PrunedScan.prunedParquetLive(spark, dataDir, statePath,
      probes, Map("w" -> (mBits, k))).get
      .where(col("w") === probeV).select("v")
    val gotLive = liveDf.collect().map(_.getLong(0)).toSet
    val full = spark.read.option("basePath", dataDir).parquet(dataDir)
      .where(col("w") === probeV).select("v").collect().map(_.getLong(0)).toSet
    assert(gotLive === full && full.nonEmpty)
    // metric from the collected plan itself: ≤ files the sidecar kept
    assert(PrunedScan.filesRead(liveDf) === liveSharp.size.toLong)

    // crash-window exactness (round-15 advice): the attach stages bloom
    // sidecars BEFORE the manifest, so the only observable intermediate
    // state is bloom-AHEAD — registers exist for a file_id the manifest
    // does not list yet. A reader is driven by the manifest's file list,
    // so the extra rows must be inert: same survivors, same answer.
    val phantom = Seq((900L, probeV), (901L, probeV + 1L)).toDF("v", "w")
      .withColumn("file_id", lit(3L))
    val aheadRegs = live.unionByName(
      Bloom.registers(phantom, Seq("file_id"), "w", mBits, k))
    // stage by the DeltaStaging directory convention (the object itself is
    // private[streaming]): `<root>/_batch=<id>` parquet with _SUCCESS
    aheadRegs.write.mode("overwrite")
      .parquet(s"$statePath-bloom-w/_batch=3")
    val aheadDf = PrunedScan.prunedParquetLive(spark, dataDir, statePath,
      probes, Map("w" -> (mBits, k))).get
      .where(col("w") === probeV).select("v")
    assert(aheadDf.collect().map(_.getLong(0)).toSet === full)
    assert(PrunedScan.filesRead(aheadDf) === liveSharp.size.toLong)
  }
}
