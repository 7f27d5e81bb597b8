package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{EqualProbe, PrunedScan}

/** Round-16 advice (medium): the bloom-before-manifest attach order makes
  * "bloom staged at N, manifest at N-1" a reachable crash state. compact()
  * must purge that orphan — otherwise currentBloom's max-id read prefers a
  * frame covering no compacted file id and every equality probe silently
  * prunes the whole table. Lives in graft.streaming for DeltaStaging
  * access (private[streaming]). */
class StreamingManifestCrashSpec extends SparkSpec {

  import spark.implicits._

  test("compact purges an orphan bloom staging above the manifest id " +
      "(crashed attach): equality pruning stays exact, never empty") {
    val base = tmpDir("sman-cb")
    val statePath = s"$base/state"
    val dataDir = s"$base/data"
    val (mBits, k) = (4096, 4)
    val s1 = MemoryStream[(Long, Long)](spark)
    val waves = (0 until 3).map(wv =>
      (0 until 100).map(i => ((wv * 100 + i).toLong,
        ((wv * 100 + i) * 7919L % 300L))))
    val q1 = StreamingManifest.attach(
      s1.toDF().toDF("v", "w"), Seq("v", "w"), statePath, s"$base/ckpt",
      bloomCols = Seq(("w", mBits, k))) { (_, _) => () }
    try {
      waves.zipWithIndex.foreach { case (w, id) =>
        s1.addData(w: _*); q1.processAllAvailable()
        w.toDF("v", "w").coalesce(1)
          .write.mode("overwrite").parquet(s"$dataDir/file_id=$id")
      }
    } finally q1.stop()
    // simulate the crash window: an attach staged the NEXT batch's bloom
    // (bloom-before-manifest order), then died before the manifest stage
    val rootB = s"$statePath-bloom-w"
    val curId = DeltaStaging.stagedIds(spark, statePath).max
    val orphan = DeltaStaging.read(spark, rootB, curId).localCheckpoint(true)
    DeltaStaging.stage(orphan, rootB, curId + 1)
    assert(DeltaStaging.stagedIds(spark, rootB).max === curId + 1)

    StreamingManifest.compact(spark, dataDir, statePath,
      Seq("v", "w"), targetFileBytes = 3L * 1024, sortCol = Some("v"),
      bloomCols = Seq(("w", mBits, k)))
    // the orphan is gone — currentBloom reads the compacted registers
    assert(DeltaStaging.stagedIds(spark, rootB).max === curId)
    val all = waves.flatten
    val probeW = all.head._2
    val df = PrunedScan.prunedParquetLive(spark, dataDir, statePath,
      Seq(EqualProbe("w", lit(probeW))), Map("w" -> (mBits, k)))
      .get.where(col("w") === probeW)
    assert(df.collect().map(_.getAs[Long]("v")).toSet ===
      all.filter(_._2 == probeW).map(_._1).toSet)
  }
}
