package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Round-16 verdict task 7: run d02's missing decade leg (30×) through
  * the STAGED attach ([[graft.operators.Dedup.minHashLshPairsManaged]]
  * `stagedAttach = true`) — the scratch-bound knob documented when the
  * default shape's payload-bearing exchanges ENOSPC'd this box's 78 GB
  * /tmp at 20× (SCALE.md addendum 2). Per leg: wall for BOTH shapes
  * where the default survives, staged-only where it does not, plus the
  * CandCount counters (total/within-copy/cross-copy LSH candidates) so
  * the linearity-in-copies claim carries receipts through 30×.
  *
  * Replicas: [[ScaleStressR15]]'s affine-ciphered documents (case-
  * complete since round 16), doc_id-shifted — FK-free for d02.
  *
  * Usage: `runMain graft.tools.ScaleStressR16 [baseDir] [factors]`
  * (defaults sf0.1 and 10,20,30). SPARK_DRIVER_MEM=48g recommended. */
object ScaleStressR16 {

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(10, 20, 30))
    val runDefaultUpTo = args.lift(2).map(_.toInt).getOrElse(10)
    // FRESH SparkContext per scale factor: shuffle files live until the
    // ContextCleaner gets to them, and at 20x+ a single leftover leg is
    // tens of GB — round-15's GC+sleep was not enough (observed ENOSPC
    // mid-20x). A context stop deletes its blockmgr/spill dirs outright.
    var spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    def recycle(): Unit = {
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      spark = GraftSession.build("local[32]")
      spark.sparkContext.setLogLevel("WARN")
    }

    // the replica shift is max(doc_id)+1 of the base table (what
    // buildDocsScaled uses), so copy(doc) = doc_id DIV shift
    val baseShift = spark.read.parquet(s"$baseDir/documents.parquet")
      .agg(max("doc_id")).head().getLong(0) + 1

    def runLeg(label: String, dir: String, staged: Boolean): Double = {
      val t0 = System.nanoTime()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val pairs = Dedup.minHashLshPairsManaged(
        docs, "doc_id", "text", threshold = 0.5, stagedAttach = staged)
      val n = pairs.result.count()
      pairs.close()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[r16-soak] $label%6s staged=$staged%-5s wall=$wall%8.2f s " +
        f"pairs=$n")
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(6000)
      wall
    }

    def candCounters(label: String, dir: String): Unit = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(32)
      val base = docs.select(col("doc_id").as("_id"),
        Dedup.hashedShingles(col("text"), 5).as("_hs"))
      val sigs = base.select(col("_id"),
        Dedup.minHashSignature(col("_hs"), 64).as("_sig"))
      val banded = sigs.select(col("_id"),
        posexplode(Dedup.bandKeys(col("_sig"), 32, 2))
          .as(Seq("_band", "_bh")))
      val a = banded.select(col("_id").as("a_id"), col("_band"), col("_bh"))
      val b = banded.select(col("_id").as("b_id"),
        col("_band").as("_b2"), col("_bh").as("_h2"))
      val split = a.join(b,
          col("_band") === col("_b2") && col("_bh") === col("_h2") &&
            col("a_id") < col("b_id"))
        .agg(count(lit(1)).as("n_cand"),
          sum(when(floor(col("a_id") / baseShift) ===
            floor(col("b_id") / baseShift), 1L).otherwise(0L)).as("within"),
          sum(when(floor(col("a_id") / baseShift) =!=
            floor(col("b_id") / baseShift), 1L).otherwise(0L)).as("cross"))
        .collect()(0)
      println(s"[r16-soak] $label cand=${split.getLong(0)} " +
        s"within_copy=${split.getLong(1)} cross_copy=${split.getLong(2)}")
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(6000)
    }

    // 1x reference for both shapes
    runLeg("1x", baseDir, staged = false)
    runLeg("1x", baseDir, staged = true)

    for (f <- factors) {
      recycle()
      val outDir = s"/tmp/graft_scale_r16_${f}x"
      val t0 = System.nanoTime()
      ScaleStressR15.buildDocsScaled(spark, baseDir, outDir, f)
      println(f"[r16-soak] ${f}x documents built in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s at $outDir")
      if (f <= runDefaultUpTo) { runLeg(s"${f}x", outDir, staged = false); recycle() }
      runLeg(s"${f}x", outDir, staged = true)
      recycle()
      candCounters(s"${f}x", outDir)
      // reclaim the replica before building the next (30x documents alone
      // is ~30 copies x the base parquet)
      val p = new org.apache.hadoop.fs.Path(outDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.stop()
  }
}
