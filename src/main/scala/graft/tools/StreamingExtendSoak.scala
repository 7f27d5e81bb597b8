package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSession
import graft.operators.Dedup
import graft.streaming.StreamingDedup

/** Self-extending streaming near-dup soak (round-10 → SCALE.md): the one
  * scale question the delta-staging design leaves open is how per-trigger
  * cost moves as STREAM HISTORY grows — each trigger's probe scans
  * base ∪ all earlier deltas (that scan IS the semantics: batch N dedups
  * against everything), so the data-dependent term should grow linearly
  * with ingested volume while staying scan-bound, and compaction
  * ([[StreamingDedup.compactNearDupIndex]]) should reset the
  * multi-small-dir overhead without changing results.
  *
  * Run shape: `base` synthetic docs indexed up front; `triggers` triggers
  * of `perTrigger` docs each (1% planted dups of earlier stream docs so
  * the probe keeps finding real pairs); wall per trigger printed. Then
  * compact, re-attach on a fresh checkpoint, and run 3 more triggers —
  * their walls show the recovered baseline. */
object StreamingExtendSoak {
  def main(args: Array[String]): Unit = {
    val base = args.lift(0).map(_.toInt).getOrElse(20000)
    val perTrigger = args.lift(1).map(_.toInt).getOrElse(1000)
    val triggers = args.lift(2).map(_.toInt).getOrElse(24)
    val spark = GraftSession.build("local[32]", "graft-sext-soak", 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def doc(i: Long, seed: Int): (Long, String) = {
      val r = new scala.util.Random(seed)
      (i, Seq.fill(30)(s"tok${r.nextInt(2000000)}").mkString(" "))
    }
    val corpus = (0 until base).map(i => doc(i.toLong, i)).toDF("doc_id", "text")
    val index = Dedup.buildNearDupIndex(corpus, "doc_id", "text").persisted()
    val statePath = java.nio.file.Files.createTempDirectory("sext-soak").toString + "/state"
    var found = 0L
    def attach(stream: MemoryStream[(Long, String)], ckpt: String, idx: Dedup.NearDupIndex) =
      StreamingDedup.attachNearDupSelfExtending(
        stream.toDF().toDF("doc_id", "text"), idx, "doc_id", "text",
        threshold = 0.5, statePath, ckpt) { (out, _) => found += out.count(); () }

    val rng = new scala.util.Random(11)
    var nextId = 1000000L
    // fresh seeds come from a COUNTER, not a random draw: ~24k draws from a
    // 4e8 space collide with ~50% probability per run (birthday bound), and
    // an accidental seed collision is a REAL cross-trigger pair the probe
    // correctly finds but expectedPairs never counted — the exact-recovery
    // check would flag a healthy system
    var freshSeed = 500000000
    // docs per seed in STRICTLY EARLIER triggers: a dup drawn from this
    // snapshot is guaranteed cross-trigger (within-batch dups are not
    // probed by design, so drawing from the current trigger's own seeds
    // would plant pairs the probe is defined not to find); each plant's
    // expected pair count is the number of earlier copies of its seed
    var seedCount = Map.empty[Int, Long]
    var planted = 0L
    var expectedPairs = 0L
    def trigRows(): Seq[(Long, String)] = {
      val earlier = seedCount.keys.toVector
      var thisTrigger = Map.empty[Int, Long].withDefaultValue(0L)
      val rows = (0 until perTrigger).map { _ =>
        nextId += 1
        val seed =
          if (earlier.nonEmpty && rng.nextInt(100) == 0) {
            val s = earlier(rng.nextInt(earlier.size))
            planted += 1
            expectedPairs += seedCount(s)
            s
          } else { freshSeed += 1; freshSeed }
        thisTrigger += seed -> (thisTrigger(seed) + 1L)
        doc(nextId, seed)
      }
      thisTrigger.foreach { case (s, c) =>
        seedCount += s -> (seedCount.getOrElse(s, 0L) + c)
      }
      rows
    }

    val s1 = MemoryStream[(Long, String)](spark)
    val q1 = attach(s1, java.nio.file.Files.createTempDirectory("sext-ck1").toString, index)
    val walls = try {
      (1 to triggers).map { t =>
        s1.addData(trigRows())
        val t0 = System.nanoTime()
        q1.processAllAvailable()
        val w = (System.nanoTime() - t0) / 1e9
        if (t % 4 == 0 || t == 1)
          println(f"[sext-soak] trigger $t%3d wall=$w%5.2f s (history=${t.toLong * perTrigger} stream docs, planted=$planted pairs found=$found)")
        w
      }
    } finally q1.stop()
    println(f"[sext-soak] triggers 1-4 mean=${walls.take(4).sum / 4}%5.2f s; " +
      f"last-4 mean=${walls.takeRight(4).sum / 4}%5.2f s " +
      s"(corpus grew ${base + perTrigger} -> ${base + triggers * perTrigger} docs)")
    // exact accounting: each plant pairs with EVERY earlier copy of its
    // seed, so the probe must find precisely expectedPairs (chance
    // 0.5-jaccard collisions between 30-token docs over a 2M vocab: none)
    println(s"[sext-soak] planted cross-trigger dups=$planted, " +
      s"expected pairs=$expectedPairs, pairs found=$found " +
      s"(exact recovery=${found == expectedPairs})")

    // compact: deltas fold into one bucketed base; fresh checkpoint
    Seq("sext_soak_prepped", "sext_soak_meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    val t0 = System.nanoTime()
    val compacted = StreamingDedup
      .compactNearDupIndex(spark, index, statePath, "sext_soak", numBuckets = 32)
      .persisted()
    println(f"[sext-soak] compaction wall=${(System.nanoTime() - t0) / 1e9}%5.2f s")
    val s2 = MemoryStream[(Long, String)](spark)
    val q2 = attach(s2, java.nio.file.Files.createTempDirectory("sext-ck2").toString, compacted)
    val postWalls = try {
      (1 to 3).map { _ =>
        s2.addData(trigRows())
        val t1 = System.nanoTime()
        q2.processAllAvailable()
        (System.nanoTime() - t1) / 1e9
      }
    } finally q2.stop()
    println(f"[sext-soak] post-compaction trigger walls=${postWalls.map(w => f"$w%4.2f").mkString(", ")} s " +
      s"(same total corpus, ONE bucketed base instead of ${triggers} delta dirs)")
    spark.stop()
  }
}
