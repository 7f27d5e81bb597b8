package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.streaming.{StreamingBm25, StreamingDedup, StreamingSimilarity}

/** Self-extending streaming indexes (round-10 ingest realism): batch N must
  * dedup / retrieve against batches 1..N-1, not just the frozen base corpus
  * — with per-id-idempotent sink output (replay), checkpoint-restart
  * continuation, and incarnation-reset purging (fresh checkpoint, same
  * statePath starts clean). Batch parity anchor: the streaming trigger-N
  * output equals `extend(base, batches < N)` + one batch probe. */
class StreamingExtendSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic doc text: identical seed → identical text (jaccard 1);
    * the 5000-token vocabulary keeps DIFFERENT seeds' jaccard near zero so
    * threshold-0.5 assertions see only planted pairs. */
  private def doc(i: Long, seed: Int): (Long, String) = {
    val r = new scala.util.Random(seed)
    (i, Seq.fill(30)(s"tok${r.nextInt(5000)}").mkString(" "))
  }

  private def pairRows(d: DataFrame): Set[(Long, Long, Double)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("attachNearDupSelfExtending: batch N pairs against batches < N; parity with batch extend+probe") {
    val corpus = (0L until 20L).map(i => doc(i, i.toInt)).toDF("doc_id", "text")
    val base = Dedup.buildNearDupIndex(corpus, "doc_id", "text").persisted()
    val statePath = tmpDir("snd") + "/state"
    val results = scala.collection.mutable.Map[Long, Set[(Long, Long, Double)]]()
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.attachNearDupSelfExtending(
      stream.toDF().toDF("doc_id", "text"), base, "doc_id", "text",
      threshold = 0.5, statePath, tmpDir("snd-ckpt")) { (out, id) =>
      results.synchronized { results(id) = pairRows(out) }
    }
    try {
      // trigger 1: one dup of base doc 3, one brand-new doc 101
      val b1 = Seq(doc(100L, 3), doc(101L, 991))
      // trigger 2: dup of TRIGGER-1's doc 101 (absent from base) + new doc
      val b2 = Seq(doc(200L, 991), doc(201L, 992))
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val r1 = results.synchronized(results(0L))
      val r2 = results.synchronized(results(1L))
      // trigger 1 sees only the base: the planted base dup, nothing else
      assert(r1.map(p => (p._1, p._2)) == Set((100L, 3L)))
      // trigger 2 catches the CROSS-TRIGGER pair — the frozen-index attach
      // cannot (doc 101 is not in the base corpus)
      assert(r2.map(p => (p._1, p._2)) == Set((200L, 101L)))
      assert(pairRows(Dedup.probeNearDup(
        base, b2.toDF("doc_id", "text"), "doc_id", "text", 0.5)).isEmpty)
      // batch parity: extend(base, b1) probed with b2 == streaming trigger 2
      val extended = Dedup.extendNearDupIndex(
        base, b1.toDF("doc_id", "text"), "doc_id", "text")
      assert(r2 == pairRows(Dedup.probeNearDup(
        extended, b2.toDF("doc_id", "text"), "doc_id", "text", 0.5)))
      // serving view covers both committed deltas
      val current = StreamingDedup.currentNearDupIndex(spark, base, statePath)
      assert(pairRows(Dedup.probeNearDup(
          current, Seq(doc(300L, 992)).toDF("doc_id", "text"),
          "doc_id", "text", 0.5)).map(p => (p._1, p._2)) == Set((300L, 201L)))
    } finally q.stop()
  }

  test("attachNearDupSelfExtending: restart continues the index; fresh incarnation purges it") {
    val corpus = (0L until 10L).map(i => doc(i, i.toInt)).toDF("doc_id", "text")
    val base = Dedup.buildNearDupIndex(corpus, "doc_id", "text").persisted()
    val statePath = tmpDir("snd-r") + "/state"
    val ckpt = tmpDir("snd-r-ckpt")
    val results = scala.collection.mutable.Map[Long, Set[(Long, Long, Double)]]()
    def run(stream: MemoryStream[(Long, String)], checkpoint: String) =
      StreamingDedup.attachNearDupSelfExtending(
        stream.toDF().toDF("doc_id", "text"), base, "doc_id", "text",
        threshold = 0.5, statePath, checkpoint) { (out, id) =>
        results.synchronized { results(id) = pairRows(out) }
      }
    val b1 = Seq(doc(100L, 771))
    val b2 = Seq(doc(101L, 772))
    val s1 = MemoryStream[(Long, String)](spark)
    val q1 = run(s1, ckpt)
    try {
      s1.addData(b1: _*); q1.processAllAvailable()
      s1.addData(b2: _*); q1.processAllAvailable()
    } finally q1.stop()

    // restart from the SAME checkpoint: trigger 3's dup of trigger-1's doc
    // must be caught — the staged deltas survived the restart
    val s2 = MemoryStream[(Long, String)](spark)
    s2.addData(b1: _*); s2.addData(b2: _*)
    s2.addData(doc(102L, 771))
    val q2 = run(s2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(results.synchronized(results(2L)).map(p => (p._1, p._2)) ==
      Set((102L, 100L)))

    // FRESH incarnation (new checkpoint, batch ids reset, same statePath):
    // batch 0 must not pair against the previous incarnation's docs, and
    // its processing purges every stale staging
    results.clear()
    val s3 = MemoryStream[(Long, String)](spark)
    s3.addData(doc(500L, 771)) // dup of the DEAD incarnation's doc 100
    val q3 = run(s3, tmpDir("snd-r-ckpt2"))
    try q3.processAllAvailable() finally q3.stop()
    assert(results.synchronized(results(0L)).isEmpty,
      "a fresh incarnation must not see the prior incarnation's deltas")
    val stages = new java.io.File(statePath).listFiles()
      .filter(_.getName.startsWith("_batch=")).map(_.getName).toSeq
    assert(stages == Seq("_batch=0"),
      s"stale stagings must be purged, got $stages")
  }

  test("compactNearDupIndex: deltas fold into a persisted base, stagings clear, probes unchanged") {
    val corpus = (0L until 10L).map(i => doc(i, i.toInt)).toDF("doc_id", "text")
    val base = Dedup.buildNearDupIndex(corpus, "doc_id", "text").persisted()
    val statePath = tmpDir("snd-c") + "/state"
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.attachNearDupSelfExtending(
      stream.toDF().toDF("doc_id", "text"), base, "doc_id", "text",
      threshold = 0.5, statePath, tmpDir("snd-c-ckpt")) { (out, _) => out.count(); () }
    try {
      stream.addData(doc(100L, 881)); q.processAllAvailable()
      stream.addData(doc(101L, 882)); q.processAllAvailable()
    } finally q.stop()
    // a probe that hits BOTH stream docs, captured before compaction
    val probeBatch = Seq(doc(300L, 881), doc(301L, 882)).toDF("doc_id", "text")
    val before = pairRows(Dedup.probeNearDup(
      StreamingDedup.currentNearDupIndex(spark, base, statePath),
      probeBatch, "doc_id", "text", 0.5))
    assert(before.map(p => (p._1, p._2)) == Set((300L, 100L), (301L, 101L)))
    // saveNearDupIndex overwrite hygiene: a previous JVM's managed location
    // may survive without a catalog entry (the DedupSpec pattern)
    Seq("sext_compact_prepped", "sext_compact_meta").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val compacted = StreamingDedup.compactNearDupIndex(
      spark, base, statePath, "sext_compact", numBuckets = 4)
    // stagings gone; the compacted bucketed index probes identically
    val stages = new java.io.File(statePath).listFiles()
    assert(stages == null || !stages.exists(_.getName.startsWith("_batch=")),
      "compaction must clear every staging")
    assert(pairRows(Dedup.probeNearDup(
      compacted, probeBatch, "doc_id", "text", 0.5)) == before)
  }

  test("attachNearDupClustering: incremental labels equal batch components over the union corpus") {
    // base: docs 0..9, with 7 a dup of 2 (one base cluster) — base labels
    // computed the batch way
    val baseDocs = ((0L until 7L).map(i => doc(i, i.toInt)) :+ doc(7L, 2) :+
      doc(8L, 8) :+ doc(9L, 9)).toDF("doc_id", "text")
    val base = Dedup.buildNearDupIndex(baseDocs, "doc_id", "text").persisted()
    val baseLabels = Dedup.connectedComponents(
      baseDocs.select("doc_id"), "doc_id",
      Dedup.minHashLshPairs(baseDocs, "doc_id", "text", threshold = 0.5)
        .select("a_id", "b_id"),
      "a_id", "b_id").persist()
    val statePath = tmpDir("sndc") + "/state"
    val assigns = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.attachNearDupClustering(
      stream.toDF().toDF("doc_id", "text"), base, baseLabels,
      "doc_id", "text", threshold = 0.5, statePath, tmpDir("sndc-ckpt")) {
      (out, id) =>
        assigns.synchronized {
          assigns(id) = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        }
    }
    // trigger 1: dup of base 2 (joins cluster 2), new doc 102, and a
    // WITHIN-batch dup pair (103, 104)
    val b1 = Seq(doc(101L, 2), doc(102L, 660), doc(103L, 661), doc(104L, 661))
    // trigger 2: dup of stream doc 102 (cross-trigger cluster), singleton
    val b2 = Seq(doc(201L, 660), doc(202L, 662))
    // trigger 3: dup of TRIGGER-1's within-batch group — read through the
    // relabel store's prune window (only the last two stagings survive, so
    // trigger 1's ASSIGNMENT delta must still be visible under the gate)
    val b3 = Seq(doc(301L, 661))
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b3: _*); q.processAllAvailable()
      assert(assigns.synchronized(assigns(0L)) ==
        Set((101L, 2L), (102L, 102L), (103L, 103L), (104L, 103L)))
      assert(assigns.synchronized(assigns(1L)) ==
        Set((201L, 102L), (202L, 202L)))
      assert(assigns.synchronized(assigns(2L)) == Set((301L, 103L)))
      // full-state parity with one batch run over the union corpus
      val all = baseDocs.unionByName((b1 ++ b2 ++ b3).toDF("doc_id", "text"))
      val expect = Dedup.connectedComponents(
          all.select("doc_id"), "doc_id",
          Dedup.minHashLshPairs(all, "doc_id", "text", threshold = 0.5)
            .select("a_id", "b_id"),
          "a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = StreamingDedup.currentClusterLabels(
          spark, baseLabels, "doc_id", statePath)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"incremental $got\nvs batch $expect")
    } finally q.stop()
    baseLabels.unpersist()
  }

  test("attachNearDupClustering: a bridging doc merges clusters and the relabel map repairs existing rows") {
    // base docs 3 and 5 share a text but start under IDENTITY labels (a
    // legal, incomplete base assignment); the stream bridge must merge them
    val baseDocs = Seq(doc(3L, 700), doc(5L, 700), doc(6L, 701))
      .toDF("doc_id", "text")
    val base = Dedup.buildNearDupIndex(baseDocs, "doc_id", "text").persisted()
    val identity = baseDocs.select(col("doc_id"),
      col("doc_id").as("cluster_id")).persist()
    val statePath = tmpDir("sndc-m") + "/state"
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.attachNearDupClustering(
      stream.toDF().toDF("doc_id", "text"), base, identity,
      "doc_id", "text", threshold = 0.5, statePath, tmpDir("sndc-m-ckpt")) {
      (out, _) => out.count(); ()
    }
    try {
      stream.addData(doc(105L, 700)); q.processAllAvailable() // bridges 3 and 5
      stream.addData(doc(205L, 700)); q.processAllAvailable() // joins merged
      val got = StreamingDedup.currentClusterLabels(
          spark, identity, "doc_id", statePath)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((3L, 3L), (5L, 3L), (6L, 6L), (105L, 3L), (205L, 3L)),
        s"got $got")
    } finally q.stop()
    identity.unpersist()
  }

  test("attachNearDupClustering: randomized differential parity with batch components") {
    // three random corpora/streams: duplicate groups scattered across base
    // and triggers, including multi-copy seeds (merge pressure) — each run
    // must end exactly equal to one batch component fold over the union
    for (seed <- Seq(101, 202, 303)) {
      val rig = new scala.util.Random(seed)
      def randDoc(i: Long): (Long, String) = {
        // 30% chance to reuse a seed from a small pool → dup groups of
        // varied size; else a unique seed
        val s = if (rig.nextInt(10) < 3) 9000 + rig.nextInt(12)
                else 100000 + seed * 1000 + i.toInt
        doc(i, s)
      }
      val baseDocs = (0L until 25L).map(randDoc).toDF("doc_id", "text")
      val base = Dedup.buildNearDupIndex(baseDocs, "doc_id", "text").persisted()
      val baseLabels = Dedup.connectedComponents(
        baseDocs.select("doc_id"), "doc_id",
        Dedup.minHashLshPairs(baseDocs, "doc_id", "text", threshold = 0.5)
          .select("a_id", "b_id"),
        "a_id", "b_id").persist()
      baseLabels.count()
      val statePath = tmpDir(s"sndc-x$seed") + "/state"
      val stream = MemoryStream[(Long, String)](spark)
      val q = StreamingDedup.attachNearDupClustering(
        stream.toDF().toDF("doc_id", "text"), base, baseLabels,
        "doc_id", "text", threshold = 0.5, statePath,
        tmpDir(s"sndc-x$seed-ckpt")) { (out, _) => out.count(); () }
      val batches = (0 until 3).map(t =>
        (0 until 8).map(j => randDoc(1000L * (t + 1) + j)))
      try {
        batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
        val all = baseDocs.unionByName(batches.flatten.toDF("doc_id", "text"))
        val expect = Dedup.connectedComponents(
            all.select("doc_id"), "doc_id",
            Dedup.minHashLshPairs(all, "doc_id", "text", threshold = 0.5)
              .select("a_id", "b_id"),
            "a_id", "b_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val got = StreamingDedup.currentClusterLabels(
            spark, baseLabels, "doc_id", statePath)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expect, s"seed $seed: incremental != batch\n$got\n$expect")
      } finally { q.stop(); baseLabels.unpersist(); base.unpersisted() }
    }
  }

  test("attachNearDupClustering: restart continues the clustering; fresh incarnation starts clean") {
    val baseDocs = (0L until 6L).map(i => doc(i, i.toInt)).toDF("doc_id", "text")
    val base = Dedup.buildNearDupIndex(baseDocs, "doc_id", "text").persisted()
    val baseLabels = baseDocs.select(col("doc_id"), col("doc_id").as("cluster_id"))
    val statePath = tmpDir("sndc-r") + "/state"
    val ckpt = tmpDir("sndc-r-ckpt")
    val assigns = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
    def run(stream: MemoryStream[(Long, String)], checkpoint: String) =
      StreamingDedup.attachNearDupClustering(
        stream.toDF().toDF("doc_id", "text"), base, baseLabels,
        "doc_id", "text", threshold = 0.5, statePath, checkpoint) { (out, id) =>
        assigns.synchronized {
          assigns(id) = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        }
      }
    val b1 = Seq(doc(101L, 810), doc(102L, 811))
    val b2 = Seq(doc(201L, 810)) // joins 101's cluster
    val s1 = MemoryStream[(Long, String)](spark)
    val q1 = run(s1, ckpt)
    try {
      s1.addData(b1: _*); q1.processAllAvailable()
      s1.addData(b2: _*); q1.processAllAvailable()
    } finally q1.stop()

    // restart, same checkpoint: trigger 3's dup of a TRIGGER-1 doc must
    // land in the cluster the pre-restart state established
    val s2 = MemoryStream[(Long, String)](spark)
    s2.addData(b1: _*); s2.addData(b2: _*)
    s2.addData(doc(301L, 811))
    val q2 = run(s2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(assigns.synchronized(assigns(2L)) == Set((301L, 102L)))
    val labels = StreamingDedup.currentClusterLabels(
        spark, baseLabels, "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels.filter(_._1 >= 100L) ==
      Set((101L, 101L), (102L, 102L), (201L, 101L), (301L, 102L)), s"got $labels")

    // fresh incarnation (new checkpoint, same statePath): batch 0 must see
    // only the base corpus — the dead incarnation's docs are purged
    assigns.clear()
    val s3 = MemoryStream[(Long, String)](spark)
    s3.addData(doc(500L, 810)) // dup of the DEAD incarnation's doc 101
    val q3 = run(s3, tmpDir("sndc-r-ckpt2"))
    try q3.processAllAvailable() finally q3.stop()
    assert(assigns.synchronized(assigns(0L)) == Set((500L, 500L)),
      "a fresh incarnation must not cluster against the prior incarnation's docs")
    val after = StreamingDedup.currentClusterLabels(
        spark, baseLabels, "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == baseLabels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet + ((500L, 500L)),
      s"stale labels must be purged, got $after")
  }

  test("compactClustering: all three stores fold; re-attached stream continues from the compacted state") {
    val baseDocs = Seq(doc(3L, 900), doc(5L, 900), doc(6L, 901))
      .toDF("doc_id", "text")
    val base = Dedup.buildNearDupIndex(baseDocs, "doc_id", "text").persisted()
    val identity = baseDocs.select(col("doc_id"), col("doc_id").as("cluster_id"))
    val statePath = tmpDir("sndc-c") + "/state"
    def run(stream: MemoryStream[(Long, String)], ckpt: String,
            idx: Dedup.NearDupIndex, labels: DataFrame) =
      StreamingDedup.attachNearDupClustering(
        stream.toDF().toDF("doc_id", "text"), idx, labels,
        "doc_id", "text", threshold = 0.5, statePath, ckpt) {
        (out, _) => out.count(); ()
      }
    val s1 = MemoryStream[(Long, String)](spark)
    val q1 = run(s1, tmpDir("sndc-c-ck1"), base, identity)
    try {
      s1.addData(doc(105L, 900)); q1.processAllAvailable() // merges 3 and 5
      s1.addData(doc(106L, 902)); q1.processAllAvailable() // new singleton
    } finally q1.stop()
    Seq("prepped", "meta", "labels").foreach { sfx =>
      spark.sql(s"DROP TABLE IF EXISTS sext_cluc_$sfx")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), s"sext_cluc_$sfx")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val (cIdx, cLabels) = StreamingDedup.compactClustering(
      spark, base, identity, "doc_id", statePath, "sext_cluc", numBuckets = 4)
    // every staging in every store is gone
    Seq("index", "labels", "relabel").foreach { sub =>
      val stages = new java.io.File(s"$statePath/$sub").listFiles()
      assert(stages == null || !stages.exists(_.getName.startsWith("_batch=")),
        s"$sub stagings must be cleared")
    }
    // the compacted labels carry the merge
    assert(cLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((3L, 3L), (5L, 3L), (6L, 6L), (105L, 3L), (106L, 106L)))
    // a re-attached stream clusters against the compacted corpus
    val s2 = MemoryStream[(Long, String)](spark)
    val q2 = run(s2, tmpDir("sndc-c-ck2"), cIdx, cLabels)
    try {
      s2.addData(doc(205L, 902)); q2.processAllAvailable() // dup of 106
    } finally q2.stop()
    val after = StreamingDedup.currentClusterLabels(
        spark, cLabels, "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == Set((3L, 3L), (5L, 3L), (6L, 6L), (105L, 3L),
      (106L, 106L), (205L, 106L)), s"got $after")
  }

  test("attachBm25Ingest: streamed docs become retrievable; stats fold exactly; compaction preserves probes") {
    val corpus = Seq(
      (1L, "spark shuffles data across executors"),
      (2L, "columnar scans prune row groups"),
      (3L, "the optimizer reorders joins")).toDF("doc_id", "text")
    val base = TextAnalysis.buildBm25Index(corpus, "doc_id", "text").persisted()
    val statePath = tmpDir("sbm") + "/state"
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingBm25.attachBm25Ingest(
      stream.toDF().toDF("doc_id", "text"), base, "text",
      statePath, tmpDir("sbm-ckpt"))()
    val b1 = Seq((100L, "broadcast joins avoid shuffles entirely"))
    val b2 = Seq((101L, "watermarks bound streaming state"), (102L, null: String))
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def probeRows(ix: TextAnalysis.Bm25Index) =
      TextAnalysis.probeBm25(ix, Seq("shuffles", "joins"), k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val current = StreamingBm25.currentBm25Index(spark, base, statePath)
    val got = probeRows(current)
    // the streamed doc 100 outranks every base doc (hits BOTH query terms)
    assert(got.map(_._1).contains(100L), s"got $got")
    // parity with the batch fold over the same history — including the
    // null-text doc 102's exact contribution to n/avgdl
    val expect = probeRows(
      TextAnalysis.extendBm25Index(
        TextAnalysis.extendBm25Index(base, b1.toDF("doc_id", "text"), "text"),
        b2.toDF("doc_id", "text"), "text"))
    assert(got == expect)
    // stats fold: n counts all 6 docs, _nl only the 5 with text
    val st = current.stats.collect().head
    assert(st.getDouble(0) == 6.0 && st.getDouble(2) == 5.0, s"stats: $st")
    // compaction: bucketed tables probe identically, stagings gone
    Seq("postings", "doclens", "stats").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS sext_bm25_$t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), s"sext_bm25_$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val compacted = StreamingBm25.compactBm25Index(
      spark, base, statePath, "sext_bm25", numBuckets = 4)
    assert(probeRows(compacted) == expect)
    Seq("postings", "doclens", "stats").foreach { sub =>
      val stages = new java.io.File(s"$statePath/$sub").listFiles()
      assert(stages == null || !stages.exists(_.getName.startsWith("_batch=")),
        s"$sub stagings must be cleared")
    }
  }

  test("attachIvfSelfExtending: vector ingested in trigger 1 is retrieved by a trigger-2 probe; parity with batch extend") {
    val rng = new scala.util.Random(41)
    // two well-separated clusters so retrieval is unambiguous
    def mk(ids: Seq[Long]): Seq[(Long, Seq[Double])] = ids.map { i =>
      val cell = (i % 2).toInt
      (i, Seq.tabulate(8)(d => (if (d == cell * 4) 1.0 else 0.0) +
        rng.nextGaussian() * 0.03))
    }
    val baseRows = mk(0L until 30L)
    val base = Similarity.buildIvfIndex(
      baseRows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      pmod(col("vec_id"), lit(2L))).persisted()
    val statePath = tmpDir("sivf") + "/state"
    val results = scala.collection.mutable.Map[Long, Seq[(Long, Long, Long, Double)]]()
    val stream = MemoryStream[(Long, Seq[Double])](spark)
    val q = StreamingSimilarity.attachIvfSelfExtending(
      stream.toDF().toDF("vec_id", "embedding"), base,
      "vec_id", "embedding", k = 3, nProbe = 2,
      statePath, tmpDir("sivf-ckpt")) { (out, id) =>
      val rows = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      results.synchronized { results(id) = rows }
    }
    try {
      // stream vectors live on a THIRD direction (e2) the base corpus never
      // uses, so the nearest neighbor of a stream query is unambiguously the
      // earlier stream vector (cosine ≈ 1 vs ≈ 0 against every base row)
      def mkDir(i: Long): (Long, Seq[Double]) =
        (i, Seq.tabulate(8)(d => (if (d == 2) 1.0 else 0.0) +
          rng.nextGaussian() * 0.03))
      val b1 = Seq(mkDir(100L))
      val b2 = Seq(mkDir(200L)) // must now retrieve 100 as its top hit
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val r2 = results.synchronized(results(1L))
      assert(r2.exists { case (qid, rank, hit, _) =>
        qid == 200L && rank == 1L && hit == 100L },
        s"trigger-2 probe must retrieve the trigger-1 vector first, got $r2")
      // parity with the batch path over the same history
      val expect = Similarity.probeIvf(
          Similarity.extendIvfIndex(base, b1.toDF("vec_id", "embedding")),
          b2.toDF("vec_id", "embedding"), "vec_id", "embedding",
          k = 3, nProbe = 2, guardBroadcast = false)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(r2.toSet == expect.toSet)
      // serving view: an ad-hoc batch probe sees everything ingested so far
      val cur = StreamingSimilarity.currentIvf(spark, base, statePath)
      val adhoc = Similarity.probeIvf(
          cur, Seq(mkDir(300L)).toDF("vec_id", "embedding"), "vec_id",
          "embedding", k = 4, nProbe = 2, guardBroadcast = false)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(adhoc.contains((300L, 100L)) && adhoc.contains((300L, 200L)),
        s"serving view must cover both stream vectors, got $adhoc")
    } finally q.stop()
  }

  test("StreamingDecontam: per-trigger parity with the batch forms on both modalities") {
    import graft.streaming.StreamingDecontam
    val bench = Seq((100L, "benchmark says the quick brown fox is canonical"))
      .toDF("doc_id", "text").persist()
    val hits = scala.collection.mutable.Map[Long, Set[Long]]()
    val stream = MemoryStream[(Long, String)](spark)
    val a = StreamingDecontam.attachNgram(
      stream.toDF().toDF("doc_id", "text"), bench, "doc_id", "text",
      tmpDir("sdec-ckpt"), n = 3) { (out, id) =>
      hits.synchronized { hits(id) = out.select("doc_id").collect().map(_.getLong(0)).toSet }
    }
    try {
      stream.addData((1L, "the quick brown fox jumps"), (2L, "unrelated clean text entirely"))
      a.query.processAllAvailable()
      stream.addData((3L, "quick brown fox appears here too"))
      a.query.processAllAvailable()
      assert(hits.synchronized(hits(0L)) == Set(1L), s"got $hits") // 2 is clean
      assert(hits.synchronized(hits(1L)) == Set(3L))
    } finally { a.query.stop(); a.unpersistArtifacts() }

    val benchV = Seq((900L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding").persist()
    val clean = scala.collection.mutable.Map[Long, Set[Long]]()
    val vs = MemoryStream[(Long, Seq[Double])](spark)
    val a2 = StreamingDecontam.attachSemantic(
      vs.toDF().toDF("vec_id", "embedding"), benchV, "vec_id", "embedding",
      "embedding", threshold = 0.9, tmpDir("sdec2-ckpt")) { (out, id) =>
      clean.synchronized { clean(id) = out.select("vec_id").collect().map(_.getLong(0)).toSet }
    }
    try {
      vs.addData((10L, Seq(0.99, 0.1, 0.0)), (11L, Seq(0.0, 1.0, 0.0)))
      a2.query.processAllAvailable()
      // 10 is a near-benchmark paraphrase (dropped); 11 is orthogonal (kept)
      assert(clean.synchronized(clean(0L)) == Set(11L), s"got $clean")
    } finally { a2.query.stop(); a2.unpersistArtifacts() }
    bench.unpersist(); benchV.unpersist()
  }

  test("attachLshSelfExtending: cross-trigger retrieval; extension identical to a fresh build") {
    val rng = new scala.util.Random(47)
    def mk(i: Long, dir: Int): (Long, Seq[Double]) =
      (i, Seq.tabulate(8)(d => (if (d == dir) 1.0 else 0.0) +
        rng.nextGaussian() * 0.03))
    val baseRows = (0L until 20L).map(i => mk(i, (i % 2).toInt * 4))
    val base = Similarity.buildLshIndex(
      baseRows.toDF("vec_id", "embedding"), "vec_id", "embedding", nPlanes = 4, dims = 8)
    val statePath = tmpDir("slsh") + "/state"
    val results = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
    val stream = MemoryStream[(Long, Seq[Double])](spark)
    val q = StreamingSimilarity.attachLshSelfExtending(
      stream.toDF().toDF("vec_id", "embedding"), base,
      "vec_id", "embedding", k = 2, statePath, tmpDir("slsh-ckpt")) { (out, id) =>
      val rows = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      results.synchronized { results(id) = rows }
    }
    try {
      val b1 = Seq(mk(100L, 2)) // third direction: absent from base
      val b2 = Seq(mk(200L, 2))
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      assert(results.synchronized(results(1L)).contains((200L, 100L)),
        s"trigger-2 probe must retrieve the trigger-1 vector, got ${results.get(1L)}")
      // the deterministic-plane property: serving view == fresh build union
      val cur = StreamingSimilarity.currentLsh(spark, base, statePath)
      val rebuilt = Similarity.buildLshIndex(
        (baseRows ++ b1 ++ b2).toDF("vec_id", "embedding"),
        "vec_id", "embedding", nPlanes = 4, dims = 8)
      assert(cur.buckets.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ==
        rebuilt.buckets.collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    } finally q.stop()
  }

  test("StreamingHygiene.gate: streaming keep set == batch gate == the c08 composition") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val params = (Seq("dup", "crash"), 4.05, 0.35)
    val batchKept = graft.streaming.StreamingHygiene.gate(
        docs, "doc_id", "text", params._1, params._2, params._3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the per-row gate reproduces the aggregate-form composition exactly
    val c08 = Queries.byName("c08_hygiene_gate")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == c08 && batchKept.nonEmpty)
    // and the SAME transform runs unchanged on a stream, trigger-wise
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (h1, h2) = rows.splitAt(rows.size / 2)
    val stream = MemoryStream[(Long, String)](spark)
    val got = scala.collection.mutable.Set[Long]()
    val q = graft.streaming.StreamingHygiene.gate(
        stream.toDF().toDF("doc_id", "text"),
        "doc_id", "text", params._1, params._2, params._3)
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        val ids = b.select("doc_id").collect().map(_.getLong(0))
        got.synchronized { got ++= ids }; ()
      }
      .option("checkpointLocation", tmpDir("hyg-ckpt")).start()
    try {
      stream.addData(h1: _*); q.processAllAvailable()
      stream.addData(h2: _*); q.processAllAvailable()
      assert(got.synchronized(got.toSet) == batchKept)
    } finally q.stop()
  }

  test("StreamingHygiene.gate: opt-in repetition cut drops the boilerplate doc, default leaves c08 untouched") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    // entropy floor relaxed to 3.5 here: the planted doc's repeated-phrase
    // alphabet holds 3.66 bits — ABOVE this floor, so repetition is the
    // only axis that can cut it (the c08-parity test above keeps 4.05)
    val params = (Seq("dup", "crash"), 3.5, 0.35)
    // a lexically diverse doc whose REPETITION is the only defect: many
    // distinct recurring bigrams (t42's axis — the top-gram ratio and ttr
    // both look fine)
    val spammy = (900001L,
      (1 to 6).map(i => s"alpha$i beta$i alpha$i beta$i").mkString(" ") +
        " gamma delta epsilon zeta eta theta iota kappa")
    import spark.implicits._
    val withSpam = docs.unionByName(Seq(spammy).toDF("doc_id", "text"))
    val defaultKept = graft.streaming.StreamingHygiene.gate(
        withSpam, "doc_id", "text", params._1, params._2, params._3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cutKept = graft.streaming.StreamingHygiene.gate(
        withSpam, "doc_id", "text", params._1, params._2, params._3,
        maxDupCoverage = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // default 1.0 never cuts (the c08 parity contract), so the spam
    // passes; the opt-in threshold removes exactly the repetition axis
    assert(defaultKept.contains(900001L))
    assert(!cutKept.contains(900001L))
    // the cut is monotone (only removes) and barely touches the real corpus
    assert(cutKept.subsetOf(defaultKept))
    assert((defaultKept -- cutKept - 900001L).size <= 3)
  }
}
