package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Near-dup operators vs independent brute-force Scala models. */
class DedupSpec extends SparkSpec {

  private def norm(s: String): String =
    s.replaceAll("\\s+", " ").trim.toLowerCase

  private def shingleSet(s: String, k: Int): Set[String] = {
    val n = norm(s)
    val cnt = math.max(n.length - k, 0) + 1
    (0 until cnt).map(i => n.substring(i, math.min(i + k, n.length))).toSet
  }

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    val i = a.intersect(b).size.toDouble
    i / (a.size + b.size - i)
  }

  // A corpus with clear duplicate clusters (true-pair jaccard well above the
  // 0.5 threshold, so the LSH miss probability at 32x2 banding is < 1e-8 and
  // the test is deterministic in practice).
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "the quick brown fox jumps over the lazy dog near the river bank today",
    3L -> "The  QUICK brown fox jumps over the lazy dog near the river bank",
    4L -> "completely unrelated text about spark catalyst expression codegen",
    5L -> "completely unrelated text about spark catalyst expression codegen internals",
    6L -> "nothing in common with anything else whatsoever kumquat zeppelin",
    7L -> "short",
    8L -> "short")

  test("minHashLshPairs == brute-force exact jaccard pairs (threshold 0.5)") {
    import spark.implicits._
    val expect = (for {
      (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
      j = jaccard(shingleSet(ta, 5), shingleSet(tb, 5)) if j >= 0.5
    } yield (ia, ib, BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

    val got = Dedup.minHashLshPairs(
        corpus.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty) // the corpus really has near-dups
  }

  test("minHashLshPairs: stagedAttach emits the IDENTICAL pair set — the " +
      "scratch-bound shape is a plan change, not a semantics change") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    def run(staged: Boolean) = Dedup.minHashLshPairs(
        df, "doc_id", "text", threshold = 0.5, stagedAttach = staged)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (direct, staged) = (run(false), run(true))
    assert(staged === direct && direct.nonEmpty)
    // and in narrow (non-broadcast) mode too — the regime the knob exists
    // for (maxBroadcastDocs = 0 forces the shuffle_hash attaches)
    def runNarrow(st: Boolean) = Dedup.minHashLshPairs(
        df, "doc_id", "text", threshold = 0.5, maxBroadcastDocs = 0L,
        stagedAttach = st)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(runNarrow(true) === runNarrow(false))
    assert(runNarrow(true) === direct)
  }

  test("simHashPairs == brute-force hamming pairs (8x7-bit blocking, maxHamming 7)") {
    import spark.implicits._
    def hash56(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(14), 16)
    }
    def simhash(s: String): Long = {
      val toks = norm(s).split(" ", -1)
      (0 until 56).map { j =>
        val vote = toks.map(t => if (((hash56(t) >> j) & 1L) == 1L) 1 else -1).sum
        if (vote > 0) 1L << j else 0L
      }.sum
    }
    val expect = (for {
      (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
      h = java.lang.Long.bitCount(simhash(ta) ^ simhash(tb)) if h <= 7
    } yield (ia, ib, h)).toSet

    val got = Dedup.simHashPairs(corpus.toDF("doc_id", "text"), "doc_id", "text", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect)
  }

  test("simHashPairs rejects maxHamming above the blocking guarantee") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Dedup.simHashPairs(corpus.toDF("doc_id", "text"), "doc_id", "text", 8)
    }
  }

  test("ngramJaccardPairs == brute-force token jaccard within blocks") {
    import spark.implicits._
    def tokSet(s: String): Set[String] = s.toLowerCase.split("\\s+").toSet
    val expect = (for {
      (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
      i = tokSet(ta).intersect(tokSet(tb)).size.toDouble
      j = i / (tokSet(ta).size + tokSet(tb).size - i) if j >= 0.4
    } yield (ia, ib)).toSet
    val got = Dedup.ngramJaccardPairs(
        corpus.toDF("doc_id", "text"), "doc_id", "text", Seq(lit(1)), 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("sourceOverlap: planted cross-source dups counted once; zero pairs present") {
    import spark.implicits._
    // srcA/srcB share two texts (one differing only in case/whitespace —
    // normalization must unify them); srcC shares nothing; within-source
    // duplicates must NOT inflate the distinct-hash sets
    val df = Seq(
      ("srcA", "shared one"), ("srcA", "shared two"), ("srcA", "only a"),
      ("srcA", "only a"), // within-source dup: srcA has 3 DISTINCT texts
      ("srcB", "Shared   ONE"), ("srcB", "shared two"), ("srcB", "only b"),
      ("srcC", "only c one"), ("srcC", "only c two")
    ).toDF("source", "text")
    val got = Dedup.sourceOverlap(df, "text", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")))
    assert(got(("srcA", "srcB")) == ((2L, 0.5))) // 2 shared / (3 + 3 - 2)
    assert(got(("srcA", "srcC")) == ((0L, 0.0)))
    assert(got(("srcB", "srcC")) == ((0L, 0.0)))
  }

  test("managed variants release their caches (no persistent-RDD leak)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = corpus.toDF("doc_id", "text")
    // two consecutive managed runs, each materialized then closed
    Seq(
      Dedup.minHashLshPairsManaged(df, "doc_id", "text", threshold = 0.5),
      Dedup.ngramJaccardPairsManaged(df, "doc_id", "text", Seq(lit(1)), 0.4)
    ).foreach { m =>
      assert(m.result.count() > 0)
      m.close()
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("UNmanaged pair calls self-release caches after the first action") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = corpus.toDF("doc_id", "text")
    // the plain entry points — no clearCache(), no manual close()
    assert(Dedup.minHashLshPairs(df, "doc_id", "text", threshold = 0.5).count() > 0)
    assert(Dedup.ngramJaccardPairs(df, "doc_id", "text", Seq(lit(1)), 0.4).count() > 0)
    // the release listener fires on the ExecutionListenerBus — drain it
    org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
    // an unrelated query must NOT have been what released them: re-run one
    // unmanaged call, run an unrelated action, and the caches must STILL be
    // alive for the pair frame's first materialization
    val pairs = Dedup.minHashLshPairs(df, "doc_id", "text", threshold = 0.5)
    spark.range(10).count() // unrelated — reads none of the dedup caches
    org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
    val held = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(held.nonEmpty, "caches released by an unrelated query")
    assert(pairs.count() > 0)
    org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"leaked cached RDDs after deferred action: $after")
  }

  test("connectedComponents == union-find model (chains, singletons, merges)") {
    import spark.implicits._
    // a 4-chain (1-2-3-4), a triangle (10,11,12), a 2-clique, singletons
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("a_id", "b_id")
    val nodes = ((1L to 4L) ++ (10L to 12L) ++ Seq(20L, 21L) ++ Seq(30L, 31L))
      .toDF("doc_id")
    // brute-force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    nodes.collect().map(_.getLong(0)).foreach(x => parent(x) = x)
    pairs.collect().foreach { r =>
      val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.map(x => x -> find(x)).toMap
    val got = Dedup.connectedComponents(nodes, "doc_id", pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    assert(got(4L) == 1L && got(12L) == 10L && got(21L) == 20L && got(30L) == 30L)
  }

  test("connectedComponentsBounded == connectedComponents on random graphs, both sides of the bound") {
    import spark.implicits._
    val rng = new scala.util.Random(83)
    val nodes = (0L until 60L).toDF("doc_id")
    val pairs = Seq.fill(45)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter(p => p._1 != p._2).toDF("a_id", "b_id")
    val reference = Dedup.connectedComponents(nodes, "doc_id", pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // under the bound: driver union-find path
    val fast = Dedup.connectedComponentsBounded(
        nodes, "doc_id", pairs, "a_id", "b_id", maxDriverEdges = 100000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == reference)
    // over the bound: must delegate to the distributed fold, same labels
    val slow = Dedup.connectedComponentsBounded(
        nodes, "doc_id", pairs, "a_id", "b_id", maxDriverEdges = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(slow == reference)
    // an edge through an endpoint ABSENT from nodes relays nothing in the
    // distributed fold (its label join drops the edge) — the bounded path
    // must agree, not link 10-5-20 through the phantom node
    val orphanNodes = Seq(10L, 20L).toDF("doc_id")
    val orphanPairs = Seq((10L, 5L), (5L, 20L)).toDF("a_id", "b_id")
    def run(bound: Long) = Dedup.connectedComponentsBounded(
        orphanNodes, "doc_id", orphanPairs, "a_id", "b_id", bound)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(100L) == Map(10L -> 10L, 20L -> 20L))
    assert(run(100L) == run(0L), "both sides of the bound must agree")
    // int-typed pair columns must take the delegate path, not CCE mid-collect
    val intPairs = Seq((1, 2)).toDF("a_id", "b_id")
    val got2 = Dedup.connectedComponentsBounded(
        Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id", intPairs, "a_id", "b_id",
        maxDriverEdges = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("connectedComponents: adversarial chain fails loudly past maxIter, converges within") {
    import spark.implicits._
    // a pure path graph is the diameter worst case for label propagation:
    // the min label crosses one hop per round
    val n = 12
    val chainPairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a_id", "b_id")
    val chainNodes = (1L to n.toLong).toDF("doc_id")
    // too few rounds: must THROW, never return wrong clusters silently
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chainNodes, "doc_id", chainPairs, "a_id", "b_id", maxIter = 3)
    }
    assert(e.getMessage.contains("did not converge"))
    // enough rounds: the whole chain collapses to label 1
    val got = Dedup.connectedComponents(
        chainNodes, "doc_id", chainPairs, "a_id", "b_id", maxIter = n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to n.toLong).map(_ -> 1L).toMap)
  }

  test("connectedComponentsAlternating == union-find model on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val nNodes = 300
    val pairsSeq = (0 until 350).map(_ =>
      (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      .filter { case (a, b) => a != b }
    val pairs = pairsSeq.toDF("a_id", "b_id")
    val nodes = (0L until nNodes.toLong).toDF("doc_id")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairsSeq.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = (0L until nNodes.toLong).map(x => x -> find(x)).toMap
    val got = Dedup.connectedComponentsAlternating(
        nodes, "doc_id", pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("connectedComponentsAlternating collapses a high-diameter chain in O(log² n) rounds") {
    import spark.implicits._
    // diameter-199 path: label propagation needs ~199 rounds (its default
    // maxIter=20 would fail loudly); star contraction needs only a handful
    val n = 200
    val chainPairs = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("a_id", "b_id")
    val chainNodes = (1L to n.toLong).toDF("doc_id")
    val got = Dedup.connectedComponentsAlternating(
        chainNodes, "doc_id", chainPairs, "a_id", "b_id", maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to n.toLong).map(_ -> 1L).toMap)
    // and the propagation variant on the same graph: fails loudly, never wrong
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chainNodes, "doc_id", chainPairs, "a_id", "b_id")
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("byNormalizedText groups case/whitespace variants") {
    import spark.implicits._
    val out = Dedup.byNormalizedText(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("n_dups"), r.getAs[Long]("canonical_id")))
    assert(out.count(_._1 == 2L) == 2) // {1,3} and {7,8}
    assert(out.map(_._1).sum == corpus.size)
  }

  test("chunkDedup == sequential first-occurrence model; rebuild preserves order") {
    import spark.implicits._
    val w = 3
    val docs = Seq(
      1L -> "a b c d e f g",            // chunks: "a b c" "d e f" "g"
      2L -> "a b c d e f g",            // full dup of 1 -> empty
      3L -> "x y z a b c x y z",        // "x y z" kept, "a b c" dup, "x y z" dup of own pos 0
      4L -> "d e f brand new words here",
      5L -> "")                         // empty text -> one "" chunk
    // independent sequential model: scan docs in (id) order, chunks in pos
    // order, keep first global occurrence of each chunk string
    val seen = scala.collection.mutable.Set[String]()
    val want = docs.map { case (id, text) =>
      val toks = text.toLowerCase.trim.replaceAll("\\s+", " ") match {
        case t => t.split(" ", -1).toSeq // "" -> Seq("")
      }
      val chunks = toks.grouped(w).map(_.mkString(" ")).toSeq
      val kept = chunks.filter(c => seen.add(c))
      (id, kept.mkString(" "), kept.size.toLong)
    }
    val got = Dedup.chunkDedup(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === want)
    // layout independence: keeper choice is min(id, pos), not partition order
    val got13 = Dedup.chunkDedup(
        docs.toDF("doc_id", "text").repartition(13), "doc_id", "text", w)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got13 === want)
  }

  test("semanticDedup: drops exactly the smaller-id-neighbor vectors, keeps clusters") {
    import spark.implicits._
    // two well-separated directions; seeds deliberately MISlabel one vector
    // (id 13 seeded into cell 1 but pointing along cell 0's direction) so the
    // nearest-centroid assignment, not the seed, decides its cluster
    def v(x: Double, y: Double): Seq[Float] =
      Seq(x.toFloat, y.toFloat, 0f, 0f)
    val rows = Seq(
      (10L, v(1.0, 0.0), 0),   // cell 0 anchor
      (11L, v(0.99, 0.01), 0), // near-dup of 10 -> dropped
      (12L, v(0.98, 0.02), 0), // near-dup of 10/11 -> dropped
      (20L, v(0.0, 1.0), 1),   // cell 1 anchor
      (21L, v(0.01, 0.99), 1), // near-dup of 20 -> dropped
      (13L, v(1.0, 0.01), 1),  // mislabeled seed; assigns to cell 0, dup of 10
      (30L, v(0.6, 0.55), 1))  // between, similar to neither above threshold? no:
                               // cos with (0,1)=0.676, with (1,0)=0.737 -> dup-ish
    val out = Dedup.semanticDedup(
        rows.toDF("vec_id", "embedding", "label"), "vec_id", "embedding",
        "label", threshold = 0.995)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // θ=0.995: 10~11 (cos≈0.99995), 10~12, 11~12, 20~21 are dups; 13 assigns
    // to cell 0 and cos(13,10)=0.99995 -> dropped; 30 similar to nothing
    assert(out.keySet === Set(10L, 20L, 30L))
    assert(out(10L) === 0)
    assert(out(20L) === 1)
    // determinism under repartition
    val again = Dedup.semanticDedup(
        rows.toDF("vec_id", "embedding", "label").repartition(5), "vec_id",
        "embedding", "label", threshold = 0.995)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(again === out)
  }

  test("assignNearestCentroid: data side never shuffles (broadcast codebook fold)") {
    import spark.implicits._
    val rows = (0 until 200).map(i =>
      (i.toLong, Seq.fill(8)((i % 7).toFloat + 1f), i % 3))
    val out = Dedup.assignNearestCentroid(
      rows.toDF("vec_id", "embedding", "label"), "vec_id", "embedding", "label")
    out.count() // materialize through AQE
    val plan = out.queryExecution.executedPlan.toString
    // the ONLY exchanges allowed are the centroid aggregate's (tiny,
    // cells × dims) and its broadcast; the N-row side must reach the fold
    // without an exchange — no sort, no window, no data-side shuffle
    assert(!plan.contains("Window"), s"assignment must not window:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 2, s"only centroid-side exchanges allowed, got $shuffles:\n$plan")
    assert(out.columns.toSeq === Seq("vec_id", "embedding", "_cell"))
  }

  test("canonicalByCluster: highest score wins, ties to lowest id, no Window") {
    import spark.implicits._
    val labels = Seq(
      (1L, 1L, 10L), (2L, 1L, 30L), (3L, 1L, 30L), // tie at 30 -> keeper 2
      (7L, 7L, 5L),                                 // singleton keeps itself
      (8L, 8L, 0L), (9L, 8L, 0L)                    // all-zero tie -> keeper 8
    ).toDF("id", "cluster", "score")
    val out = Dedup.canonicalByCluster(labels, "id", "cluster", "score")
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got === Map(
      1L -> (2L, false), 2L -> (2L, true), 3L -> (2L, false),
      7L -> (7L, true), 8L -> (8L, true), 9L -> (8L, false)))
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "keeper pick must be an aggregate, not a per-cluster sort")
  }

  test("incrementalDedup: corpus membership + first-in-batch rule") {
    import spark.implicits._
    val corpus = Seq((100L, "seen before"), (101L, "also seen")).toDF("id", "text")
    val batch = Seq(
      (1L, "Seen   before"),  // normalizes onto corpus -> dropped
      (2L, "brand new"),      // first occurrence -> kept
      (3L, "brand new"),      // within-batch dup -> dropped
      (4L, "BRAND NEW"),      // same normalized text -> dropped
      (5L, "unique text")     // kept
    ).toDF("id", "text")
    val out = Dedup.incrementalDedup(batch, corpus, "id", "text")
    val got = out.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("dup_of_corpus"), r.getAs[Boolean]("kept"))).toMap
    assert(got === Map(
      1L -> (true, false), 2L -> (false, true), 3L -> (false, false),
      4L -> (false, false), 5L -> (false, true)))
    // every batch row comes back exactly once
    assert(out.count() === 5)
  }

  test("incrementalNearDupPairs finds batch→corpus near-dups only") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated content about spark catalyst codegen planning"),
      (3L, "another document that shares nothing with the new batch at all")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"), // dup of 1
      (101L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
      (102L, "fresh novel text with zero overlap whatsoever anywhere in sight")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDupPairs(batch, corpus, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(p => (p._1, p._2)).toSet == Set((100L, 1L), (101L, 1L)))
    assert(out.find(_._1 == 100L).get._3 == 1.0)         // exact copy
    val near = out.find(_._1 == 101L).get._3
    assert(near >= 0.5 && near < 1.0)                    // near, not exact
  }

  test("probeNearDup through a built index == one-shot incrementalNearDupPairs") {
    import spark.implicits._
    val rng = new scala.util.Random(61)
    def doc(i: Long, seed: Int) = {
      val r = new scala.util.Random(seed)
      (i, Seq.fill(30)(s"tok${r.nextInt(40)}").mkString(" "))
    }
    val corpus = (0L until 40L).map(i => doc(i, i.toInt)).toDF("doc_id", "text")
    val batch = ((100L until 110L).map(i => doc(i, rng.nextInt())) ++
      Seq(doc(200L, 3), doc(201L, 17))).toDF("doc_id", "text") // 2 planted dups
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val oneShot = rows(Dedup.incrementalNearDupPairs(
      batch, corpus, "doc_id", "text", threshold = 0.5))
    val index = Dedup.buildNearDupIndex(corpus, "doc_id", "text").persisted()
    val probed = rows(Dedup.probeNearDup(index, batch, "doc_id", "text",
      threshold = 0.5))
    assert(probed == oneShot)
    assert(probed.map(p => (p._1, p._2)).intersect(
      Set((200L, 3L), (201L, 17L))).size == 2) // planted dups found
    // save/load round-trip probes identically through the bucketed tables.
    // A previous JVM's run may have left the managed location behind with
    // no catalog entry — drop both so Overwrite can't hit
    // LOCATION_ALREADY_EXISTS (the saveIvfIndex spec's pattern).
    Seq("dedupspec_ndi_prepped", "dedupspec_ndi_meta").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Dedup.saveNearDupIndex(index, "dedupspec_ndi", numBuckets = 4)
    val loaded = Dedup.loadNearDupIndex(spark, "dedupspec_ndi")
    assert(loaded.shingleK == index.shingleK && loaded.bands == index.bands)
    assert(rows(Dedup.probeNearDup(loaded, batch, "doc_id", "text",
      threshold = 0.5)) == oneShot)
    // the bulk-batch fallback (nothing batch-sided broadcasts) must agree,
    // both in-memory and through the bucketed tables
    assert(rows(Dedup.probeNearDup(index, batch, "doc_id", "text",
      threshold = 0.5, broadcastCandidates = false)) == oneShot)
    assert(rows(Dedup.probeNearDup(loaded, batch, "doc_id", "text",
      threshold = 0.5, broadcastCandidates = false)) == oneShot)
    index.unpersisted()
  }

  test("StreamingDedup: per-batch near-dup probe == batch probe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def doc(i: Long, seed: Int) = {
      val r = new scala.util.Random(seed)
      (i, Seq.fill(30)(s"tok${r.nextInt(40)}").mkString(" "))
    }
    val corpus = (0L until 30L).map(i => doc(i, i.toInt)).toDF("doc_id", "text")
    val index = Dedup.buildNearDupIndex(corpus, "doc_id", "text").persisted()
    val queries = Seq(doc(300L, 5), doc(301L, 999), doc(302L, 12))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val stream = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.StreamingDedup.attachNearDup(
      stream.toDF().toDF("doc_id", "text"), index, "doc_id", "text",
      threshold = 0.5, checkpoint = tmpDir("neardup-ckpt")) { (pairs, _) =>
      got.synchronized {
        got ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
    }
    try {
      stream.addData(queries.take(2))
      q.processAllAvailable()
      stream.addData(queries.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val expect = Dedup.probeNearDup(
        index, queries.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.synchronized(got.toSet) == expect)
    assert(expect.map(_._1).intersect(Set(300L, 302L)).size == 2) // dups of 5, 12
    index.unpersisted()
  }

  test("semanticDecontaminate drops near-benchmark vectors, keeps the rest") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),   // identical to bench -> dropped
      (2L, Seq(0.9, 0.1, 0.0, 0.0)),   // near bench -> dropped
      (3L, Seq(0.0, 0.0, 1.0, 0.0)),   // orthogonal -> kept
      (4L, Seq(0.0, 0.0, 0.0, -1.0))   // opposite-ish -> kept
    ).toDF("vec_id", "embedding")
    val bench = Seq((100L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val out = Dedup.semanticDecontaminate(
        corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(3L, 4L))
    assert(out(3L) < 0.8 && out(4L) < 0.8)
    // empty benchmark set keeps everything, audit score -1
    val none = Dedup.semanticDecontaminate(
        corpus, "vec_id", "embedding",
        bench.filter(col("vec_id") < 0), "embedding", threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(none.keySet == Set(1L, 2L, 3L, 4L))
    assert(none.values.forall(_ == -1.0))
    // a zero benchmark vector (cosine NaN) must not poison the fold and
    // silently drop the whole corpus; a zero corpus vector is kept
    val zbench = Seq((100L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val zed = Dedup.semanticDecontaminate(
        corpus, "vec_id", "embedding", zbench, "embedding", threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(zed.keySet == Set(1L, 2L, 3L, 4L) && zed.values.forall(_ == -1.0))
    val zcorp = Dedup.semanticDecontaminate(
        corpus.union(Seq((9L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")),
        "vec_id", "embedding", bench, "embedding", threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(zcorp.contains(9L) && zcorp(9L) == -1.0)
  }

  test("editDistancePairs: blocked Levenshtein pairs with exact distances") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world example"),
      (2L, "hello  World exAmple"), // normalizes identically -> dist 0
      (3L, "hello world exemplar"), // dist 3 from doc 1
      (4L, "hello continents far away from the rest entirely"), // same block, too far
      (5L, "jello world example")   // dist 1 from doc 1 but different prefix block
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // doc 4 fails the length band before any DP; doc 5 is the documented
    // blocking miss (edit inside the prefix)
    assert(got == Map((1L, 2L) -> 0, (1L, 3L) -> 3, (2L, 3L) -> 3))
  }

  test("editDistancePairs: length band excludes before the DP, threshold after") {
    import spark.implicits._
    // one "ab" prefix block: doc 2 fails the length band (|4-16| > 3)
    // before any DP; doc 5 survives the band but its distances (4) exceed
    // maxDist and are thresholded out; 1/3/4 pairwise at exactly dist 3
    val docs = Seq(
      (1L, "abcd"), (2L, "abcdefghijklmnop"), (3L, "abzzz"),
      (4L, "abyyy"), (5L, "abqqqq")
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
        maxDist = 3, prefixLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == Map((1L, 3L) -> 3, (1L, 4L) -> 3, (3L, 4L) -> 3))
  }

  test("editDistancePairs: suffix blocking recovers in-prefix edits, including shifts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world example"),
      (2L, "jello world example"),  // substitution at position 1
      (3L, "xhello world example"), // insertion at front — shifts everything
      (4L, "sello world sample")    // edits at BOTH ends: still missed
    ).toDF("doc_id", "text")
    // prefix-only: every pair with an in-prefix edit is the documented miss
    val prefixOnly = Dedup.editDistancePairs(docs, "doc_id", "text",
        maxDist = 4, prefixLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefixOnly == Set.empty)
    // + suffix block: the trailing 8 chars are edit-free for docs 1-3, so
    // those pairs are recovered with exact distances; doc 4 edits both
    // ends and remains outside either block (the documented residual)
    val both = Dedup.editDistancePairs(docs, "doc_id", "text",
        maxDist = 4, prefixLen = 4, suffixLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(both == Map((1L, 2L) -> 1, (1L, 3L) -> 1, (2L, 3L) -> 2))
    // each recovered pair ran ONE DP: dist values are exact, and a pair
    // proposed by both blocks (none here) dedupes before the DP
  }

  test("clusterSizeHistogram folds a component assignment into the size table") {
    import spark.implicits._
    // clusters: {1,2,3}, {4,5}, {6}, {7} → sizes 3:1, 2:1, 1:2
    val assign = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L), (7L, 7L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.clusterSizeHistogram(assign, "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 2L -> 1L, 1L -> 2L))
  }

  test("duplicationWeights: size^-alpha per member; cluster mass = size^(1-alpha)") {
    import spark.implicits._
    val assign = Seq(
      (1L, "c1"), (2L, "c1"), (3L, "c1"), (4L, "c1"), (5L, "c2"), (6L, "c3"))
      .toDF("doc_id", "cluster")
    val w1 = Dedup.duplicationWeights(assign, "doc_id", "cluster")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(w1(1L) == ((4L, 0.25)) && w1(4L) == ((4L, 0.25)))
    assert(w1(5L) == ((1L, 1.0)) && w1(6L) == ((1L, 1.0)))
    // alpha=1: every cluster contributes total weight 1 regardless of size
    assert(w1.values.map(_._2).sum == 3.0)
    // alpha=0.5: the 4-cluster keeps sqrt(4)=2 docs' worth of mass
    val w05 = Dedup.duplicationWeights(assign, "doc_id", "cluster", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(w05(1L) == 0.5 && w05(5L) == 1.0)
    // alpha=0 degenerates to no dedup (every member keeps weight 1)
    val w0 = Dedup.duplicationWeights(assign, "doc_id", "cluster", alpha = 0.0)
      .collect().map(_.getDouble(3))
    assert(w0.forall(_ == 1.0))
    // NULL cluster keys are a REAL cluster (null-text docs hash to null
    // together — indistinguishable content): members weighted, not dropped
    val withNull = assign.union(
      Seq((7L, null: String), (8L, null: String)).toDF("doc_id", "cluster"))
    val wn = Dedup.duplicationWeights(withNull, "doc_id", "cluster")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(wn.size == 8)
    assert(wn(7L) == ((2L, 0.5)) && wn(8L) == ((2L, 0.5)))
  }

  test("pairSetMetrics: canonicalization, duplicates collapsed, PR/F1 hand model") {
    import spark.implicits._
    // pred: (1,2) twice + reversed, (3,4), (5,6) -> 3 canonical pairs
    val pred = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L), (5L, 6L))
      .toDF("a_id", "b_id")
    // truth: (2,1), (3,4), (7,8), (9,10) -> 4 canonical pairs, 2 shared
    val truth = Seq((2L, 1L), (3L, 4L), (7L, 8L), (9L, 10L))
      .toDF("a_id", "b_id")
    val r = Dedup.pairSetMetrics(pred, truth, "a_id", "b_id").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 4L, 2L)))
    val (p, rec) = (2.0 / 3.0, 2.0 / 4.0)
    def rd(x: Double) = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == rd(p) && r.getDouble(4) == rd(rec))
    assert(r.getDouble(5) == rd(2 * p * rec / (p + rec)))
    // disjoint sets: zero intersection -> F1 NULL (no evidence), PR zero
    val none = Dedup.pairSetMetrics(
      Seq((1L, 2L)).toDF("a_id", "b_id"),
      Seq((3L, 4L)).toDF("a_id", "b_id"), "a_id", "b_id").collect().head
    assert(none.getLong(2) == 0L && none.getDouble(3) == 0.0 && none.isNullAt(5))
  }

  test("containmentPairs: finds the small-doc-in-big-doc pair Jaccard misses") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"), // fully contained in doc 2
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "unrelated words entirely different content here")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", 0.9, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 1L, 1.0)))
    // sanity: the SAME pair is invisible to Jaccard at any useful threshold
    // (3 shared / 10 union = 0.3 — and the length-ratio prune rejects it)
    val jacc = Dedup.ngramJaccardPairs(df, "doc_id", "text", Seq(lit(1)), 0.5)
    assert(jacc.count() == 0)
  }

  test("containmentPairs: recall caveat — pairs sharing only COMMON tokens are missed") {
    import spark.implicits._
    // "common" appears in every doc (df=4 > maxDf=3): no rare token shared
    val df = Seq(
      (1L, "common shared"), (2L, "common shared extra1 extra2"),
      (3L, "common other1"), (4L, "common other2")
    ).toDF("doc_id", "text")
    // maxDf=3 excludes "common" (df 4) but keeps "shared" (df 2) -> 1-2 pair found
    val got3 = Dedup.containmentPairs(df, "doc_id", "text", 0.9, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got3.toSeq == Seq((1L, 2L)))
    // maxDf=2 ... still keeps "shared" (df 2); drop to a corpus where the
    // only shared token is common-everywhere: nothing pairs
    val allCommon = Seq(
      (1L, "common"), (2L, "common a b"), (3L, "common c"), (4L, "common d")
    ).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(allCommon, "doc_id", "text", 0.5, maxDf = 3L)
      .count() == 0)
  }

  test("containmentPairs: surrounding whitespace never mints tokens; whitespace-only texts never pair") {
    import spark.implicits._
    // doc 2 = doc 1's tokens with leading/trailing/extra whitespace: token
    // sets must be IDENTICAL (containment 1.0, |A| = |B| → lower id
    // contained), not inflated by a hashed "" token
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "  alpha beta gamma  "),
      (3L, "   "), (4L, " \t "), (5L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", 0.9, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 1L, 1.0)),
      s"whitespace-only docs 3-5 must not tokenize or pair, got ${got.toSeq}")
  }

  test("entityPairs: per-field sims and weighted score match the hand model; blocking and banding are honest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val recs = Seq(
      (1L, "acme corp", "B1", 10L),
      (2L, "acme corpp", "B1", 10L),   // 1-char insertion of record 1
      (3L, "zeta", "B1", 10L),         // different first char -> other block
      (5L, "bcme corp", "B1", 20L),    // near record 1 but blocked apart
      (6L, "x y", null, 5L),           // null brand pair: null-safe exact
      (7L, "x y", null, 5L),
      (8L, "q" + "a" * 29, "B9", 1L),  // 29 edits apart: past the band
      (9L, "q" + "b" * 29, "B9", 1L)
    ).toDF("id", "name", "brand", "size")
    def run(th: Double) = Dedup.entityPairs(
      recs, "id", Seq(substring(col("name"), 1, 1)),
      editFields = Seq("name" -> 0.4),
      jaccardFields = Seq("name" -> 0.2),
      exactFields = Seq("brand" -> 0.2),
      closeFields = Seq("size" -> 0.2),
      threshold = th, maxEdit = 5)
    val all = run(0.0).collect().map(r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    // block 'a': only (1,2); 3 blocks under 'z', 5 under 'b' (the PRICED
    // blocking miss); block 'x': (6,7); block 'q': (8,9), whose 29 edits
    // exceed the band, zeroing the edit sim
    assert(all.keySet === Set((1L, 2L), (6L, 7L), (8L, 9L)))
    val (e12, j12, x12, c12v, s12) = all((1L, 2L))
    assert(e12 === 0.9)         // lev 1 / maxlen 10
    assert(j12 === 0.333333)    // {acme,corp} vs {acme,corpp}
    assert(x12 === 1.0)
    assert(c12v === 1.0)
    assert(s12 === 0.826667)    // .4*.9 + .2*.333333 + .2 + .2, 6dp
    val (e67, j67, x67, c67, s67) = all((6L, 7L))
    assert((e67, j67, x67, c67, s67) === ((1.0, 1.0, 1.0, 1.0, 1.0))) // null<=>null brand matches
    val (e89, _, _, _, _) = all((8L, 9L))
    assert(e89 === 0.0)         // 29 edits > maxEdit 5: banded to zero
    // threshold branches on the ROUNDED score: >= keeps the exact value
    assert(run(0.826667).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L), (6L, 7L)))
    assert(run(0.826668).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((6L, 7L)))
  }
}
