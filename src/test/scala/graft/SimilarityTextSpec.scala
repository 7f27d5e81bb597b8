package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{stableRound, Similarity, TextAnalysis}

/** Similarity top-k vs a Scala model; text-analysis goldens. */
class SimilarityTextSpec extends SparkSpec {

  test("bruteForceTopK == Scala cosine model (ties broken by id)") {
    import spark.implicits._
    val rng = new Random(21)
    val vecs = (0L until 50L).map(i => (i, Seq.fill(16)(rng.nextDouble() - 0.5)))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = vecs.find(_._1 == 7L).get._2
    val expect = vecs.filter(_._1 != 7L)
      .map { case (i, v) => (i, cos(v, q)) }
      .sortBy { case (i, s) => (-s, i) }
      .take(5).map(_._1)
    val got = Similarity.bruteForceTopK(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", 7L, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expect)
  }

  test("ivfTopK probes only nProbe cells but returns exact ranking within them") {
    import spark.implicits._
    val rng = new Random(22)
    // two well-separated clusters; query in cluster 0
    val vecs = (0L until 40L).map { i =>
      val cell = (i % 2).toInt
      val base = if (cell == 0) 1.0 else -1.0
      (i, Seq.fill(8)(base + rng.nextGaussian() * 0.01), cell.toLong)
    }
    val got = Similarity.ivfTopKOneShot(
        vecs.toDF("vec_id", "embedding", "cell"), "vec_id", "embedding", "cell",
        0L, 3, nProbe = 1)
      .collect().map(_.getLong(0))
    assert(got.length == 3)
    assert(got.forall(_ % 2 == 0)) // all from the query's cluster
  }

  test("probeIvf batch == per-query ivfTopK through one shared index") {
    import spark.implicits._
    val rng = new Random(31)
    val vecs = (0L until 80L).map { i =>
      val cell = (i % 4).toInt
      (i, Seq.tabulate(8)(d => (if (d == cell * 2) 1.0 else 0.0) +
        rng.nextGaussian() * 0.05), cell.toLong)
    }
    val df = vecs.toDF("vec_id", "embedding", "cell")
    val index = Similarity.buildIvfIndex(df, "vec_id", "embedding", col("cell"))
      .persisted()
    val queries = df.filter(col("vec_id") % 10 === 0)
    val batch = Similarity.probeIvf(
        index, queries, "vec_id", "embedding", k = 3, nProbe = 2,
        excludeSelf = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val single = (0L until 80L by 10).flatMap { q =>
      Similarity.ivfTopKOneShot(df, "vec_id", "embedding", "cell", q, 3, nProbe = 2)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy { case (id, sim) => (-sim, id) }
        .zipWithIndex
        .map { case ((id, sim), i) => (q, (i + 1).toLong, id, sim) }
    }.toSet
    assert(batch === single)
    index.unpersisted()
  }

  test("tuneNProbe: doubling search stops at the first width reaching target recall") {
    import spark.implicits._
    // deterministic construction, no RNG: the query (id 0) lives in cell 0
    // with two same-cell neighbors, but its single BEST neighbor (id 10)
    // is a stray planted in cell 1, whose centroid is e1-dominated. Cell
    // ranking for the query is therefore cell0 > cell1 > rest, and exact
    // top-3 = {10, 1, 2}: nProbe=1 recovers 2/3, nProbe=2 recovers 3/3.
    val e = (i: Int) => Seq.tabulate(4)(d => if (d == i) 1.0 else 0.0)
    val vecs =
      Seq(
        (0L, e(0), 0L),                            // the query
        (1L, Seq(0.9, 0.1, 0.0, 0.0), 0L),
        (2L, Seq(0.8, 0.2, 0.0, 0.0), 0L),
        (10L, Seq(0.99, 0.01, 0.0, 0.0), 1L)) ++   // stray best neighbor
        (11L to 19L).map(i => (i, Seq(0.01, 1.0, 0.0, 0.0), 1L)) ++
        (20L to 29L).map(i => (i, e(2), 2L)) ++
        (30L to 39L).map(i => (i, e(3), 3L))
    val df = vecs.toDF("vec_id", "embedding", "cell")
    val index = Similarity.buildIvfIndex(df, "vec_id", "embedding", col("cell"))
      .persisted()
    val sample = df.filter(col("vec_id") === 0L)
    val (nProbe, recall) = Similarity.tuneNProbe(
      index, sample, "vec_id", "embedding", k = 3, targetRecall = 0.95,
      maxNProbe = 8, excludeSelf = true)
    assert(nProbe == 2, s"one cell misses the stray, two recover it: $nProbe")
    assert(recall == 1.0)
    // capped below target: the achieved recall is reported, not thrown
    val (nCapped, rCapped) = Similarity.tuneNProbe(
      index, sample, "vec_id", "embedding", k = 3, targetRecall = 1.0,
      maxNProbe = 1, excludeSelf = true)
    assert(nCapped == 1)
    assert(math.abs(rCapped - 2.0 / 3.0) < 1e-5, s"got $rCapped")
    index.unpersisted()
  }

  test("nProbe operating curve: recall non-decreasing in nProbe, exact 1.0 at full probe width") {
    import spark.implicits._
    // same deterministic fixture as the tuneNProbe test: the stray best
    // neighbor in cell 1 makes nProbe=1 strictly lossy
    val e = (i: Int) => Seq.tabulate(4)(d => if (d == i) 1.0 else 0.0)
    val vecs =
      Seq(
        (0L, e(0), 0L),
        (1L, Seq(0.9, 0.1, 0.0, 0.0), 0L),
        (2L, Seq(0.8, 0.2, 0.0, 0.0), 0L),
        (10L, Seq(0.99, 0.01, 0.0, 0.0), 1L)) ++
        (11L to 19L).map(i => (i, Seq(0.01, 1.0, 0.0, 0.0), 1L)) ++
        (20L to 29L).map(i => (i, e(2), 2L)) ++
        (30L to 39L).map(i => (i, e(3), 3L))
    val df = vecs.toDF("vec_id", "embedding", "cell")
    val index = Similarity.buildIvfIndex(df, "vec_id", "embedding", col("cell"))
      .persisted()
    val sample = df.filter(col("vec_id") === 0L)
    val exact = Similarity.bruteForceBatch(
      df, "vec_id", "embedding", sample, "vec_id", "embedding",
      k = 3, excludeSelf = true)
    def meanRecall(np: Int): Double =
      Similarity.recallAtK(
        exact,
        Similarity.probeIvf(index, sample, "vec_id", "embedding", k = 3,
          nProbe = np, excludeSelf = true, guardBroadcast = false),
        "vec_id")
        .agg(org.apache.spark.sql.functions.avg("recall")).head().getDouble(0)
    val curve = Seq(1, 2, 4).map(meanRecall)
    assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
      s"probed sets are nested, recall must be monotone: $curve")
    assert(math.abs(curve.head - 2.0 / 3.0) < 1e-6, "one cell misses the stray")
    assert(curve(1) === 1.0)
    assert(meanRecall(4) === 1.0, "full probe width IS the exact scan")
    index.unpersisted()
  }

  test("probeLsh batch == per-query lshTopK through one shared index") {
    import spark.implicits._
    val rng = new Random(33)
    val vecs = (0L until 60L).map(i => (i, Seq.fill(16)(rng.nextDouble() - 0.5)))
    val df = vecs.toDF("vec_id", "embedding")
    val index = Similarity.buildLshIndex(df, "vec_id", "embedding",
      nPlanes = 4, dims = 16).persisted()
    val queries = df.filter(col("vec_id") < 5)
    val batch = Similarity.probeLsh(
        index, queries, "vec_id", "embedding", k = 3, excludeSelf = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val single = (0L until 5L).flatMap { q =>
      Similarity.lshTopKOneShot(df, "vec_id", "embedding", q, 3, nPlanes = 4, dims = 16)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy { case (id, sim) => (-sim, id) }
        .zipWithIndex
        .map { case ((id, sim), i) => (q, (i + 1).toLong, id, sim) }
    }.toSet
    assert(batch === single)
    index.unpersisted()
  }

  test("extendIvfIndex: frozen codebook, appended rows probeable, no refit") {
    import spark.implicits._
    val rng = new Random(41)
    // two well-separated clusters; base corpus holds both labels
    def mk(ids: Seq[Long]) = ids.map { i =>
      val cell = (i % 2).toInt
      (i, Seq.tabulate(8)(d => (if (d == cell * 4) 1.0 else 0.0) +
        rng.nextGaussian() * 0.03), cell.toLong)
    }
    val base = mk(0L until 40L).toDF("vec_id", "embedding", "cell")
    val index = Similarity.buildIvfIndex(base, "vec_id", "embedding", col("cell"))
    val newRows = mk(100L until 120L).toDF("vec_id", "embedding", "cell")
      .drop("cell") // arrives unlabeled — the codebook assigns it
    val extended = Similarity.extendIvfIndex(index, newRows)
    // codebook unchanged (frozen), corpus grew by exactly the new rows
    assert(extended.codebook.collect().toSet === index.codebook.collect().toSet)
    assert(extended.assigned.count() === 60)
    // every appended row landed in one of the codebook's cells — and in the
    // RIGHT one (clusters are far apart)
    val newCells = extended.assigned.filter(col("vec_id") >= 100L)
      .select("vec_id", "_cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    newCells.foreach { case (id, cell) => assert(cell === id % 2, s"vec $id") }
    // a probe finds appended vectors as neighbors of their cluster
    val hit = Similarity.probeIvf(
        extended, base.filter(col("vec_id") === 0L), "vec_id", "embedding",
        k = 50, nProbe = 1, excludeSelf = true)
      .filter(col("vec_id") >= 100L).count()
    assert(hit > 0, "appended vectors must be retrievable")
  }

  test("extendLshIndex == buildLshIndex over the union (deterministic planes)") {
    import spark.implicits._
    val rng = new Random(43)
    val all = (0L until 50L).map(i => (i, Seq.fill(16)(rng.nextDouble() - 0.5)))
    val df = all.toDF("vec_id", "embedding")
    val part = Similarity.buildLshIndex(
      df.filter(col("vec_id") < 30L), "vec_id", "embedding", nPlanes = 4, dims = 16)
    val extended = Similarity.extendLshIndex(part, df.filter(col("vec_id") >= 30L))
    val full = Similarity.buildLshIndex(df, "vec_id", "embedding", nPlanes = 4, dims = 16)
    assert(
      extended.buckets.select("vec_id", "_bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet ===
      full.buckets.select("vec_id", "_bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("StreamingSimilarity: per-batch probe over a prebuilt index == batch probe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rng = new Random(47)
    val corpus = (0L until 60L).map { i =>
      val cell = (i % 3).toInt
      (i, Seq.tabulate(9)(d => (if (d == cell * 3) 1.0 else 0.0) +
        rng.nextGaussian() * 0.05), cell.toLong)
    }.toDF("vec_id", "embedding", "cell")
    val index = Similarity.buildIvfIndex(corpus, "vec_id", "embedding", col("cell"))
      .persisted()
    val queryVecs = (200L until 206L).map { i =>
      val cell = (i % 3).toInt
      (i, Seq.tabulate(9)(d => (if (d == cell * 3) 1.0 else 0.0) +
        rng.nextGaussian() * 0.05))
    }
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val stream = MemoryStream[(Long, Seq[Double])](spark)
    val q = graft.streaming.StreamingSimilarity.attachIvf(
      stream.toDF().toDF("q_vec_id", "q_embedding"), index,
      "q_vec_id", "q_embedding", k = 4, nProbe = 1,
      checkpoint = tmpDir("sim-ckpt")) { (probe, _) =>
      got.synchronized {
        got ++= probe.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }
    }
    try {
      stream.addData(queryVecs.take(3))
      q.processAllAvailable()
      stream.addData(queryVecs.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val expect = Similarity.probeIvf(
        index, queryVecs.toDF("q_vec_id", "q_embedding"),
        "q_vec_id", "q_embedding", k = 4, nProbe = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.synchronized(got.toSet) === expect)
    assert(expect.map(_._1) === queryVecs.map(_._1).toSet) // every query answered
    index.unpersisted()
  }

  test("attachSq8Ivf: streaming probes of the compressed index == batch probeSq8Ivf") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val rng = new Random(35)
    val corpus = (0L until 90L).map { i =>
      val c = (i % 3).toInt
      (i, Seq.tabulate(6)(d => (if (d == c * 2) 1.0 else 0.0) +
        rng.nextGaussian() * 0.05), c.toLong)
    }
    val index = Similarity.buildSq8IvfIndex(
      corpus.toDF("vec_id", "embedding", "cell"),
      "vec_id", "embedding", col("cell")).persisted()
    val queryVecs = corpus.take(5).map { case (i, v, _) => (i + 1000L, v) }
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val stream = MemoryStream[(Long, Seq[Double])](spark)
    val q = graft.streaming.StreamingSimilarity.attachSq8Ivf(
      stream.toDF().toDF("q_vec_id", "q_embedding"), index,
      "q_vec_id", "q_embedding", k = 4, nProbe = 1,
      checkpoint = tmpDir("sq8-ckpt")) { (probe, _) =>
      got.synchronized {
        got ++= probe.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }
    }
    try {
      stream.addData(queryVecs.take(2))
      q.processAllAvailable()
      stream.addData(queryVecs.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val expect = Similarity.probeSq8Ivf(
        index, queryVecs.toDF("q_vec_id", "q_embedding"),
        "q_vec_id", "q_embedding", k = 4, nProbe = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.synchronized(got.toSet) === expect)
    assert(expect.map(_._1) === queryVecs.map(_._1).toSet)
    index.unpersisted()
  }

  test("signPackExpr: hand-modeled words; negatives clear bits; 32-bit word split") {
    import spark.implicits._
    // 34 dims → 2 words; dims 0,2,33 positive, rest negative
    val v = Seq.tabulate(34)(i => if (Set(0, 2, 33)(i)) 1.0 else -1.0)
    val got = Seq((1L, v)).toDF("vec_id", "embedding")
      .select(Similarity.signPackExpr(col("embedding"), 34).as("b"))
      .collect().head.getSeq[Long](0)
    assert(got == Seq((1L | (1L << 2)), (1L << 1))) // dim 33 = bit 1 of word 1
    // zero counts as positive (>= 0)
    val z = Seq((1L, Seq(0.0, -0.5))).toDF("vec_id", "embedding")
      .select(Similarity.signPackExpr(col("embedding"), 2).as("b"))
      .collect().head.getSeq[Long](0)
    assert(z == Seq(1L))
  }

  test("probeSign == Scala Hamming model; hamming is symmetric and integral") {
    import spark.implicits._
    val rng = new Random(37)
    val vecs = (0L until 70L).map(i => (i, Seq.fill(40)(rng.nextDouble() - 0.5)))
    val df = vecs.toDF("vec_id", "embedding")
    val index = Similarity.buildSignIndex(df, "vec_id", "embedding", 40)
    def bits(v: Seq[Double]): Seq[Boolean] = v.map(_ >= 0)
    def ham(a: Seq[Double], b: Seq[Double]): Long =
      bits(a).zip(bits(b)).count { case (x, y) => x != y }.toLong
    val q = vecs.find(_._1 == 3L).get._2
    val expect = vecs.filter(_._1 != 3L)
      .map { case (i, v) => (i, ham(v, q)) }
      .sortBy { case (i, h) => (h, i) }.take(6)
    val got = Similarity.probeSign(
        index, df.filter(col("vec_id") === 3L), "vec_id", "embedding",
        k = 6, excludeSelf = true, guardBroadcast = false)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("c03 funnel report: stages partition the corpus and label by FIRST drop") {
    val report = Queries.byName("c03_funnel_report")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    // every document lands in exactly one stage — the report conserves the
    // corpus (a doc both low-quality AND contaminated must count once,
    // under its FIRST drop)
    assert(report.values.sum == total, s"report $report must sum to $total")
    assert(report.keySet.subsetOf(Set(
      "1_quality", "2_duplicate", "3_benchmark_holdout", "4_contaminated", "5_kept")))
    // the c01 pipeline's survivors are exactly the funnel's kept bucket
    // (c01 continues into packing, so compare against its input stage)
    assert(report.getOrElse("5_kept", 0L) > 0L)
  }

  test("rerankTopK degenerates to exact brute force when the funnel is not selective") {
    import spark.implicits._
    val rng = new Random(38)
    val vecs = (0L until 60L).map(i => (i, Seq.fill(12)(rng.nextDouble() - 0.5)))
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 4)
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // prefix = all dims and shortlist = corpus size → both stages exact
    val funnel = Similarity.rerankTopK(
      df, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, prefixDims = 12, shortlist = 60, guardBroadcast = false)
    val brute = Similarity.bruteForceBatch(
      df, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, excludeSelf = true)
    assert(canon(funnel) == canon(brute))
  }

  test("sign-probe shortlist + rerankExact: the funnel composition recovers planted neighbors") {
    import spark.implicits._
    val rng = new Random(39)
    // clusters along axes: sign pattern identifies the cluster, exact cosine
    // ranks within it
    val vecs = (0L until 90L).map { i =>
      val c = (i % 3).toInt
      (i, Seq.tabulate(12)(d =>
        (if (d / 4 == c) 1.0 else -1.0) * (0.5 + rng.nextDouble())))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 3)
    val index = Similarity.buildSignIndex(df, "vec_id", "embedding", 12)
    val short = Similarity.probeSign(
        index, queries, "vec_id", "embedding", k = 40,
        excludeSelf = true, guardBroadcast = false)
      .select(col("q_id").as("_q_id"), col("vec_id"))
    val got = Similarity.rerankExact(
      df, "vec_id", "embedding", short, queries, "vec_id", "embedding", k = 5)
    // every survivor comes from the query's own cluster
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall { case (q, id) => id % 3 == q % 3 })
  }

  test("probeLshMulti: nTables=1 == probeLsh; no cross-table duplicate pairs") {
    import spark.implicits._
    val rng = new Random(53)
    val vecs = (0L until 80L).map(i => (i, Seq.fill(16)(rng.nextDouble() - 0.5)))
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 5)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // one table over planes [0, n) is definitionally the single-table index
    val one = Similarity.buildLshIndexMulti(df, "vec_id", "embedding",
      nTables = 1, nPlanes = 4, dims = 16)
    val single = Similarity.buildLshIndex(df, "vec_id", "embedding",
      nPlanes = 4, dims = 16)
    assert(
      rows(Similarity.probeLshMulti(one, queries, "vec_id", "embedding", 5,
        excludeSelf = true)) ===
      rows(Similarity.probeLsh(single, queries, "vec_id", "embedding", 5,
        excludeSelf = true)))
    // multi-table: candidate sets only grow (OR-amplification), and a pair
    // matching in several tables must appear ONCE (first-match dedup)
    val multi = Similarity.buildLshIndexMulti(df, "vec_id", "embedding",
      nTables = 4, nPlanes = 4, dims = 16)
    val out = Similarity.probeLshMulti(multi, queries, "vec_id", "embedding",
      k = 100, excludeSelf = true).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.length === out.distinct.length, "duplicate (q, id) pair emitted")
    val singleCount = Similarity.probeLsh(single, queries, "vec_id", "embedding",
      k = 100, excludeSelf = true).count()
    assert(out.length >= singleCount, "multi-table candidates must be a superset")
  }

  test("bruteForceBatch == per-query bruteForceTopK") {
    import spark.implicits._
    val rng = new Random(51)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(12)(rng.nextDouble() - 0.5)))
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 4)
    val batch = Similarity.bruteForceBatch(
        df, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 5, excludeSelf = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val single = (0L until 4L).flatMap { q =>
      Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 5)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy { case (id, sim) => (-sim, id) }
        .zipWithIndex
        .map { case ((id, sim), i) => (q, (i + 1).toLong, id, sim) }
    }.toSet
    assert(batch === single)
  }

  test("buildIvfIndexAuto: learned cells, nProbe=nCells probe is exact") {
    import spark.implicits._
    val rng = new Random(35)
    val vecs = (0L until 60L).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i, Seq.fill(8)(sign + rng.nextGaussian() * 0.05))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val index = Similarity.buildIvfIndexAuto(df, "vec_id", "embedding",
      nCells = 2, iters = 2)
    // every vector assigned to one of the learned cells
    assert(index.assigned.count() === 60)
    assert(index.codebook.count() <= 2)
    // probing ALL cells makes IVF exact -> must equal brute force
    val got = Similarity.probeIvf(
        index, df.filter(col("vec_id") === 4L), "vec_id", "embedding",
        k = 5, nProbe = 2, excludeSelf = true)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", 4L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === brute)
  }

  test("kmeansClusters: separates antipodal clusters, reaches a fixed point, deterministic") {
    import spark.implicits._
    val rng = new Random(36)
    val vecs = (0L until 60L).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i, Seq.fill(8)(sign + rng.nextGaussian() * 0.05))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.kmeansClusters(df, "vec_id", "embedding", k = 2, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === 60)
    assert(got.values.toSet.subsetOf(Set(0L, 1L)))
    // clean antipodal data: the fit must recover the sign split exactly
    // (each cluster pure, both present)
    val bySign = got.groupBy { case (id, _) => id % 2 }.view
      .mapValues(_.values.toSet).toMap
    assert(bySign(0L).size === 1 && bySign(1L).size === 1)
    assert(bySign(0L) != bySign(1L))
    // fixed point: a 5th E-step changes nothing
    val more = Similarity.kmeansClusters(df, "vec_id", "embedding", k = 2, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(more === got)
    // deterministic: a rerun is bit-identical
    val again = Similarity.kmeansClusters(df, "vec_id", "embedding", k = 2, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again === got)
  }

  test("saveIvfIndex/loadIvfIndex: probe through the bucketed tables is identical") {
    import spark.implicits._
    val rng = new Random(37)
    val vecs = (0L until 40L).map { i =>
      (i, Seq.fill(8)(rng.nextDouble() - 0.5), (i % 3).toLong)
    }
    val df = vecs.toDF("vec_id", "embedding", "cell")
    val index = Similarity.buildIvfIndex(df, "vec_id", "embedding", col("cell"))
    // a previous JVM's run may have left the managed location behind with no
    // catalog entry — drop both so Overwrite can't hit LOCATION_ALREADY_EXISTS
    Seq("simspec_ivf_assigned", "simspec_ivf_codebook").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Similarity.saveIvfIndex(index, "simspec_ivf", numBuckets = 4)
    val loaded = Similarity.loadIvfIndex(spark, "simspec_ivf", "vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 3)
    def run(ix: Similarity.IvfIndex) = Similarity.probeIvf(
        ix, queries, "vec_id", "embedding", k = 4, nProbe = 2, excludeSelf = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(run(loaded) === run(index))
  }

  test("l2Normalize: unit norm, cosine == dot after normalization, zero-safe") {
    import spark.implicits._
    val rng = new Random(29)
    val vecs = (0L until 20L).map(i => (i, Seq.fill(8)(rng.nextDouble() - 0.5)))
    val df = vecs.toDF("id", "v")
      .withColumn("nv", Similarity.l2Normalize(col("v")))
    val norms = df.select(Similarity.l2Norm(col("nv"))).collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
    // cosine(a, b) == dot(normalize(a), normalize(b))
    val pair = df.limit(2).collect().map(_.getSeq[Double](2))
    val viaDot = pair(0).zip(pair(1)).map { case (x, y) => x * y }.sum
    val viaCos = Seq((vecs(0)._2, vecs(1)._2)).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(viaDot - viaCos) < 1e-9)
    // zero vector stays zero, no NaN poison
    val z = Seq(Tuple1(Seq(0.0, 0.0))).toDF("v")
      .select(Similarity.l2Normalize(col("v"))).head().getSeq[Double](0)
    assert(z == Seq(0.0, 0.0))
  }

  test("lshBucket fails fast on a dims mismatch instead of bucketing to 0") {
    import spark.implicits._
    val rng = new Random(23)
    val vecs = (0L until 10L).map(i => (i, Seq.fill(32)(rng.nextDouble() - 0.5)))
    val df = vecs.toDF("vec_id", "embedding")
    // correct dims: buckets compute, more than one bucket on random data
    val ok = df.select(Similarity.lshBucket(col("embedding"), 8, 32).as("b"))
      .collect().map(_.getLong(0))
    assert(ok.length == 10)
    // wrong dims: raises instead of silently sending every row to bucket 0
    val e = intercept[Exception] {
      Similarity.lshTopKOneShot(df, "vec_id", "embedding", 0L, 3, nPlanes = 8, dims = 64)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("lshBucket")), s"got $e")
    // a NULL vector also raises, with a non-null diagnostic (size(null) is
    // null, so the message must coalesce, not null-propagate)
    val eNull = intercept[Exception] {
      Seq(Tuple1(null.asInstanceOf[Seq[Double]])).toDF("embedding")
        .select(Similarity.lshBucket(col("embedding"), 8, 32)).collect()
    }
    assert(messages(eNull).exists(m => m.contains("lshBucket") && m.contains("NULL")),
      s"got $eNull")
  }

  test("text analysis goldens: tokens, stopword ratio, langid, bpe count") {
    import spark.implicits._
    val df = Seq(
      "the cat sat on the mat",   // 6 tokens, 3 stopwords ("the","on","the")
      "Zebra quagga xylophone"    // no stopwords
    ).toDF("text")
    val out = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      round(TextAnalysis.stopwordRatio(col("text")), 6).as("sr"),
      TextAnalysis.langIdHeuristic(col("text")).as("lang"),
      TextAnalysis.bpeTokenCount("text").as("bpe")).collect()
    assert(out(0).getInt(0) == 6)
    assert(math.abs(out(0).getDouble(1) - 0.5) < 1e-9)
    assert(out(0).getString(2) == "en")
    assert(out(1).getString(2) == "unk")
    assert(out(0).getInt(3) == 6) // pure words -> same as whitespace tokens
    // punctuation splits into extra BPE-ish tokens
    val p = Seq("don't stop!").toDF("text")
      .select(TextAnalysis.bpeTokenCount("text")).head().getInt(0)
    assert(p == 5) // don | ' | t | stop | !
  }

  test("langIdNgram: trains profiles and classifies held-out-style docs correctly") {
    import spark.implicits._
    val rng = new Random(77)
    def sentence(words: Seq[String]) =
      Seq.fill(12)(words(rng.nextInt(words.length))).mkString(" ")
    val aWords = Seq("alpha", "amber", "arcade", "anchor", "autumn")
    val bWords = Seq("zigzag", "zephyr", "zodiac", "zucchini", "zealot")
    val docs = (0L until 20L).map(i =>
      (i, sentence(if (i % 2 == 0) aWords else bWords), if (i % 2 == 0) "aa" else "zz"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langIdNgram(docs, "doc_id", "text", "lang", topN = 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 20L).foreach { i =>
      assert(out(i) == (if (i % 2 == 0) "aa" else "zz"), s"doc $i")
    }
    // a doc sharing no trigrams with any profile classifies as unk
    val lone = (docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      :+ ((99L, "qqq www eee rrr", "aa"))).toDF("doc_id", "text", "lang")
    // note: doc 99 contributes to the "aa" profile, but its trigrams are rare
    // (df=1) and won't crack the top-50, so it has zero overlap -> unk... unless
    // the aa profile has fewer than 50 distinct trigrams. Assert it resolved
    // to SOMETHING deterministic rather than crashing on the edge.
    val pred99 = TextAnalysis.langIdNgram(lone, "doc_id", "text", "lang", topN = 10)
      .filter(col("doc_id") === 99L).head()
    assert(Set("aa", "zz", "unk").contains(pred99.getString(1)))
  }

  test("fingerprint: deterministic, comma-joined, equal for near-identical docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "The quick brown fox jumps over the lazy dog again and again"),
      (2L, "the  QUICK brown fox jumps over the lazy dog again and again"),
      (3L, "an entirely different document about streaming watermarks")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.withFingerprint(df, "text")
      .select("doc_id", "fingerprint").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))      // normalization-invariant
    assert(fp(1L) != fp(3L))
    assert(fp(1L).split(",").length == 8)
    assert(fp(1L).split(",").forall(s => s.nonEmpty && s.forall(c => c.isDigit || c == '-')))
  }

  test("deterministicSplit: stable across runs, respects bucket thresholds") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("doc_id")
    val s1 = TextAnalysis.deterministicSplit(df, "doc_id")
      .select("doc_id", "bucket", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val s2 = TextAnalysis.deterministicSplit(df, "doc_id")
      .select("doc_id", "bucket", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(s1.toSeq == s2.toSeq) // deterministic, not sampled
    s1.foreach { case (_, b, sp) =>
      assert(b >= 0 && b < 100)
      assert(sp == (if (b < 90) "train" else if (b < 95) "validation" else "test"))
    }
    // roughly proportional (md5 is uniform; 1000 ids => loose bounds)
    val frac = s1.count(_._3 == "train").toDouble / s1.length
    assert(frac > 0.8 && frac < 0.98, s"train frac $frac")
  }

  test("contaminatedDocs flags gram overlap with the benchmark set only") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // shares a 3-gram
      (2L, "entirely novel content about catalyst codegen plans"),
      (3L, "quick brown fox appears here too")              // shares as well
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "benchmark says the quick brown fox is canonical")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contaminatedDocs(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 3L)) // doc 2 shares nothing
    assert(out(1L) >= 2)              // "the quick brown", "quick brown fox"
    assert(out(3L) >= 1)              // "quick brown fox"
  }

  test("quality score keeps clean text and flags punctuation soup") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the river"),
      (2L, "!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@")
    ).toDF("id", "text")
    val out = TextAnalysis.withQuality(df, "text")
      .select("id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L))
    assert(!out(2L))
  }

  test("labelOutliers ranks the planted far-from-centroid vector first") {
    import spark.implicits._
    val rng = new Random(41)
    // two tight clusters per label; one planted outlier pointing the other way
    val rows = (0L until 30L).flatMap { i =>
      val lbl = (i % 2).toInt
      val base = if (lbl == 0) 1.0 else -1.0
      Seq((i, Seq.fill(8)(base + rng.nextGaussian() * 0.01), lbl))
    } ++ Seq(
      (100L, Seq.fill(8)(-1.0), 0),  // labeled 0, looks like label 1
      (101L, Seq.fill(8)(1.0), 1))   // labeled 1, looks like label 0
    val out = Similarity.labelOutliers(
        rows.toDF("vec_id", "embedding", "label"), "vec_id", "embedding",
        "label", k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val rank1 = out.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    assert(rank1 == Map(0 -> 100L, 1 -> 101L))
  }

  test("hardNegatives returns only foreign-label vectors, exactly ranked") {
    import spark.implicits._
    val rng = new Random(42)
    val vecs = (0L until 60L).map { i =>
      val lbl = (i % 2).toInt
      val base = if (lbl == 0) 1.0 else -1.0
      (i, Seq.tabulate(8)(d => base * (d + 1) / 8.0 + rng.nextGaussian() * 0.1), lbl)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(
        df, "vec_id", "embedding", "label",
        df.filter(col("vec_id") === 0), "vec_id", "embedding", "label",
        k = 3, nProbe = 1)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    // with two labels and nProbe=1, candidates are exactly the other label
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = vecs.find(_._1 == 0L).get._2
    val expect = vecs.filter(_._3 == 1)
      .map { case (i, v, _) => (i, cos(v, q)) }
      .sortBy { case (i, s) => (-s, i) }.take(3).map(_._1)
    assert(got.map(_._1).toSeq == expect)
    assert(vecs.filter(v => got.map(_._1).contains(v._1)).forall(_._3 == 1))
  }

  test("pmiCollocations surfaces the planted collocation above common pairs") {
    import spark.implicits._
    // "alpha beta" always co-occur (PMI high); "the x" pairs are independent
    val docs = (0 until 12).map { i =>
      (i.toLong, s"alpha beta the w$i the w${i % 3} the w${(i + 1) % 3}")
    }
    val out = TextAnalysis.pmiCollocations(
        docs.toDF("doc_id", "text"), "text", k = 5, minCount = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getDouble(3)))
    assert(out.head._1 == ("alpha", "beta"))
    assert(out.head._2 == 12L)
    // PMI of the perfect collocation must beat everything else strictly
    assert(out.tail.forall(_._3 < out.head._3))
  }

  test("chunkDocs covers every token with the declared overlap, zero shuffle") {
    import spark.implicits._
    val text = (1 to 47).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, "short doc")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(df, "doc_id", "text",
        chunkTokens = 20, overlap = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 47 tokens, step 15: chunks at 0,15,30 cover to 50 => ceil((47-5)/15)=3
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d1.map(_._3).toSeq == Seq(0L, 15L, 30L))
    assert(d1.map(_._4).toSeq == Seq(20L, 20L, 17L))
    assert(d1(0)._5.endsWith("t20") && d1(1)._5.startsWith("t16"))
    // full coverage: every token appears in some chunk
    assert(d1.flatMap(_._5.split(" ")).toSet == (1 to 47).map(i => s"t$i").toSet)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._5 == "short doc" && d2.head._4 == 2L)
    // map-side only: the physical plan has no exchange
    val plan = TextAnalysis.chunkDocs(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("hardNegatives: a NULL-label query treats every cell as foreign") {
    import spark.implicits._
    val rng = new Random(43)
    val labeled = (0L until 40L).map { i =>
      val lbl = (i % 2).toInt
      val base = if (lbl == 0) 1.0 else -1.0
      (i, Seq.fill(8)(base + rng.nextGaussian() * 0.05), Some(lbl))
    }
    val df = (labeled :+ ((99L, Seq.fill(8)(1.0), None: Option[Int])))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(
        df.filter(col("label").isNotNull), "vec_id", "embedding", "label",
        df.filter(col("vec_id") === 99), "vec_id", "embedding", "label",
        k = 3, nProbe = 2)
      .collect()
    // an unlabeled query has no own cell: it still gets k results (a plain
    // =!= would null out the cell filter and erase it from the output)
    assert(got.length == 3)
  }

  test("zero vectors never rank as neighbors (NaN cosine is excluded)") {
    import spark.implicits._
    // Spark sorts NaN above every real double — unfiltered, the zero
    // vector would be the rank-1 "nearest" neighbor of every query
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0), 0L),
      (1L, Seq(0.9, 0.1, 0.0, 0.0), 0L),
      (2L, Seq(0.8, 0.2, 0.0, 0.0), 0L),
      (3L, Seq(0.0, 0.0, 0.0, 0.0), 0L),  // zero vector, same cell
      (4L, Seq(-1.0, 0.0, 0.0, 0.0), 1L)
    ).toDF("vec_id", "embedding", "cell")
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(!brute.contains(3L) && brute.take(2) == Seq(1L, 2L))
    val index = Similarity.buildIvfIndex(vecs, "vec_id", "embedding", col("cell"))
    val probed = Similarity.probeIvf(
        index, vecs.filter(col("vec_id") === 0), "vec_id", "embedding",
        k = 3, nProbe = 1, excludeSelf = true)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(!probed.map(_._2).contains(3L))
    assert(probed.sortBy(_._1).map(_._2).take(2).toSeq == Seq(1L, 2L))
  }

  test("corpus statistics are invariant to physical layout") {
    import spark.implicits._
    // rounded corpus-level doubles must not depend on partitioning or row
    // order (sum/max folds are cushioned by stableRound; a raw
    // order-dependent sum would flake exactly here)
    val rng = new Random(51)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (0L until 120L).map { i =>
      (i, Seq.fill(8 + rng.nextInt(10))(words(rng.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(
      canon(TextAnalysis.unigramLogProb(docs, "doc_id", "text")) ==
      canon(TextAnalysis.unigramLogProb(docs.repartition(13), "doc_id", "text")))
    assert(
      canon(TextAnalysis.pmiCollocations(docs, "text", k = 10, minCount = 2)) ==
      canon(TextAnalysis.pmiCollocations(docs.repartition(7), "text", k = 10, minCount = 2)))
  }

  test("unigramLogProb matches the hand-computed corpus model") {
    import spark.implicits._
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus counts: a=3, b=1, c=1, total=5
    val lpA = math.log(3.0 / 5.0); val lp1 = math.log(1.0 / 5.0)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - (2 * lpA + lp1) / 3.0) < 1e-5)
    assert(out(2L)._1 == 2L)
    assert(math.abs(out(2L)._2 - (lpA + lp1) / 2.0) < 1e-5)
  }

  test("zipfFit recovers a planted power law; degenerate vocab gives null fit") {
    import spark.implicits._
    // plant freq(rank r) = round(1000 / r) for ranks 1..50 — alpha ≈ 1
    val rows = (1 to 50).flatMap { r =>
      Seq.fill(math.round(1000.0 / r).toInt)(s"w$r")
    }
    val df = rows.grouped(97).map(_.mkString(" ")).toSeq.toDF("text")
    val out = TextAnalysis.zipfFit(df, "text").collect().head
    assert(out.getLong(0) == 50) // n_types
    assert(out.getLong(1) == rows.size) // n_tokens
    val (alpha, r2) = (out.getDouble(2), out.getDouble(4))
    assert(alpha > 0.9 && alpha < 1.1, s"planted exponent 1, got $alpha")
    assert(r2 > 0.99, s"planted law should fit near-perfectly, got $r2")
    // layout-stable: rank assignment must not depend on partitioning
    val out2 = TextAnalysis.zipfFit(df.repartition(13), "text").collect().head
    assert(out2.getDouble(2) == alpha && out2.getDouble(4) == r2)
    // a single-type corpus has zero x-variance: null alpha/r2, not a blowup
    val deg = TextAnalysis.zipfFit(Seq("a a a").toDF("text"), "text").collect().head
    assert(deg.getLong(0) == 1 && deg.isNullAt(2) && deg.isNullAt(4))
  }

  test("contaminationSpans: island merge, offsets, and multi-span docs match the hand model") {
    import spark.implicits._
    val bench = Seq((100L, "x1 x2 x3 x4")).toDF("doc_id", "text")
    // doc 1: one contaminated run at tokens 2..6 ("x1 x2 x3 x4" gives 3-gram
    // hits at offsets 2 and 3 → one merged span [2, 5]... plus the tail gram)
    val train = Seq(
      (1L, "a b x1 x2 x3 x4 c d"),
      // doc 2: TWO separated spans (hits at 0 and far-apart 8)
      (2L, "x1 x2 x3 e f g h i x2 x3 x4 j"),
      // doc 3: clean
      (3L, "nothing shared here at all ok"),
      // doc 4: shorter than n tokens
      (4L, "x1 x2")).toDF("doc_id", "text")

    val got = TextAnalysis.contaminationSpans(train, bench, "doc_id", "text", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc 1: grams at offsets 2 ("x1 x2 x3") and 3 ("x2 x3 x4") merge →
    // span [2, 5], 2 grams
    // doc 2: "x1 x2 x3" at 0 → [0,2]; "x2 x3 x4" at 8 → [8,10]
    assert(got == Set((1L, 2L, 5L, 2L), (2L, 0L, 2L, 1L), (2L, 8L, 10L, 1L)))
  }

  test("bigramLogProb matches the hand-computed corpus model; short docs emit (0, NULL)") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // corpus bigrams: "a b"=3, "b a"=1, "b c"=1; contexts: C(a·)=3, C(b·)=2
    val pAB = math.log(3.0 / 3.0); val pBA = math.log(1.0 / 2.0)
    val pBC = math.log(1.0 / 2.0)
    assert(out(1L).getLong(1) == 3L) // a b | b a | a b
    assert(math.abs(out(1L).getDouble(2) - (2 * pAB + pBA) / 3.0) < 1e-5)
    assert(out(2L).getLong(1) == 2L) // a b | b c
    assert(math.abs(out(2L).getDouble(2) - (pAB + pBC) / 2.0) < 1e-5)
    // a single-token doc has no bigram evidence: explicit (0, NULL) row
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(2))
    // word-salad ordering scores lower than in-model ordering even when
    // the unigram distributions are identical — the signal t20 cannot see
    val df2 = df.union(Seq((4L, "b a c")).toDF("doc_id", "text"))
    val out2 = TextAnalysis.bigramLogProb(df2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out2(4L).getDouble(2) < out2(2L).getDouble(2))
  }

  test("stupidBackoffScore: every tier of the backoff chain fires with hand values") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // train: unigrams a=3, b=2, c=1 (N=6); bigrams "a b"=2, "b a"=1, "a c"=1
    val train = Seq((0L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // scored doc exercises all three tiers:
    //  "a b"  seen bigram        -> 2/3
    //  "b c"  unseen, c seen     -> 0.4 * 1/6
    //  "c zz" unseen, zz unseen  -> 0.16/6
    val score = Seq((1L, "a b c zz")).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoffScore(train, score, "doc_id", "text")
      .head()
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) === ((3L, 2L, 1L)))
    val expected = (math.log(2.0 / 3) + math.log(0.4 * 1 / 6.0) +
      math.log(0.4 * 0.4 / 6.0)) / 3.0
    assert(out.getDouble(4) === r6(expected))
    // a scored doc with < 2 tokens has no transition -> omitted
    val short = TextAnalysis.stupidBackoffScore(
      train, Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
    assert(short.count() === 0)
    // in-model ordering outscores word salad under the SAME frozen model
    val pair = TextAnalysis.stupidBackoffScore(
      train, Seq((5L, "a b a b"), (6L, "b b a a")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(pair(5L) > pair(6L))
  }

  test("MIPS: brute force ranks by inner product; norm-augmentation reduces MIPS to cosine ANN") {
    import spark.implicits._
    // query q = (1, 0). Corpus: a long vector at an angle beats a unit
    // vector pointing exactly at q on INNER PRODUCT but loses on cosine.
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),            // the query itself
      (1L, Seq(1.0f, 0.0f)),            // unit, perfectly aligned: ip=1, cos=1
      (2L, Seq(4.0f, 3.0f)),            // norm 5 at 37°: ip=4, cos=0.8
      (3L, Seq(0.5f, 0.1f)),            // small: ip=0.5
      (4L, Seq(-2.0f, 0.0f)))           // anti-aligned: ip=-2
      .toDF("vec_id", "embedding")
    val mips = Similarity.bruteForceMipsTopK(df, "vec_id", "embedding", 0L, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(mips.map(_._1).toSeq == Seq(2L, 1L, 3L, 4L))
    assert(mips.head._2 == 4.0)
    // cosine disagrees on the winner — the case MIPS exists for
    val cos = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 1)
      .collect().head.getLong(0)
    assert(cos == 1L)

    // reduction: augmented corpus has constant norm (max corpus norm = 5),
    // and cosine ranking over (augmented corpus, 0-padded query)
    // reproduces the exact MIPS order
    val aug = Similarity.augmentForMips(df, "vec_id", "embedding")
    val norms = aug.select(Similarity.l2Norm(col("embedding")).as("n"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 5.0) < 1e-9))
    val qv = df.filter(col("vec_id") === 0L)
      .select(Similarity.mipsQueryPad(col("embedding")).as("embedding"))
      .withColumn("vec_id", lit(900L)).select("vec_id", "embedding")
    val augAll = aug.unionByName(qv)
    val viaCosine = Similarity.bruteForceTopK(augAll, "vec_id", "embedding", 900L, 5)
      .filter(col("vec_id") =!= 0L) // drop the un-augmented query's twin
      .collect().map(_.getLong(0)).toSeq
    assert(viaCosine == Seq(2L, 1L, 3L, 4L))

    // and the ANN stack works unchanged on the augmented space: an IVF
    // probe wide enough to cover all cells recovers the MIPS top-1
    val idx = Similarity.buildIvfIndexAuto(aug, "vec_id", "embedding", nCells = 2)
    val got = Similarity.probeIvf(
      idx, qv, "vec_id", "embedding", k = 1, nProbe = 2, excludeSelf = true)
      .collect().map(r => r.getLong(2))
    idx.unpersisted()
    assert(got.headOption.contains(2L))
  }

  test("dsirWeights matches the hand-computed two-LM model; null text emits (0, NULL)") {
    import spark.implicits._
    // target docs (tgt=true): "a a b"; raw: "a c", plus a null-text raw doc
    val df = Seq(
      (1L, "a a b", true), (2L, "a c", false), (3L, null: String, false))
      .toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.dsirWeights(df, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // union vocab V=3 {a,b,c}; target counts: a=2,b=1 (Nt=3); raw: a=1,c=1 (Nr=2)
    // add-1: pT(a)=(2+1)/(3+3)=.5, pT(b)=2/6, pT(c)=1/6
    //        pR(a)=(1+1)/(2+3)=.4, pR(b)=1/5, pR(c)=2/5
    def lr(pt: Double, pr: Double) = math.log(pt) - math.log(pr)
    val w1 = 2 * lr(3.0 / 6, 2.0 / 5) + lr(2.0 / 6, 1.0 / 5)
    val w2 = lr(3.0 / 6, 2.0 / 5) + lr(1.0 / 6, 2.0 / 5)
    assert(out(1L).getBoolean(1) && out(1L).getLong(2) == 3L)
    assert(math.abs(out(1L).getDouble(3) - w1) < 1e-5)
    assert(!out(2L).getBoolean(1) && out(2L).getLong(2) == 2L)
    assert(math.abs(out(2L).getDouble(3) - w2) < 1e-5)
    // a target-like raw doc must outscore an off-target raw doc
    assert(w1 > w2)
    // null text: no token evidence — explicit (0, NULL), not a dropped row
    assert(out(3L).getLong(2) == 0L && out(3L).isNullAt(3))
    // layout-stable
    val a = TextAnalysis.dsirWeights(df, "doc_id", "text", col("tgt"))
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.dsirWeights(df.repartition(7), "doc_id", "text", col("tgt"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("Bm25Index: probe == bm25TopK (qtf multiplicity, null text in N); save/load round-trip") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b x"), (2L, "a c y y"), (3L, "b b b z"), (4L, "w w w w"),
      (5L, null: String))
      .toDF("doc_id", "text")
    val idx = TextAnalysis.buildBm25Index(df, "doc_id", "text").persisted()
    // repeated query term exercises the qtf multiplier; doc 5's null text
    // must still count toward N/avgdl exactly as the scan form counts it
    for (terms <- Seq(
        Seq("a", "b"), Seq("a", "a", "b"), Seq("z"),
        // 3+ DISTINCT terms: the case where probe-side summation order
        // could diverge from the scan form's left-associated fold if the
        // per-term cells were not folded in fixed query order
        Seq("a", "b", "z"), Seq("b", "z", "a", "c"))) {
      val direct = TextAnalysis.bm25TopK(df, "doc_id", "text", terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val probed = TextAnalysis.probeBm25(idx, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(probed == direct, s"terms=$terms")
    }
    // persistence: bucketed postings round-trip, probe parity holds
    TextAnalysis.saveBm25Index(idx, "bm25_spec_ix", numBuckets = 4)
    val loaded = TextAnalysis.loadBm25Index(spark, "bm25_spec_ix", "doc_id")
    val fromDisk = TextAnalysis.probeBm25(loaded, Seq("a", "b"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("a", "b"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromDisk == direct)
    idx.unpersisted()
    Seq("bm25_spec_ix_postings", "bm25_spec_ix_doclens", "bm25_spec_ix_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("extendBm25Index == build over the union; stats merge from one-row frames only") {
    import spark.implicits._
    val base = Seq((1L, "a a b x"), (2L, "a c y y"), (3L, null: String))
      .toDF("doc_id", "text")
    val batch = Seq((4L, "b b z"), (5L, "a z z z q q"))
      .toDF("doc_id", "text")
    val extended = TextAnalysis.extendBm25Index(
      TextAnalysis.buildBm25Index(base, "doc_id", "text"), batch, "text")
    val full = TextAnalysis.buildBm25Index(
      base.unionByName(batch), "doc_id", "text")
    for (terms <- Seq(Seq("a"), Seq("a", "b", "z"), Seq("q", "z", "a"))) {
      val e = TextAnalysis.probeBm25(extended, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val f = TextAnalysis.probeBm25(full, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(e == f, s"terms=$terms")
    }
    // merged stats: counts exact, avgdl equal to the direct mean
    val es = extended.stats.head(); val fs = full.stats.head()
    assert(es.getDouble(0) == fs.getDouble(0)) // n (incl. the null-text doc)
    assert(es.getDouble(2) == fs.getDouble(2)) // non-null length count
    assert(math.abs(es.getDouble(1) - fs.getDouble(1)) < 1e-12)
  }

  test("leakage-safe split: cluster members co-locate; the per-doc split provably straddles") {
    import spark.implicits._
    // 40 clusters of 5 exact duplicates each
    val docs = (0L until 200L).map(i => (i, s"cluster ${i / 5} body")).toDF("doc_id", "text")
    val clustered = docs.select(
      col("doc_id"),
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("cluster"))
    val byCluster = TextAnalysis.deterministicSplit(clustered, "cluster")
      .select("doc_id", "cluster", "split").collect()
      .map(r => (r.getString(1), r.getString(2)))
    // coherence: every cluster maps to exactly one split
    assert(byCluster.groupBy(_._1).values.forall(_.map(_._2).distinct.length == 1))
    // the naive per-doc split straddles at least one cluster on this
    // corpus — the leakage the cluster-keyed form closes
    val byDoc = TextAnalysis.deterministicSplit(clustered, "doc_id")
      .select(col("cluster"), col("split")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(byDoc.groupBy(_._1).values.exists(_.map(_._2).distinct.length > 1))
  }

  test("filtered k-NN: pre-filter semantics beat post-filter; IVF allow-list probe matches") {
    import spark.implicits._
    // query (1,0). Global top-2 are label-9 vectors; the label-5 slice's
    // true top-2 are further out — post-filtering a global top-2 would
    // return NOTHING from label 5.
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 9),
      (1L, Seq(0.99f, 0.01f), 9), (2L, Seq(0.98f, 0.02f), 9),
      (3L, Seq(0.8f, 0.6f), 5), (4L, Seq(0.6f, 0.8f), 5),
      (5L, Seq(-1.0f, 0.0f), 5))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.bruteForceTopKFiltered(
      df, "vec_id", "embedding", 0L, 2, col("label") === 5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 4L))
    // the unfiltered top-2 is disjoint — the case pre-filter exists for
    val unfiltered = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(unfiltered == Seq(1L, 2L))

    // allow-list IVF probe: with full cell coverage it returns the exact
    // filtered ranking, k rows, even though the global neighbors are
    // disallowed
    val idx = Similarity.buildIvfIndexAuto(df, "vec_id", "embedding", nCells = 2)
    val allowed = df.filter(col("label") === 5).select("vec_id")
    val qv = df.filter(col("vec_id") === 0L).select("vec_id", "embedding")
    val viaIvf = Similarity.probeIvfFiltered(
      idx, qv, "vec_id", "embedding", allowed, "vec_id",
      k = 2, nProbe = 2, excludeSelf = true)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    idx.unpersisted()
    assert(viaIvf == Seq(3L, 4L))
  }

  test("trainDsir/scoreDsir: frozen-model scoring == dsirWeights on the training corpus; OOV takes the smoothed default") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b", true), (2L, "a c", false), (3L, null: String, false))
      .toDF("doc_id", "text", "tgt")
    val model = TextAnalysis.trainDsir(df, "text", col("tgt")).persisted()
    // parity: scoring the training corpus through the frozen model equals
    // the train-and-score convenience (every token is in-vocabulary)
    val viaModel = TextAnalysis.scoreDsir(model, df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    val direct = TextAnalysis.dsirWeights(df, "doc_id", "text", col("tgt"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(viaModel == direct)
    // OOV: a doc of tokens the model never saw scores n × oovLogRatio —
    // and the model's vocabulary is NOT retrained by scoring
    val oovDoc = Seq((9L, "zz zz qq")).toDF("doc_id", "text")
    val got = TextAnalysis.scoreDsir(model, oovDoc, "doc_id", "text")
      .collect().head
    assert(got.getLong(1) == 3L)
    assert(math.abs(got.getDouble(2) - 3 * model.oovLogRatio) < 1e-6)
    // oovLogRatio itself: ln((Nr+kV)/(Nt+kV)) with Nt=3, Nr=2, V=3, k=1
    assert(math.abs(model.oovLogRatio - math.log(5.0 / 6.0)) < 1e-12)
    model.unpersisted()
  }

  test("StreamingDsir: per-batch scoring over a frozen model == batch scoreDsir") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val train = Seq(
      (1L, "a a b", true), (2L, "a c", false)).toDF("doc_id", "text", "tgt")
    val model = TextAnalysis.trainDsir(train, "text", col("tgt")).persisted()
    val incoming = Seq((10L, "a b"), (11L, "c zz"), (12L, "qq qq"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val stream = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.StreamingDsir.attach(
      stream.toDF().toDF("id", "text"), model, "id", "text",
      checkpoint = tmpDir("dsir-ckpt")) { (scored, _) =>
      got.synchronized {
        got ++= scored.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
    }
    try {
      stream.addData(incoming.take(2))
      q.processAllAvailable()
      stream.addData(incoming.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val expect = TextAnalysis.scoreDsir(
        model, incoming.toDF("id", "text"), "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.synchronized(got.toSet) == expect)
    model.unpersisted()
  }

  test("bm25TopK matches the hand-computed model; zero-score docs dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b x"), (2L, "a c y y"), (3L, "b b b z"), (4L, "w w w w"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("a", "b"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // N=4, avgdl=4, df_a=df_b=2 → idf = ln(1 + 2.5/2.5) = ln 2; dl/avgdl=1
    // so each term contributes ln2 · tf·2.2/(tf+1.2).
    val ln2 = math.log(2.0)
    def c(tf: Double) = ln2 * tf * 2.2 / (tf + 1.2)
    val expect = Seq(
      (1L, c(2) + c(1)), (3L, c(3)), (2L, c(1)))
    assert(out.map(_._1).toSeq == expect.map(_._1)) // doc 4 (no terms) dropped
    out.zip(expect).foreach { case ((_, got), (_, want)) =>
      assert(math.abs(got - want) < 1e-5)
    }
  }

  test("bm25TopK: a repeated query term doubles its contribution (qtf weighting)") {
    import spark.implicits._
    val df = Seq((1L, "a b x y"), (2L, "b c y y")).toDF("doc_id", "text")
    def score(q: Seq[String]) =
      TextAnalysis.bm25TopK(df, "doc_id", "text", q, k = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val single = score(Seq("a", "b"))
    val doubled = score(Seq("a", "a", "b"))
    // doc 1 holds both terms; doubling "a" adds exactly one more "a" contribution
    val aContrib = single(1L) - score(Seq("b"))(1L)
    assert(math.abs(doubled(1L) - (single(1L) + aContrib)) < 1e-5)
    // doc 2 has no "a" — its score is unchanged by the repeat
    assert(math.abs(doubled(2L) - single(2L)) < 1e-5)
  }

  test("sourceDrift: uniform source has KL 0, skewed source positive") {
    import spark.implicits._
    // corpus: sA = "a b", sB = "a a" → p(a)=3/4, p(b)=1/4
    val df = Seq(("sA", "a b"), ("sB", "a a")).toDF("source", "text")
    val out = TextAnalysis.sourceDrift(df, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // KL(sA) = .5·ln(.5/.75) + .5·ln(.5/.25); KL(sB) = 1·ln(1/.75)
    assert(out("sA")._1 == 2L && out("sA")._2 == 2L)
    assert(math.abs(out("sA")._3 -
      (0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25))) < 1e-5)
    assert(out("sB")._1 == 1L && out("sB")._2 == 2L)
    assert(math.abs(out("sB")._3 - math.log(1.0 / 0.75)) < 1e-5)
  }

  test("dimensionStats matches the hand model and is layout-invariant") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 6.0))).toDF("vec_id", "embedding")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    val got = canon(Similarity.dimensionStats(df, "embedding"))
    assert(got == Seq(
      (0L, 2L, 2.0, 1.0, 1.0, 3.0),
      (1L, 2L, 4.0, 4.0, 2.0, 6.0)))
    assert(got == canon(Similarity.dimensionStats(df.repartition(5), "embedding")))
  }

  test("sq8 round-trip: error ≤ half a quantization step; constant dim exact") {
    import spark.implicits._
    val rng = new Random(31)
    val vecs = (0L until 60L).map(i =>
      // dim 3 is constant 0.25 across the corpus (ext = 0)
      (i, Seq.tabulate(8)(d => if (d == 3) 0.25 else rng.nextDouble() * 4 - 2)))
    val df = vecs.toDF("vec_id", "embedding")
    val index = Similarity.buildSq8Index(df, "vec_id", "embedding")
    val decoded = index.codes.crossJoin(broadcast(index.bounds))
      .select(col("vec_id"),
        Similarity.sq8DecodeExpr(col("_code"), col("_mins"), col("_exts")).as("rv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val byDim = (0 until 8).map(d => vecs.map(_._2(d)))
    val halfStep = byDim.map(vs => (vs.max - vs.min) / 255.0 / 2.0)
    vecs.foreach { case (id, v) =>
      (0 until 8).foreach { d =>
        assert(math.abs(decoded(id)(d) - v(d)) <= halfStep(d) + 1e-12,
          s"id=$id dim=$d: ${decoded(id)(d)} vs ${v(d)}")
      }
      assert(decoded(id)(3) == 0.25, "zero-extent dimension must reconstruct exactly")
    }
  }

  test("sq8: a corpus vector with a NaN/Inf element is dropped from probes, not max-coded") {
    import spark.implicits._
    val rng = new Random(36)
    val clean = (0L until 40L).map(i => (i, Seq.tabulate(4)(_ => rng.nextDouble())))
    val corrupt = Seq(
      (100L, Seq(Double.NaN, 0.5, 0.5, 0.5)),
      (101L, Seq(0.5, Double.PositiveInfinity, 0.5, 0.5)),
      (102L, Seq(0.5, 0.5, Double.NegativeInfinity, 0.5)))
    val df = (clean ++ corrupt).toDF("vec_id", "embedding")
    val index = Similarity.buildSq8Index(df, "vec_id", "embedding")
    // bounds come from the FINITE values only — a corrupt vector must not
    // blow a dimension's extent to NaN/Inf and empty every probe
    val b = index.bounds.collect().head
    val (mins, exts) = (b.getSeq[Double](0), b.getSeq[Double](1))
    assert(mins.forall(java.lang.Double.isFinite) && exts.forall(java.lang.Double.isFinite))
    // corrupt vectors are null-coded; clean vectors encode normally
    val codes = index.codes.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(Seq(100L, 101L, 102L).forall(codes(_)), "corrupt vectors must null-code")
    assert(clean.forall { case (i, _) => !codes(i) })
    // and probes never surface them — same behavior as the raw paths'
    // NaN-cosine drop
    val got = Similarity.probeSq8(
        index, df.filter(col("vec_id") < 3), "vec_id", "embedding",
        k = 50, excludeSelf = true, guardBroadcast = false)
      .collect().map(_.getLong(2)).toSet
    assert(got.intersect(Set(100L, 101L, 102L)).isEmpty)
    // union over the 3 queries: every clean vector still ranks (each query
    // excludes only itself)
    assert(got == clean.map(_._1).toSet)
  }

  test("sq8EncodeExpr clamps vectors outside the index bounds to [0, 255]") {
    import spark.implicits._
    val bounds = Seq((Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("_mins", "_exts")
    val out = Seq((1L, Seq(-5.0, 9.0))).toDF("vec_id", "v")
      .crossJoin(broadcast(bounds))
      .select(Similarity.sq8EncodeExpr(col("v"), col("_mins"), col("_exts")).as("c"))
      .collect().head.getSeq[Byte](0)
    assert(out == Seq((-128).toByte, 127.toByte)) // codes 0 and 255, −128-offset
  }

  test("sq8TopK == Scala model (quantize → reconstruct → cosine); cluster recall") {
    import spark.implicits._
    val rng = new Random(32)
    // three tight clusters far apart; query is id 0 in cluster 0
    val vecs = (0L until 90L).map { i =>
      val c = (i % 3).toInt
      val base = Seq.tabulate(8)(d => if (d == c) 10.0 else 0.0)
      (i, base.map(_ + rng.nextGaussian() * 0.05))
    }
    val df = vecs.toDF("vec_id", "embedding")
    // exact model of the operator: per-dim (min, ext) bounds, HALF_UP code,
    // reconstruct, cosine(reconstructed corpus, RAW query)
    val mins = (0 until 8).map(d => vecs.map(_._2(d)).min)
    val exts = (0 until 8).map(d => vecs.map(_._2(d)).max - mins(d))
    def recon(v: Seq[Double]): Seq[Double] = v.zipWithIndex.map { case (x, d) =>
      if (exts(d) == 0) mins(d)
      else {
        val code = java.math.BigDecimal.valueOf((x - mins(d)) * 255.0 / exts(d))
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        mins(d) + code * exts(d) / 255.0
      }
    }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = vecs.find(_._1 == 0L).get._2
    val expect = vecs.filter(_._1 != 0L)
      .map { case (i, v) => (i, cos(recon(v), q)) }
      .sortBy { case (i, s) => (-s, i) }
      .take(5).map(_._1)
    val sq8 = Similarity.sq8TopK(df, "vec_id", "embedding", 0L, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(sq8 == expect)
    // the coarse property quantization must not break: every neighbor comes
    // from the query's own cluster (ids ≡ 0 mod 3) — the cluster gap dwarfs
    // the quantization step even though WITHIN-cluster rank can shuffle
    assert(sq8.forall(_ % 3 == 0))
  }

  test("recallAtK: hand model — partial overlap, short ground truth, missing query") {
    import spark.implicits._
    // q 1: exact {10,11,12}, approx recovers {10,12} → 2/3
    // q 2: exact {20} (short ground truth), approx misses it → 0/1
    // q 3: exact {30,31}, approx has extras beyond ground truth → 2/2 (extras
    //      don't inflate — denominator is the exact set)
    val exact = Seq(
      (1L, 1L, 10L, 0.9), (1L, 2L, 11L, 0.8), (1L, 3L, 12L, 0.7),
      (2L, 1L, 20L, 0.9),
      (3L, 1L, 30L, 0.9), (3L, 2L, 31L, 0.8)
    ).toDF("q_id", "rank", "vec_id", "sim")
    val approx = Seq(
      (1L, 1L, 10L, 0.9), (1L, 2L, 12L, 0.7), (1L, 3L, 99L, 0.1),
      (2L, 1L, 98L, 0.2),
      (3L, 1L, 31L, 0.8), (3L, 2L, 30L, 0.9), (3L, 3L, 97L, 0.1),
      (4L, 1L, 40L, 0.5) // approx-only query: no ground truth → absent
    ).toDF("q_id", "rank", "vec_id", "sim")
    val got = Similarity.recallAtK(exact, approx, "vec_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.666667, 2L -> 0.0, 3L -> 1.0))
  }

  test("recallAtK over real probes: IVF with all cells probed has recall 1.0") {
    import spark.implicits._
    val rng = new Random(34)
    val vecs = (0L until 60L).map { i =>
      val c = (i % 3).toInt
      (i, Seq.tabulate(6)(d => (if (d == c * 2) 1.0 else 0.0) +
        rng.nextGaussian() * 0.05), c.toLong)
    }
    val df = vecs.toDF("vec_id", "embedding", "cell")
    val queries = df.filter(col("vec_id") < 6)
    val exact = Similarity.bruteForceBatch(
      df, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 4, excludeSelf = true)
    val full = Similarity.probeIvf(
      Similarity.buildIvfIndex(df, "vec_id", "embedding", col("cell")),
      queries, "vec_id", "embedding", k = 4, nProbe = 3, excludeSelf = true)
    val got = Similarity.recallAtK(exact, full, "vec_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == (0L until 6L).toSet)
    assert(got.values.forall(_ == 1.0),
      s"nProbe=all must recover the exact top-k: $got")
  }

  test("probeSq8Ivf with all cells probed == flat probeSq8") {
    import spark.implicits._
    val rng = new Random(33)
    val vecs = (0L until 80L).map { i =>
      val c = (i % 4).toInt
      (i, Seq.tabulate(8)(d => if (d == c) 5.0 + rng.nextGaussian() * 0.1
                               else rng.nextGaussian() * 0.1), c.toLong)
    }
    val df = vecs.toDF("vec_id", "embedding", "cell")
    val queries = df.filter(col("vec_id") < 10)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val flat = canon(Similarity.probeSq8(
      Similarity.buildSq8Index(df, "vec_id", "embedding"),
      queries, "vec_id", "embedding", 3, excludeSelf = true))
    val ivf = canon(Similarity.probeSq8Ivf(
      Similarity.buildSq8IvfIndex(df, "vec_id", "embedding", col("cell")),
      queries, "vec_id", "embedding", 3, nProbe = 4, excludeSelf = true))
    assert(ivf == flat)
  }

  test("blocklistTag: whole-token matches only, sorted csv, null/empty text not blocked") {
    import spark.implicits._
    val df = Seq(
      (1L, "the spam and eggs and SPAM"),  // spam matches (case-folded) once
      (2L, "spammer eggs"),                // substring must NOT match
      (3L, "ham spam eggs ham"),           // two distinct matches -> sorted csv
      (4L, ""),
      (5L, null: String)
    ).toDF("doc_id", "text")
    // "SPAM" exercises the blocklist case-fold: tokens() lower-cases the
    // corpus, so an unfolded capitalized term would silently never block
    val got = TextAnalysis.blocklistTag(df, "doc_id", "text", Seq("SPAM", "ham", "zz"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((1, "spam", true)))
    assert(got(2L) == ((0, "", false)))
    assert(got(3L) == ((2, "ham,spam", true)))
    assert(got(4L) == ((0, "", false)))
    assert(got(5L) == ((0, "", false)))
    // the pass is shuffle-free: no exchange in the plan
    val plan = TextAnalysis.blocklistTag(df, "doc_id", "text", Seq("spam"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"blocklist must not shuffle:\n$plan")
  }

  test("charProfile: entropy ranks gibberish below prose; empty/null edge rows kept") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaa"),            // entropy 0
      (2L, "the quick brown fox jumps here"),  // prose-like
      (3L, null: String),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.charProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 20L && got(1L).getInt(2) == 1 &&
      got(1L).getDouble(3) == 0.0)
    assert(got(2L).getDouble(3) > 3.0) // distinct-char prose sits well above 3 bits
    assert(got(3L).getLong(1) == 0L && got(3L).getInt(2) == 0 && got(3L).isNullAt(3))
    assert(got(4L).getLong(1) == 0L && got(4L).getInt(2) == 0 && got(4L).isNullAt(3))
  }

  test("phraseCount: hand counts incl. overlaps; probePhrase parity on real docs; edge rows dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "the hash join beats the sort merge join"),
      (2L, "a a a"),                 // overlapping "a a" -> 2 starts
      (3L, "hash only here"),
      (4L, "join hash"),             // reversed order must not match
      (5L, ""),
      (6L, null: String)
    ).toDF("doc_id", "text")
    // capitalized query phrase must case-fold against the lower-cased tokens
    val hj = TextAnalysis.phraseCount(df, "doc_id", "text", Seq("Hash", "JOIN"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hj == Map(1L -> 1L))
    val aa = TextAnalysis.phraseCount(df, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa == Map(2L -> 2L))
    // a 3-term phrase and one longer than any doc
    val three = TextAnalysis.phraseCount(df, "doc_id", "text",
      Seq("the", "hash", "join")).collect()
    assert(three.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L)))
    assert(TextAnalysis.phraseCount(df, "doc_id", "text",
      Seq.fill(20)("x")).isEmpty)
    // scan form == positional-index probe, on the real corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val idx = TextAnalysis.buildPositionalIndex(docs, "doc_id", "text")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    for (phrase <- Seq(Seq("hash", "join"), Seq("a", "a"), Seq("the", "big", "table"))) {
      assert(
        canon(TextAnalysis.probePhrase(idx, phrase)) ==
        canon(TextAnalysis.phraseCount(docs, "doc_id", "text", phrase)),
        s"scan/probe divergence for phrase $phrase")
    }
    // incremental extension == rebuild over the union (new batch only touched)
    val shifted = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    val ext = TextAnalysis.extendPositionalIndex(idx, shifted, "doc_id", "text")
    val full = TextAnalysis.buildPositionalIndex(
      docs.unionByName(shifted), "doc_id", "text")
    assert(
      canon(TextAnalysis.probePhrase(ext, Seq("hash", "join"))) ==
      canon(TextAnalysis.probePhrase(full, Seq("hash", "join"))))
  }

  test("normalizeText: composed/decomposed forms converge, ASCII fast-path unchanged, null safe") {
    import spark.implicits._
    val composed = "caf\u00e9"          // e-acute as ONE code point
    val decomposed = "cafe\u0301"       // e + combining acute (two code points)
    val df = Seq(
      (1L, decomposed), (2L, composed), (3L, "plain ascii"), (4L, null: String)
    ).toDF("doc_id", "text")
    val nfc = TextAnalysis.normalizeText(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(nfc(1L).getString(1) == composed && nfc(1L).getBoolean(2))
    assert(nfc(2L).getString(1) == composed && !nfc(2L).getBoolean(2))
    assert(nfc(3L).getString(1) == "plain ascii" && !nfc(3L).getBoolean(2))
    assert(nfc(4L).isNullAt(1) && !nfc(4L).getBoolean(2))
    // after NFC both spellings hash-dedup together (the reason this op
    // runs before q18-style normalized-text dedup)
    val deduped = graft.operators.Dedup.byNormalizedText(
      TextAnalysis.normalizeText(df.where(col("doc_id") <= 2), "doc_id", "text")
        .withColumnRenamed("text_norm", "text"),
      "doc_id", "text")
    assert(deduped.count() == 1 && deduped.head().getLong(1) == 2L)
    // NFD is the inverse direction: the composed form decomposes
    val nfd = TextAnalysis.normalizeText(df.where(col("doc_id") === 2),
      "doc_id", "text", form = "NFD").head()
    assert(nfd.getString(1) == decomposed && nfd.getBoolean(2))
  }

  test("lexicalDiversity: hand counts; repeated-template doc scores low TTR; no-token rows kept") {
    import spark.implicits._
    val df = Seq(
      (1L, "buy now buy now buy now"),     // 6 tokens, 2 types, 0 hapax
      (2L, "every word here is different"),// 5 tokens, 5 types, 5 hapax
      (3L, "one one two"),                 // 3 tokens, 2 types, 1 hapax
      (4L, ""),                            // no tokens
      (5L, null: String)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lexicalDiversity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 6L && got(1L).getLong(2) == 2L &&
      got(1L).getLong(3) == 0L)
    assert(math.abs(got(1L).getDouble(4) - 0.333333) < 1e-9)
    assert(got(1L).getDouble(5) == 0.0)
    assert(got(2L).getDouble(4) == 1.0 && got(2L).getDouble(5) == 1.0)
    assert(got(3L).getLong(1) == 3L && got(3L).getLong(3) == 1L &&
      math.abs(got(3L).getDouble(5) - 0.5) < 1e-9)
    assert(got(4L).getLong(1) == 0L && got(4L).isNullAt(4) && got(4L).isNullAt(5))
    assert(got(5L).getLong(1) == 0L && got(5L).isNullAt(4))
  }

  test("mmrRerank: diversification demotes the redundant near-dup; exhaustion stops early") {
    import spark.implicits._
    // a1/a2 nearly duplicate each other and the query; b points elsewhere.
    // Pure similarity ranks (a1, a2, b); MMR at λ=0.3 must demote a2.
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),      // query
      (1L, Array(0.999f, 0.04f)),   // a1
      (2L, Array(0.998f, 0.06f)),   // a2 ≈ a1
      (3L, Array(0.2f, 0.98f))      // b: different direction
    ).toDF("vec_id", "embedding")
    val plain = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(plain == Seq(1L, 2L, 3L))
    val mmr = Similarity.mmrRerank(df, "vec_id", "embedding", 0L,
      poolSize = 3, k = 3, lambda = 0.3)
      .collect().sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getLong(1)))
    assert(mmr.toSeq == Seq((1, 1L), (2, 3L), (3, 2L)),
      s"redundant a2 must drop behind diverse b, got ${mmr.toSeq}")
    // λ=1 degenerates to pure similarity order
    val lam1 = Similarity.mmrRerank(df, "vec_id", "embedding", 0L,
      poolSize = 3, k = 3, lambda = 1.0)
      .collect().sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
    assert(lam1 == plain)
    // pool smaller than k: stops after the pool is exhausted
    val tiny = df.filter(col("vec_id") <= 2L)
    val ex = Similarity.mmrRerank(tiny, "vec_id", "embedding", 0L,
      poolSize = 5, k = 4, lambda = 0.5)
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(ex == Seq(1, 2))
  }

  test("dupCoverageRatio: per-row kernel == the batch aggregate on real docs and edges") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      // edge rows the corpus lacks: short doc, all-same doc, empty text
      .unionByName(Seq(
        (100001L, "solo"), (100002L, "x x x x x x"), (100003L, "")
      ).toDF("doc_id", "text"))
    for (n <- Seq(2, 3)) {
      val perRow = docs.select(
        col("doc_id"),
        stableRound(TextAnalysis.dupCoverageRatio(col("text"), n), 6)
          .as("r"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val batch = TextAnalysis.dupNgramCoverage(docs, "doc_id", "text", n)
        .select("doc_id", "dup_coverage")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(perRow.size == batch.size)
      val diff = perRow.keys.filter(k => perRow(k) != batch(k))
      assert(diff.isEmpty,
        s"n=$n per-row != batch for ${diff.take(5).map(k =>
          (k, perRow(k), batch(k)))}")
    }
  }

  test("dupNgramCoverage: hand positions, overlap unioned, short docs never repeat") {
    import spark.implicits._
    val df = Seq(
      // "a b a b a": bigrams (a b)@0,2 (b a)@1,3 -> all 5 positions covered,
      // 2 distinct repeating grams
      (1L, "a b a b a"),
      // "x y z w": no repeats
      (2L, "x y z w"),
      // "a a a q r s t u v w": (a a)@0,1 covers {0,1,2} -> 3/10
      (3L, "a a a q r s t u v w"),
      // shorter than n: the single truncated gram cannot repeat
      (4L, "solo"),
      // repeats spread over many phrases — the case t10's top-ratio misses:
      // "p q p q r s r s": (p q)@0,2 {0,1,2,3}, (r s)@4,6 {4,5,6,7} -> 8/8
      (5L, "p q p q r s r s")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramCoverage(df, "doc_id", "text", n = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got(1L) == ((5, 2L, 1.0, false)))
    assert(got(2L) == ((4, 0L, 0.0, true)))
    assert(got(3L) == ((10, 1L, 0.3, true))) // boundary: 0.3 <= 0.3 keeps
    assert(got(4L) == ((1, 0L, 0.0, true)))
    assert(got(5L) == ((8, 2L, 1.0, false)))
  }

  test("jlProject: deterministic md5 signs, exact hand projection, norm preserved in expectation") {
    import spark.implicits._
    // signs must be reproducible from the (seed, i, j) strings alone
    val s1 = Similarity.jlSignMatrix(4, 3, "jl1")
    val s2 = Similarity.jlSignMatrix(4, 3, "jl1")
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
    assert(s1.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(Similarity.jlSignMatrix(4, 3, "other").map(_.toSeq).toSeq !=
      s1.map(_.toSeq).toSeq)
    // hand projection of a basis vector: picks out column i's signs / sqrt(k)
    val e1 = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val got = Similarity.jlProject(e1, "v", 4, 3, "jl1")
      .head().getSeq[Double](2)
    val want = (0 until 3).map(j =>
      BigDecimal(s1(j)(0) / math.sqrt(3.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got == want)
    // JL contract: squared norms preserved in expectation (within the
    // 1/sqrt(k) distortion) on random-ish vectors
    val vecs = (0 until 40).map { r =>
      (r.toLong, (0 until 64).map(i =>
        (math.sin(r * 64 + i + 1) * 2).toFloat))
    }.toDF("id", "v")
    val p = Similarity.jlProject(vecs, "v", 64, 16, "jl1")
      .select(col("id"),
        aggregate(col("v"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double")).as("n0"),
        aggregate(col("jl_vec"), lit(0.0), (a, x) => a + x * x).as("n1"))
      .agg(avg(col("n1") / col("n0"))).head().getDouble(0)
    assert(p > 0.7 && p < 1.3, s"mean squared-norm ratio off: $p")
  }

  test("jlProject plan: map-only — the literal sign matrix adds no shuffle, scan, or join") {
    import spark.implicits._
    val df = Seq((1L, Seq.fill(8)(1.0f))).toDF("id", "v")
    val plan = Similarity.jlProject(df, "v", 8, 4, "jl1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"projection must be map-only:\n${plan.take(3000)}")
  }

  test("readability: hand-counted words/sentences/syllables and scores; degenerate docs null-score") {
    import spark.implicits._
    val df = Seq(
      (1L, "The cat sat. It purred loudly! Did it? tv"),
      (2L, "..."),            // no words, no sentences
      (3L, "word")            // 1/1/1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5))))
      .toMap
    // 9 words over 4 sentences, 11 vowel-run syllables ("tv" floors to 1)
    val (w, s2, sy) = (9.0, 4.0, 11.0)
    def r6(x: Double) = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((9L, 4L, 11L,
      Some(r6(206.835 - 1.015 * (w / s2) - 84.6 * (sy / w))),
      Some(r6(0.39 * (w / s2) + 11.8 * (sy / w) - 15.59)))))
    assert(got(2L) == ((0L, 0L, 0L, None, None)))
    assert(got(3L) == ((1L, 1L, 1L, Some(121.22), Some(r6(0.39 + 11.8 - 15.59)))))
    // null text emits no row
    val withNull = Seq((4L, null: String)).toDF("doc_id", "text")
    assert(TextAnalysis.readability(withNull, "doc_id", "text").count() == 0)
  }

  test("readability plan: per-row kernels only — zero shuffle, zero explode") {
    val df = Queries.byName("t43_readability")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"),
      s"readability must not shuffle or explode:\n${plan.take(3000)}")
  }

  test("jlProject kernel == lambda tower bit-for-bit; mismatched/null vectors null out") {
    import spark.implicits._
    val vecs = (0 until 50).map { r =>
      (r.toLong, (0 until 64).map(i => (math.cos(r * 64 + i) * 3).toFloat))
    }.toDF("id", "v")
    val k = Similarity.jlProject(vecs, "v", 64, 16, "jl1")
      .select("id", "jl_vec").as[(Long, Seq[Double])].collect().toMap
    val l = Similarity.jlProject(vecs, "v", 64, 16, "jl1", useKernel = false)
      .select("id", "jl_vec").as[(Long, Seq[Double])].collect().toMap
    assert(k == l, "codegen kernel must equal the HOF tower exactly")
    // wrong dimension -> null projection, not garbage
    val short = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    assert(Similarity.jlProject(short, "v", 64, 16, "jl1")
      .where(col("jl_vec").isNull).count() == 1)
  }

  test("vocabulary + oovRate: hand counts, frequency threshold, frozen-vocab domain shift") {
    import spark.implicits._
    val train = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog ran"))
      .toDF("doc_id", "text")
    // freq: the=3, cat=2, ran=2, sat=1, dog=1 -> minCount 2 keeps {the, cat, ran}
    val vocab = TextAnalysis.vocabulary(train, "text", minCount = 2)
    assert(vocab.select("_w").as[String].collect().toSet == Set("the", "cat", "ran"))
    val score = Seq(
      (10L, "the cat sat"),         // sat OOV -> 1/3
      (11L, "zebra quark flux"),    // full shift -> 3/3
      (12L, "the the the"),         // all in-vocab, duplicates counted
      (13L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(score, "doc_id", "text", vocab)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def r6(x: Double) = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) == ((3L, 1L, r6(1.0 / 3))))
    assert(got(11L) == ((3L, 3L, 1.0)))
    assert(got(12L) == ((3L, 0L, 0.0)))
    assert(!got.contains(13L), "null text emits no row")
  }

  test("tfidfKeywords: a doc-unique term outranks a ubiquitous one; ties break term-asc") {
    import spark.implicits._
    val df = Seq(
      (1L, "common rare common"),
      (2L, "common common common"),
      (3L, "common")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(df, "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // doc 1: 'rare' (df 1) has idf ln(4/2)+1 ≈ 1.693; 'common' tf 2 but
    // idf ln(4/4)+1 = 1 → score 2.0 vs 1.693: tf still wins here — pin the
    // actual smooth-idf arithmetic, not intuition
    assert(out((1L, 1L)) === "common" && out((1L, 2L)) === "rare")
    assert(out((2L, 1L)) === "common")
    // doc 3 has one term only: exactly one ranked row
    assert(out.get((3L, 2L)).isEmpty && out((3L, 1L)) === "common")
    // equal scores tie to the lexicographically smaller term
    val tie = Seq((1L, "bb aa")).toDF("doc_id", "text")
    val t = TextAnalysis.tfidfKeywords(tie, "doc_id", "text", 2).collect()
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(t(1L) === "aa" && t(2L) === "bb")
  }

  test("ngramNovelty: exact duplicates score 0, the original 1, partial overlap in between") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f"), // grams: "a b c", "b c d", "c d e", "d e f" (4)
      (2L, "a b c d e f"), // exact dup of doc 1 -> novelty 0
      (3L, "c d e f g"), // shares "c d e","d e f"; novel: "e f g" -> 1/3
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(out(1L) === ((4L, 4L, 1.0)))
    assert(out(2L) === ((4L, 0L, 0.0)))
    assert(out(3L)._1 === 3L && out(3L)._2 === 1L)
    assert(math.abs(out(3L)._3 - 1.0 / 3) < 1e-6)
    // null text keeps zeros and a null ratio via the join-back
    assert(out(4L) === ((0L, 0L, -1.0)))
  }

  test("sentenceChunks packs whole sentences to the budget, carries overlap, survives over-budget sentences; zero shuffle") {
    import spark.implicits._
    // sentences: 3 + 4 + 3 + 12 + 2 + 3 tokens; budget 8, overlap 1
    // cum-before: 0,3,7,10,22,24 -> cid 0,0,0,1,2,3 ... wait recompute in model below
    val text = "a b c. d e f g! h i j? " +
      "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12. m n. o p q."
    val df = Seq((1L, text), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.sentenceChunks(df, "doc_id", "text",
        budgetTokens = 8, overlapSents = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .sortBy(r => (r._1, r._2))
    // model: cum-before = 0,3,7,10,22,24; cid = cum div 8 = 0,0,0,1,2,3
    // chunk 0: sents 1-3 (first-token rule: sent 3 starts at token 7 < 8)
    // chunk 1: sent 4 (over budget, stays whole) + carry sent 3
    // chunk 2: sent 5 + carry sent 4
    // chunk 3: sent 6 + carry sent 5
    assert(out.map(_._1).forall(_ == 1L)) // blank + null docs emit nothing
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_._3).toSeq == Seq(0L, 2L, 3L, 4L)) // start_sent incl carry
    assert(out.map(_._4).toSeq == Seq(3L, 2L, 2L, 2L))
    assert(out.map(_._5).toSeq == Seq(10L, 15L, 14L, 5L))
    assert(out(0)._6 == "a b c d e f g h i j")
    assert(out(1)._6.startsWith("h i j k1 ") && out(1)._6.endsWith("k12"))
    assert(out(3)._6 == "m n o p q")
    // no sentence is ever split: every chunk text is a concatenation of
    // whole sentences
    val sents = Seq("a b c", "d e f g", "h i j",
      (1 to 12).map(i => s"k$i").mkString(" "), "m n", "o p q")
    out.foreach { c =>
      var rest = c._6
      while (rest.nonEmpty) {
        val hit = sents.find(s => rest == s || rest.startsWith(s + " "))
        assert(hit.isDefined, s"chunk '" + c._6 + "' is not whole sentences")
        rest = rest.drop(hit.get.length).stripPrefix(" ")
      }
    }
    // map-side only: the physical plan has no exchange
    val plan = TextAnalysis.sentenceChunks(df, "doc_id", "text", 8, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("ngramOverlapEval: the BLEU hand model — clipped precisions, brevity " +
      "penalty, edge cases") {
    import spark.implicits._
    val pairs = Seq(
      // classic: p1 = 5/6 (the clipped at 2), p2 = 3/5, bp = 1
      (1L, "the cat sat on the mat", "the cat is on the mat"),
      // identical: perfect score
      (2L, "a b c", "a b c"),
      // disjoint: both precisions 0, bleu 0
      (3L, "x y z", "p q r"),
      // clipping: candidate repeats 'the' 4x, ref holds 1 -> p1 = 1/4
      (4L, "the the the the", "the mat"),
      // brevity: 2-token candidate vs 4-token ref -> bp = exp(1 - 4/2)
      (5L, "a b", "a b c d"),
      // short candidate (1 token, no bigram) is excluded
      (6L, "a", "a b")
    ).toDF("pair_id", "cand", "ref")
    val got = TextAnalysis.ngramOverlapEval(pairs, "pair_id", "cand", "ref", 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    def approx(a: Double, b: Double) = math.abs(a - b) < 1e-6
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    val r1 = got(1L)
    assert(r1._1 == 6 && r1._2 == 6)
    assert(approx(r1._3, 5.0 / 6) && approx(r1._4, 3.0 / 5) && r1._5 == 1.0)
    assert(approx(r1._6, math.sqrt(5.0 / 6 * 3.0 / 5)))
    assert(got(2L) == ((3, 3, 1.0, 1.0, 1.0, 1.0)))
    assert(got(3L)._3 == 0.0 && got(3L)._4 == 0.0 && got(3L)._6 == 0.0)
    assert(approx(got(4L)._3, 0.25))
    assert(approx(got(5L)._5, math.exp(-1.0)))
    assert(approx(got(5L)._6, math.exp(-1.0) * 1.0)) // p1 = p2 = 1 prefix

    // layout determinism: repartitioned input folds to the same rows
    val a = TextAnalysis.ngramOverlapEval(pairs, "pair_id", "cand", "ref", 2)
      .collect().toSet
    val b = TextAnalysis.ngramOverlapEval(
      pairs.repartition(7), "pair_id", "cand", "ref", 2).collect().toSet
    assert(a == b)
  }

  test("lexiconMixture: hand model — token-weighted tags, entropy 0/ln2 " +
      "poles, untagged and empty docs") {
    import spark.implicits._
    val lex = Seq("cat" -> "animal", "dog" -> "animal",
      "oak" -> "plant", "fir" -> "plant")
    val docs = Seq(
      (1L, "cat dog cat x"),          // pure animal: 3 tagged of 4
      (2L, "cat oak cat oak"),        // 50/50 -> entropy ln 2
      (3L, "x y z"),                  // nothing tagged
      (4L, "oak oak oak cat"),        // dominant plant 3/4
      (5L, null.asInstanceOf[String]) // null text
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lexiconMixture(docs, "doc_id", "text", lex)
      .collect().map(r => r.getLong(0) -> r).toMap
    def d(id: Long, i: Int) = got(id).getDouble(i)
    // (id -> n_tokens, n_tagged, n_tags, dominant_tag)
    assert(got(1L).getLong(1) == 4 && got(1L).getLong(2) == 3 &&
      got(1L).getLong(3) == 1 && got(1L).getString(4) == "animal")
    assert(d(1L, 5) == 1.0 && d(1L, 6) == 0.0) // single tag: share 1, H 0
    assert(got(2L).getString(4) == "animal" && d(2L, 5) == 0.5) // tie -> asc
    assert(math.abs(d(2L, 6) - math.log(2.0)) < 1e-6)
    assert(got(3L).getLong(2) == 0 && got(3L).getString(4) == "none" &&
      got(3L).isNullAt(5) && got(3L).isNullAt(6))
    assert(got(4L).getString(4) == "plant" && d(4L, 5) == 0.75)
    assert(got(5L).getLong(1) == 0 && got(5L).getString(4) == "none")
    // layout determinism
    val again = TextAnalysis.lexiconMixture(
      docs.repartition(3), "doc_id", "text", lex).collect().toSet
    assert(again == got.values.toSet)
  }
}
