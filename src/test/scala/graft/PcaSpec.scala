package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

class PcaSpec extends SparkSpec {

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("fit: recovers a planted principal direction") {
    import spark.implicits._
    // points along (3,4)/5 with small orthogonal jitter — PC1 must be ±(0.6, 0.8)
    val ts = (-10 to 10).map(_.toDouble)
    val rows = ts.zipWithIndex.map { case (t, i) =>
      val eps = (i % 3 - 1) * 0.01 // deterministic jitter on the normal (-0.8, 0.6)
      Seq(0.6 * t - 0.8 * eps, 0.8 * t + 0.6 * eps)
    }
    val df = rows.toDF("v")
    val m = Pca.fit(df, "v", 2)
    assert(m.n == 21)
    assert(math.abs(m.mean(0)) < 1e-12 && math.abs(m.mean(1)) < 1e-12)
    val pc1 = m.components(0)
    assert(math.abs(math.abs(dot(pc1, Array(0.6, 0.8))) - 1.0) < 1e-6,
      s"PC1 should align with (0.6, 0.8), got ${pc1.toSeq}")
    // sign canon: largest-|coordinate| entry (index 1, 0.8) positive
    assert(pc1(1) > 0)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(m.varianceExplained(0) > 0.999)
  }

  test("fit: components are orthonormal, eigenvalues descend, trace preserved") {
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      Seq(math.sin(i * 0.7), math.cos(i * 1.3), (i % 5).toDouble, i * 0.1)
    }
    val m = Pca.fit(rows.toDF("v"), "v", 4)
    for (a <- 0 until 4; b <- 0 until 4) {
      val d = dot(m.components(a), m.components(b))
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"<c$a, c$b> = $d")
    }
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // full-rank fit: eigenvalue sum == covariance trace == total variance
    assert(math.abs(m.eigenvalues.sum - m.totalVariance) < 1e-9)
  }

  test("fit: null, empty, and null-ELEMENT vectors are skipped; float input accepted") {
    import spark.implicits._
    val df = Seq(
      Some(Seq(1.0f, 0.0f)), None, Some(Seq.empty[Float]),
      Some(Seq(-1.0f, 0.0f)), Some(Seq(0.0f, 0.5f)), Some(Seq(0.0f, -0.5f))
    ).toDF("v")
    val m = Pca.fit(df, "v", 1)
    assert(m.n == 4)
    assert(m.components(0)(0) == 1.0 && math.abs(m.components(0)(1)) < 1e-12)
    // a null ELEMENT is complete-case excluded, not a deserializer crash
    val withNullElem = Seq(
      Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, null),
      Seq[java.lang.Double](3.0, 4.0)
    ).toDF("v")
    assert(Pca.fit(withNullElem, "v", 1).n == 2)
    // and covarianceSlice keeps n consistent with its sums
    val cs = Pca.covarianceSlice(withNullElem, "v", 2).collect()
    assert(cs.forall(_.getLong(2) == 2L))
  }

  test("project: int-typed arrays are cast like fit, not rejected by the kernel") {
    import spark.implicits._
    val df = Seq(Seq(1, 2), Seq(3, 4), Seq(5, 6)).toDF("v")
    val m = Pca.fit(df, "v", 2)
    val p = Pca.project(df, "v", m, "p").select("p").collect()
    assert(p.length == 3 && p.forall(!_.isNullAt(0)))
  }

  test("project: codegen kernel equals the manual centered matvec; mismatched dim -> null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),
      (2L, Seq(-1.0, 0.5, 0.0)),
      (3L, Seq(4.0, 4.0, 4.0)),
      (4L, Seq(1.0, 2.0)) // wrong dimension
    ).toDF("id", "v")
    val model = Pca.PcaModel(
      n = 3, mean = Array(1.0, 2.0, 2.0),
      eigenvalues = Array(2.0, 1.0),
      components = Array(Array(1.0, 0.0, 0.0), Array(0.0, 0.6, 0.8)),
      totalVariance = 3.0)
    val got = Pca.project(df, "v", model, "p").orderBy("id")
      .select("p").collect().map(r =>
        if (r.isNullAt(0)) null else r.getSeq[Double](0))
    assert(got(0) == Seq(0.0, 0.8))
    assert(got(1) == Seq(-2.0, -2.5))
    assert(got(2) == Seq(3.0, 2.8))
    assert(got(3) == null)
  }

  test("project(whiten = true): unit variance per component, zero-variance guarded") {
    import spark.implicits._
    val rows = (0 until 50).map(i => Seq(i * 0.4, math.sin(i * 1.1), 7.0))
    val df = rows.toDF("v")
    val m = Pca.fit(df, "v", 3) // third direction has ~zero variance
    val proj = Pca.project(df, "v", m, "p", whiten = true)
      .select(col("p")(0).as("p0"), col("p")(1).as("p1"), col("p")(2).as("p2"))
    val stats = proj.agg(
      var_pop(col("p0")), var_pop(col("p1")), var_pop(col("p2"))).head()
    assert(math.abs(stats.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-6)
    assert(stats.getDouble(2) == 0.0) // whitened zero-variance -> all zeros
  }

  test("reconstructionError: zero at full rank, decreasing in k") {
    import spark.implicits._
    val rows = (0 until 30).map(i => Seq(i * 0.3, math.sin(i.toDouble), (i % 7) * 0.5))
    val df = rows.toDF("v")
    def mse(k: Int): Double = {
      val m = Pca.fit(df, "v", k)
      Pca.reconstructionError(df, "v", m).head().getDouble(0)
    }
    val e1 = mse(1); val e2 = mse(2); val e3 = mse(3)
    assert(e3 < 1e-6, s"full-rank mse should vanish, got $e3")
    assert(e1 >= e2 && e2 >= e3)
  }

  test("covarianceSlice: matches the hand covariance, skips null/short vectors") {
    import spark.implicits._
    val df = Seq(
      Some(Seq(1.0, 2.0)), Some(Seq(3.0, 6.0)), Some(Seq(5.0, 4.0)),
      None, Some(Seq(9.0)) // skipped: null, too short
    ).toDF("v")
    val got = Pca.covarianceSlice(df, "v", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // complete rows: (1,2),(3,6),(5,4); means 3, 4
    // var x = ((1-3)^2+(3-3)^2+(5-3)^2)/3 = 8/3; var y = (4+4+0)/3 = 8/3
    // cov xy = ((-2)(-2) + 0*2 + 2*0)/3 = 4/3
    assert(got((1, 1)) == ((3L, 2.666667)))
    assert(got((2, 2)) == ((3L, 2.666667)))
    assert(got((1, 2)) == ((3L, 1.333333)))
  }

  test("l2 kernel: hand distances, null/mismatch -> null") {
    import spark.implicits._
    import graft.operators.Similarity
    val df = Seq(
      (Seq(0.0, 0.0), Seq(3.0, 4.0)),
      (Seq(1.0, 1.0), Seq(1.0, 1.0)),
      (Seq(1.0), Seq(1.0, 2.0))
    ).toDF("a", "b")
    val got = df.select(Similarity.l2Dist(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) == 5.0)
    assert(got(1) == 0.0)
    assert(got(2) == null)
  }

  test("bruteForceL2Batch: nearest-first ranking with id tie-break") {
    import spark.implicits._
    import graft.operators.Similarity
    val df = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 2.0)),
      (3L, Seq(1.0, 0.0)) // ties with id 1 at dist 1
    ).toDF("id", "v")
    val got = Similarity.bruteForceL2Batch(
      df, "id", "v", df.filter(col("id") === 0L), "id", "v", 3,
      excludeSelf = true)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 1L, 1.0), (2L, 3L, 1.0), (3L, 2L, 2.0)))
  }

  test("pcaL2Recall: full-rank projection preserves L2 exactly -> recall 1") {
    import spark.implicits._
    import graft.operators.Similarity
    val rows = (0 until 60).map(i =>
      (i.toLong, Seq(math.sin(i * 0.7), math.cos(i * 1.1), (i % 7) * 0.3, i * 0.05)))
    val df = rows.toDF("id", "v")
    val qs = df.filter(col("id") % 10 === 0)
    val full = Similarity.pcaL2Recall(df, "id", "v", qs, "id", "v", dims = 4, k = 5)
      .collect().map(_.getDouble(1))
    assert(full.length == 6 && full.forall(_ == 1.0))
    // structured data: 2 informative dims -> truncated recall stays high
    val clustered = (0 until 60).map { i =>
      val c = i % 2
      (i.toLong, Seq(c * 10.0 + (i % 5) * 0.01, -c * 10.0 + (i % 3) * 0.01,
        0.001 * (i % 4), 0.001 * (i % 6)))
    }.toDF("id", "v")
    val qs2 = clustered.filter(col("id") % 10 === 0)
    val trunc = Similarity.pcaL2Recall(clustered, "id", "v", qs2, "id", "v", dims = 2, k = 5)
      .collect().map(_.getDouble(1))
    assert(trunc.forall(_ >= 0.6), s"clustered truncated recall: ${trunc.toSeq}")
  }

  test("incremental fit: merged moment buffers equal a fresh fit over the union") {
    import spark.implicits._
    val a = (0 until 20).map(i => Seq(i * 0.3, math.sin(i * 0.9), (i % 5) * 0.4)).toDF("v")
    val b = (20 until 50).map(i => Seq(i * 0.3, math.sin(i * 0.9), (i % 5) * 0.4)).toDF("v")
    val merged = Pca.fitFromMoments(
      Pca.mergeState(Pca.moments(a, "v"), Pca.moments(b, "v")), 3)
    val fresh = Pca.fit(a.unionAll(b), "v", 3)
    assert(merged.n == fresh.n)
    merged.mean.zip(fresh.mean).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    merged.eigenvalues.zip(fresh.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9) }
    for (c <- 0 until 3; i <- 0 until 3)
      assert(math.abs(merged.components(c)(i) - fresh.components(c)(i)) < 1e-6)
  }

  test("state round-trips through parquet; empty-side merge is identity") {
    import spark.implicits._
    val df = (0 until 15).map(i => Seq(i * 1.0, 2.0 - i)).toDF("v")
    val buf = Pca.moments(df, "v")
    val path = tmpDir("pca-state") + "/state"
    Pca.saveState(spark, buf, path)
    val back = Pca.loadState(spark, path)
    assert(back.n == buf.n && back.sum.toSeq == buf.sum.toSeq &&
      back.gram.toSeq == buf.gram.toSeq)
    val empty = Pca.moments(df.where(lit(false)), "v")
    assert(empty.n == 0L)
    assert(Pca.mergeState(empty, buf).n == buf.n)
    assert(Pca.mergeState(buf, empty).n == buf.n)
  }

  test("StreamingPca: model after each trigger equals batch fit over everything seen") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val stream = MemoryStream[Seq[Double]](spark)
    val df = stream.toDF().toDF("v")
    val statePath = tmpDir("spca") + "/state"
    val models = scala.collection.mutable.Map[Long, Pca.PcaModel]()
    val q = graft.streaming.StreamingPca.attach(
      df, "v", k = 2, statePath, tmpDir("spca-ckpt")) {
      (m, id) => models.synchronized { models(id) = m }
    }
    try {
      val batch1 = (0 until 20).map(i => Seq(i * 0.5, math.sin(i * 0.8)))
      val batch2 = (20 until 45).map(i => Seq(i * 0.5, math.sin(i * 0.8)))
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val m1 = models.synchronized(models(0L))
      val m2 = models.synchronized(models(1L))
      val b1 = Pca.fit(batch1.toDF("v"), "v", 2)
      val b12 = Pca.fit((batch1 ++ batch2).toDF("v"), "v", 2)
      assert(m1.n == b1.n && m2.n == b12.n)
      m2.eigenvalues.zip(b12.eigenvalues).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9) }
      m2.mean.zip(b12.mean).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
      // replay safety: recomputing batch 1 from its strict prefix is
      // idempotent (the staging layout the attach relies on after a crash)
      val st = graft.streaming.StreamingPca.currentState(spark, statePath).get
      assert(st.n == b12.n)
    } finally q.stop()
  }

  test("StreamingPca: restart from checkpoint continues the fold; stagings stay pruned") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val statePath = tmpDir("spca-r") + "/state"
    val ckpt = tmpDir("spca-r-ckpt")
    val models = scala.collection.mutable.Map[Long, Pca.PcaModel]()
    def run(stream: MemoryStream[Seq[Double]]) =
      graft.streaming.StreamingPca.attach(
        stream.toDF().toDF("v"), "v", k = 2, statePath, ckpt) {
        (m, id) => models.synchronized { models(id) = m }
      }
    val b1 = (0 until 15).map(i => Seq(i * 0.4, math.cos(i * 0.6)))
    val b2 = (15 until 30).map(i => Seq(i * 0.4, math.cos(i * 0.6)))
    val b3 = (30 until 50).map(i => Seq(i * 0.4, math.cos(i * 0.6)))

    val s1 = MemoryStream[Seq[Double]](spark)
    val q1 = run(s1)
    try {
      s1.addData(b1: _*); q1.processAllAvailable()
      s1.addData(b2: _*); q1.processAllAvailable()
    } finally q1.stop()

    // NEW query instance, same checkpoint + state: the fold must continue
    // from batch 1's staging, not restart from zero. MemoryStream restart
    // idiom: re-add the already-committed blocks so the checkpoint's
    // offsets resolve — Spark skips them and processes only block 3 (or
    // replays block 2, which the staging design makes idempotent)
    val s2 = MemoryStream[Seq[Double]](spark)
    s2.addData(b1: _*)
    s2.addData(b2: _*)
    s2.addData(b3: _*)
    val q2 = run(s2)
    try q2.processAllAvailable() finally q2.stop()

    val want = Pca.fit((b1 ++ b2 ++ b3).toDF("v"), "v", 2)
    val got = models.synchronized(models.maxBy(_._1)._2)
    assert(got.n == want.n, s"restarted fold must cover all 50 rows, got n=${got.n}")
    got.mean.zip(want.mean).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    got.eigenvalues.zip(want.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9) }
    // storage bounded: at most the two newest stagings survive pruning
    val stages = new java.io.File(statePath).listFiles()
      .filter(_.getName.startsWith("_batch=")).map(_.getName).sorted
    assert(stages.length <= 2, s"stagings must be pruned to two: ${stages.toSeq}")
  }

  test("StreamingPca: fresh incarnation (new checkpoint, same statePath) never merges stale stagings") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val statePath = tmpDir("spca-i") + "/state"
    val models = scala.collection.mutable.Map[Long, Pca.PcaModel]()
    def run(stream: MemoryStream[Seq[Double]], ckpt: String) =
      graft.streaming.StreamingPca.attach(
        stream.toDF().toDF("v"), "v", k = 2, statePath, ckpt) {
        (m, id) => models.synchronized { models(id) = m }
      }
    // incarnation 1: two batches → stagings _batch=0, _batch=1 survive
    val old1 = (0 until 15).map(i => Seq(i * 0.3, math.sin(i * 0.5)))
    val old2 = (15 until 30).map(i => Seq(i * 0.3, math.sin(i * 0.5)))
    val s1 = MemoryStream[Seq[Double]](spark)
    val q1 = run(s1, tmpDir("spca-i-ckpt1"))
    try {
      s1.addData(old1: _*); q1.processAllAvailable()
      s1.addData(old2: _*); q1.processAllAvailable()
    } finally q1.stop()

    // incarnation 2: FRESH checkpoint, batch ids reset to 0, same statePath.
    // Without the at-or-above purge, batch 1 here would merge on top of the
    // dead incarnation's _batch=1 prefix (30 rows) — double-counting.
    val n1 = (0 until 10).map(i => Seq(i * 0.7, math.cos(i * 0.4)))
    val n2 = (10 until 22).map(i => Seq(i * 0.7, math.cos(i * 0.4)))
    val s2 = MemoryStream[Seq[Double]](spark)
    val q2 = run(s2, tmpDir("spca-i-ckpt2"))
    try {
      s2.addData(n1: _*); q2.processAllAvailable()
      s2.addData(n2: _*); q2.processAllAvailable()
    } finally q2.stop()

    val want = Pca.fit((n1 ++ n2).toDF("v"), "v", 2)
    val got = models.synchronized(models(1L))
    assert(got.n == want.n,
      s"new incarnation must cover exactly its own ${want.n} rows, got n=${got.n}")
    got.mean.zip(want.mean).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    val st = graft.streaming.StreamingPca.currentState(spark, statePath).get
    assert(st.n == want.n, s"state must hold only the live incarnation: n=${st.n}")
  }

  test("covarianceSlice: zero fittable rows → empty frame (the GROUP BY mirror's shape)") {
    import spark.implicits._
    val empty = Seq.empty[Seq[Double]].toDF("v")
    assert(Pca.covarianceSlice(empty, "v", 3).count() == 0)
    // all rows filtered out (too short / null element) — same contract
    val unfittable = Seq(Seq(1.0), Seq(2.0)).toDF("v")
    assert(Pca.covarianceSlice(unfittable, "v", 3).count() == 0)
  }

  test("fit agrees with covarianceSlice on the same data") {
    import spark.implicits._
    val rows = (0 until 25).map(i => Seq(i * 0.2, math.cos(i * 0.9), (i % 4).toDouble))
    val df = rows.toDF("v")
    val m = Pca.fit(df, "v", 3)
    // rebuild covariance from the model: C = V diag(λ) Vᵀ (full rank)
    val slice = Pca.covarianceSlice(df, "v", 3).collect()
      .map(r => (r.getInt(0) - 1, r.getInt(1) - 1) -> r.getDouble(3)).toMap
    for (((i, j), cov) <- slice) {
      val rebuilt = (0 until 3).map(c =>
        m.eigenvalues(c) * m.components(c)(i) * m.components(c)(j)).sum
      assert(math.abs(rebuilt - cov) < 1e-5, s"C($i,$j): $rebuilt vs $cov")
    }
  }
}
