package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

class PqSpec extends SparkSpec {

  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def l2(a: Seq[Double], b: Seq[Double]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)

  /** 8-dim vectors in 4 well-separated corners: first half near ±3, second
    * half near ±3 independently — so each 4-dim subspace has exactly two
    * natural clusters a k=2 Lloyd fit must find. */
  private def corners(n: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      val a = if (i % 2 == 0) 3.0 else -3.0
      val b = if ((i / 2) % 2 == 0) 3.0 else -3.0
      val jit = (d: Int) => 0.01 * ((i * 7 + d * 3) % 5 - 2)
      (i.toLong, Seq.tabulate(8)(d => (if (d < 4) a else b) + jit(d)))
    }

  test("fit + encode: codes recover the per-subspace cluster structure") {
    val data = corners(80).toDF("id", "v")
    val cb = Pq.fit(data, "id", "v", dims = 8, m = 2, k = 2, iters = 2)
    val cents = cb.cents.collect()
    assert(cents.length === 4) // 2 subspaces x 2 surviving cells
    assert(cents.forall(_.getSeq[Double](2).length === 4))
    val codes = Pq.encode(data, "id", "v", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cb.unpersisted()
    assert(codes.size === 80)
    assert(codes.values.forall(_.length === 2))
    // same corner sign => same code, opposite sign => different code,
    // independently per subspace
    def side(i: Long, sub: Int): Boolean =
      if (sub == 0) i % 2 == 0 else (i / 2) % 2 == 0
    (0 until 2).foreach { sub =>
      val bySide = codes.keys.groupBy(side(_, sub))
        .map { case (s, ids) => s -> ids.map(codes(_)(sub)).toSet }
      assert(bySide(true).size === 1, s"sub $sub positive side split: $bySide")
      assert(bySide(false).size === 1, s"sub $sub negative side split: $bySide")
      assert(bySide(true) !== bySide(false), s"sub $sub sides merged")
    }
  }

  test("adcTopK: scores equal the table-lookup recomputation; nearest corner wins") {
    val data = corners(80).toDF("id", "v")
    val cb = Pq.fit(data, "id", "v", dims = 8, m = 2, k = 2, iters = 2)
    val codes = Pq.encode(data, "id", "v", cb)
    // query: id 0's corner (+3, +3), excluded from the corpus side
    val got = Pq.adcTopK(
      cb, codes.filter(col("id") =!= 0L), "id",
      data.filter(col("id") === 0L), "id", "v", k = 12)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 12)
    // recompute every ADC score from the collected codebook + codes with
    // the same rounding contract; top-12 must agree exactly
    val cents = cb.cents.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    val codeMap = codes.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val q = corners(80).head._2
    val dt = cents.map { case ((sub, cell), c) =>
      (sub, cell) -> r6(l2(q.slice(sub * 4, sub * 4 + 4), c))
    }
    val expect = codeMap.removed(0L).map { case (id, cs) =>
      id -> r6(cs.zipWithIndex.map { case (cell, sub) =>
        val d = dt((sub, cell.toLong)); d * d
      }.sum)
    }.toSeq.sortBy { case (id, d) => (d, id) }.take(12)
      .zipWithIndex.map { case ((id, d), i) => (i + 1L, id, d) }
    cb.unpersisted()
    assert(got.toSeq === expect)
    // retrieval sanity: every top-12 hit shares id 0's corner (ids with
    // i%2==0 and (i/2)%2==0), since ADC distance to the own-corner
    // centroids is minimal
    got.foreach { case (_, id, _) =>
      assert(id % 2 == 0 && (id / 2) % 2 == 0, s"foreign corner id $id in top-k")
    }
  }

  test("ivfPqTopK: all cells probed == adcTopK; nProbe=1 scores only the nearest cell's members") {
    import graft.operators.Similarity
    val data = corners(80).toDF("id", "v")
      // coarse cells = the corner quadrant (the IVF label analog)
      .withColumn("cell",
        (col("id") % 2 + (col("id") / 2) % 2 * 2).cast("long"))
    val cb = Pq.fit(data, "id", "v", dims = 8, m = 2, k = 2, iters = 2)
    val codes = Pq.encode(data, "id", "v", cb)
    val cents = Similarity.centroids(data, "cell", "v")
    val queries = data.filter(col("id") === 0L)
    def run(nProbe: Int) = Pq.ivfPqTopK(
      cb, codes.filter(col("id") =!= 0L), "id",
      data.select(col("id"), col("cell")), "cell", cents,
      queries, "id", "v", k = 10, nProbe = nProbe)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val flat = Pq.adcTopK(
      cb, codes.filter(col("id") =!= 0L), "id", queries, "id", "v", k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // probing every cell degenerates to the flat ADC scan
    assert(run(4) === flat)
    // nProbe=1: candidates restricted to id 0's own corner (cell 0)
    val pruned = run(1)
    assert(pruned.nonEmpty)
    pruned.foreach { case (_, id, _) =>
      assert(id % 2 == 0 && (id / 2) % 2 == 0,
        s"id $id outside the probed corner")
    }
    cb.unpersisted()
  }

  test("fit: a short vector fails loudly instead of encoding arbitrarily") {
    val bad = (corners(20) :+ ((99L, Seq(1.0, 2.0, 3.0)))).toDF("id", "v")
    val e = intercept[Exception] {
      Pq.fit(bad, "id", "v", dims = 8, m = 2, k = 2, iters = 2)
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("PQ assign"))), e)
  }
}
