package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  /** Reference Morton code over pre-computed bucket indices. */
  private def morton(buckets: Seq[Long], bits: Int): Long =
    buckets.zipWithIndex.foldLeft(0L) { case (acc, (b, d)) =>
      (0 until bits).foldLeft(acc)((a, i) =>
        a | (((b >> i) & 1L) << (i * buckets.size + (buckets.size - 1 - d))))
    }

  test("withZValue: matches the reference interleave, including negatives and a constant dim") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 300).map(i =>
      (i.toLong, rng.nextInt(1000).toLong - 500L, rng.nextInt(90).toLong, 42L))
    val df = rows.toDF("id", "x", "y", "k")
    val got = Layout.withZValue(df, Seq("x", "y", "k"), bits = 5)
      .select("id", "z_value")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (minX, maxX) = (rows.map(_._2).min, rows.map(_._2).max)
    val (minY, maxY) = (rows.map(_._3).min, rows.map(_._3).max)
    rows.foreach { case (id, x, y, _) =>
      val bx = (x - minX) * 32 / (maxX - minX + 1)
      val by = (y - minY) * 32 / (maxY - minY + 1)
      // constant dim buckets to 0
      assert(got(id) === morton(Seq(bx, by, 0L), 5), s"id=$id")
    }
  }

  test("withZValue: monotone in each dimension with the other fixed; nulls bucket lowest") {
    import spark.implicits._
    // full 16x16 grid with values = bucket indices themselves
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val z = Layout.withZValue(rows.toDF("x", "y"), Seq("x", "y"), bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (y <- 0L until 16L; x <- 0L until 15L)
      assert(z((x, y)) < z((x + 1, y)))
    for (x <- 0L until 16L; y <- 0L until 15L)
      assert(z((x, y)) < z((x, y + 1)))
    // a null dim buckets to 0: it TIES the minimum value's z (bucket 0 as
    // well) and never exceeds any other row
    val withNull = Seq(
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(9L)),
      (java.lang.Long.valueOf(12L), java.lang.Long.valueOf(9L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(9L)))
      .toDF("x", "y")
    val zByX = Layout.withZValue(withNull, Seq("x", "y"), bits = 4)
      .collect().map(r =>
        (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(2)).toMap
    assert(zByX(-1L) === zByX(3L))
    assert(zByX(-1L) < zByX(12L))
  }

  test("zOrderWrite: parquet files cover disjoint z-ranges and round-trip the rows") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 4000).map(i =>
      (i.toLong, rng.nextInt(512).toLong, rng.nextInt(512).toLong))
    val path = tmpDir("zorder") + "/t"
    Layout.zOrderWrite(rows.toDF("id", "x", "y"), Seq("x", "y"), path,
      bits = 8, numFiles = 6)
    val back = spark.read.parquet(path)
    assert(back.count() === 4000)
    assert(back.select("id").distinct().count() === 4000)
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("z_value").as("lo"), max("z_value").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping file z-ranges: $hi vs $lo2")
    }
  }

  test("hilbertOrderWrite: parquet files cover disjoint h-ranges and round-trip the rows") {
    import spark.implicits._
    val rng = new scala.util.Random(12)
    val rows = (0 until 4000).map(i =>
      (i.toLong, rng.nextInt(512).toLong, rng.nextInt(512).toLong))
    val path = tmpDir("hilbert") + "/t"
    Layout.hilbertOrderWrite(rows.toDF("id", "x", "y"), Seq("x", "y"), path,
      bits = 8, numFiles = 6)
    val back = spark.read.parquet(path)
    assert(back.count() === 4000)
    assert(back.select("id").distinct().count() === 4000)
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("h_value").as("lo"), max("h_value").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping file h-ranges: $hi vs $lo2")
    }
  }

  test("compactFiles: fragments repack to the target count, content-identically, z-contract intact") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val rows = (0 until 6000).map(i =>
      (i.toLong, rng.nextInt(512).toLong, rng.nextInt(512).toLong))
    val frag = tmpDir("compact") + "/frag"
    val out = tmpDir("compact") + "/out"
    // a deliberately fragmented z-ordered table: 32 small files
    Layout.zOrderWrite(rows.toDF("id", "x", "y"), Seq("x", "y"), frag,
      bits = 8, numFiles = 32)
    val bytesIn = spark.read.parquet(frag).inputFiles.length
    assert(bytesIn === 32)
    val stats = Layout.compactFiles(spark, frag, out,
      targetFileBytes = 64L << 10, sortCol = Some("z_value"))
    assert(stats.nFilesIn === 32L)
    assert(stats.nFilesOut < stats.nFilesIn, s"no compaction: $stats")
    assert(stats.nFilesOut <= stats.targetFiles && stats.nFilesOut >= 1L)
    // content identity, row for row
    val back = spark.read.parquet(out)
    assert(back.count() === 6000)
    assert(back.select("id", "x", "y").as[(Long, Long, Long)]
      .collect().sorted === rows.sorted)
    // the z-order contract survives: output files cover DISJOINT z-ranges
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("z_value").as("lo"), max("z_value").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping compacted z-ranges: $hi vs $lo2")
      case _ => ()
    }
    // bin-pack-only mode (no sort contract) still preserves content
    val out2 = tmpDir("compact") + "/out2"
    val s2 = Layout.compactFiles(spark, frag, out2, 64L << 10, None)
    assert(s2.nFilesOut <= s2.targetFiles)
    assert(spark.read.parquet(out2).count() === 6000)
  }

  private def causeChain(e: Throwable): Iterator[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)

  test("withZValue: wide-span column raises instead of silently wrapping") {
    import spark.implicits._
    // span >= 2^(63-bits): a full-width hash-like column must raise — the
    // exact bucket product would otherwise overflow into garbage z-values
    val wide = Seq((1L, Long.MinValue + 1), (2L, Long.MaxValue - 1)).toDF("id", "h")
    val e = intercept[Exception] {
      Layout.withZValue(wide, Seq("h"), bits = 8).collect()
    }
    assert(causeChain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("layout span overflow"))), e)
    // a span just inside the limit still z-orders fine
    val ok = Seq((1L, 0L), (2L, (1L << 55) - 1L)).toDF("id", "h")
    assert(Layout.withZValue(ok, Seq("h"), bits = 8).collect().length === 2)
  }

  test("withZValue: fractional layout column rejected at plan time") {
    import spark.implicits._
    val frac = Seq((1L, 1.5), (2L, 2.5)).toDF("id", "x")
    val pe = intercept[IllegalArgumentException] {
      Layout.withZValue(frac, Seq("x"), bits = 4)
    }
    assert(pe.getMessage.contains("must be integral"), pe.getMessage)
  }

  test("compactFiles: refuses in-place compaction under any path spelling (round-13 advice)") {
    import spark.implicits._
    val dir = tmpDir("inplace") + "/t"
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("a", "b")
      .repartition(4).write.parquet(dir)
    // the overwrite write would lazily re-read the directory it is
    // clearing — rejected at entry, before any file is touched
    val e = intercept[IllegalArgumentException] {
      Layout.compactFiles(spark, dir, dir, 64L << 10, None)
    }
    assert(e.getMessage.contains("outPath must differ"))
    // a different spelling of the same directory is still in-place
    val e2 = intercept[IllegalArgumentException] {
      Layout.compactFiles(spark, dir, dir + "/../t", 64L << 10, None)
    }
    assert(e2.getMessage.contains("outPath must differ"))
    // the source is untouched by either rejected call
    assert(spark.read.parquet(dir).count() === 100L)
  }

  test("fileAssignments/fileManifest: exact balanced ranks, stats match the model, pruning never wrong") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(5)
    val rows = (0 until 5000).map(i =>
      (i.toLong, rng.nextInt(1000).toLong, rng.nextInt(100000) / 100.0))
    val df = rows.toDF("id", "k", "v").repartition(7) // layout must not matter
    val order = Seq(col("k").asc, col("id").asc)
    val asg = Layout.fileAssignments(df, order, 8)
    val got = asg.select("id", "file_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // model: exact 0-based rank over the total order (k, id)
    val model = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> (i.toLong * 8 / 5000) }.toMap
    assert(got === model)
    // manifest: per-file stats equal the model's group stats
    val man = Layout.fileManifest(df, order, 8, Seq("k", "v"))
      .collect().map(r => r.getAs[Long]("file_id") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("k_min"), r.getAs[Long]("k_max"),
          r.getAs[Long]("k_nulls"))).toMap
    val byFile = rows.groupBy(r => model(r._1))
    assert(man.keySet === byFile.keySet)
    byFile.foreach { case (f, rs) =>
      assert(man(f) === ((rs.size.toLong, rs.map(_._2).min, rs.map(_._2).max, 0L)), s"file $f")
    }
    // pruning is conservative in exactly one direction: a pruned file
    // provably holds NO match, so the union of surviving files is exact
    val manDf = Layout.fileManifest(df, order, 8, Seq("k", "v"))
    val pr = Layout.pruneRange(manDf, "k", lit(200L), lit(400L), "hit")
      .collect().map(r => r.getAs[Long]("file_id") -> r.getAs[Boolean]("hit")).toMap
    byFile.foreach { case (f, rs) =>
      val hasMatch = rs.exists(r => r._2 >= 200L && r._2 < 400L)
      if (hasMatch) assert(pr(f), s"file $f wrongly pruned")
    }
    val pe = Layout.pruneEqual(manDf, "k", lit(555L), "hit")
      .collect().map(r => r.getAs[Long]("file_id") -> r.getAs[Boolean]("hit")).toMap
    byFile.foreach { case (f, rs) =>
      if (rs.exists(_._2 == 555L)) assert(pe(f), s"file $f wrongly pruned (eq)")
    }
    // physical write parity: partitionBy(file_id) dirs hold exactly the
    // manifest's row counts — the manifest IS the written layout's stats
    val out = tmpDir("manifest") + "/t"
    asg.write.partitionBy("file_id").parquet(out)
    val back = spark.read.parquet(out)
      // partition-column type inference reads file_id back as INT
      .groupBy(col("file_id").cast("long").as("file_id"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back === man.view.mapValues(_._1).toMap)
  }

  test("z-ordered manifest: two-dim probes prune conservative-exactly — " +
      "every matching row lives in a file both probes keep") {
    import org.apache.spark.sql.functions._
    val ord = Tables.load(spark, "/root/testdata/sf0.001", "orders").select(
      col("o_orderkey"), col("o_custkey"),
      unix_date(col("o_orderdate").cast("date")).as("o_day"))
    val z = Layout.withZValue(ord, Seq("o_day", "o_custkey"), bits = 8)
      .localCheckpoint() // assignment read twice: manifest + row audit
    val asg = Layout.fileAssignments(
      z, Seq(col("z_value").asc, col("o_orderkey").asc), 8)
    val man = Layout.fileManifest(
      z, Seq(col("z_value").asc, col("o_orderkey").asc), 8,
      Seq("o_day", "o_custkey"))
    val (dLo, dHi, cLo, cHi) = (9312L, 9404L, 0L, 300L)
    val keep = Layout.pruneRange(
      Layout.pruneRange(man, "o_day", lit(dLo), lit(dHi), "td"),
      "o_custkey", lit(cLo), lit(cHi), "tc")
      .filter(col("td") && col("tc"))
      .select("file_id").collect().map(_.getLong(0)).toSet
    // conservative: every row matching BOTH predicates is in a kept file
    val matching = asg.filter(
      col("o_day") >= dLo && col("o_day") < dHi &&
        col("o_custkey") >= cLo && col("o_custkey") < cHi)
      .select("file_id").distinct().collect().map(_.getLong(0)).toSet
    assert(matching.nonEmpty && matching.subsetOf(keep),
      s"files holding matches $matching escaped the kept set $keep")
    // and the z layout genuinely prunes: both-dim survivors < all files
    assert(keep.size < 8, s"no pruning: kept ${keep.size}/8 files")
  }

  test("withHilbertValue: full-grid walk is a bijection whose consecutive " +
      "indices are ALWAYS grid neighbors (the property z-order lacks)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bits = 3 // 8x8 grid, all 64 cells
    val cells = for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong)
    val df = cells.toDF("x", "y")
    val got = Layout.withHilbertValue(df, Seq("x", "y"), bits)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bijection onto [0, 64)
    assert(got.values.toSet === (0L until 64L).toSet)
    // Hilbert property: d and d+1 are Manhattan-distance-1 neighbors
    val byD = got.toSeq.sortBy(_._2).map(_._1)
    byD.sliding(2).foreach { case Seq((x0, y0), (x1, y1)) =>
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"jump between d cells ($x0,$y0) -> ($x1,$y1)")
    }
    // z-order on the same grid violates it (sanity that the property is
    // discriminating, not vacuous)
    val z = Layout.withZValue(df, Seq("x", "y"), bits)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val zJumps = z.toSeq.sortBy(_._2).map(_._1).sliding(2).count {
      case Seq((x0, y0), (x1, y1)) => math.abs(x0 - x1) + math.abs(y0 - y1) > 1
    }
    assert(zJumps > 0, "z-order unexpectedly adjacency-preserving")
    // interpreted eval agrees with codegen (same kernel, both paths)
    val interp = cells.map { case (x, y) =>
      graft.functions.HilbertIndex(
        org.apache.spark.sql.catalyst.expressions.Literal(x),
        org.apache.spark.sql.catalyst.expressions.Literal(y), bits)
        .eval(null).asInstanceOf[Long]
    }
    assert(interp.toSet === (0L until 64L).toSet)
    assert(cells.zip(interp).forall { case (c, dv) => got(c) == dv })
    // layout determinism
    val again = Layout.withHilbertValue(df.repartition(5), Seq("x", "y"), bits)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again === got)
  }
}
