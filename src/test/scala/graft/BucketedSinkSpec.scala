package graft
// (Z-order cases live at the bottom of this suite — same sink family.)

import org.apache.spark.sql.functions._

import graft.sources.Sinks

class BucketedSinkSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](k: String, v: String)(body: => T): T = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("co-bucketed tables equi-join with ZERO exchanges and identical results") {
    val facts = (0 until 5000)
      .map(i => ((i % 97).toLong, i.toLong, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 97L).map(k => (k, s"d_$k")).toDF("k", "name")

    Sinks.writeBucketed(facts, "bkt_facts", Seq("k"), 8,
      path = Some(tmpDir("bkt-facts")))
    Sinks.writeBucketed(dims, "bkt_dims", Seq("k"), 8,
      path = Some(tmpDir("bkt-dims")))
    try {
      // disable broadcast so the shuffle-elimination claim is what's tested
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), Seq("k"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"co-bucketed join must not shuffle either side:\n$plan")
        val expect = facts.join(dims, Seq("k")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
          .toSet
        val got = joined.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
          .toSet
        assert(got === expect)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("aggregation on the bucket key skips its exchange too") {
    val facts = (0 until 2000).map(i => ((i % 50).toLong, i * 2.0)).toDF("k", "v")
    Sinks.writeBucketed(facts, "bkt_agg", Seq("k"), 4,
      path = Some(tmpDir("bkt-agg")))
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-key aggregation must not shuffle:\n$plan")
      assert(agg.count() === 50)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }

  test("writeBucketed validates its arguments") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Sinks.writeBucketed(df, "t", Nil, 4)
    }
    intercept[IllegalArgumentException] {
      Sinks.writeBucketed(df, "t", Seq("a"), 0)
    }
  }

  test("zValue: hand-computed bit interleavings") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (3L, 3L),
        (4095L, 0L), (0L, 4095L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Sinks.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)   // a occupies even bit positions
    assert(got((0L, 1L)) == 2L)   // b occupies odd bit positions
    assert(got((1L, 1L)) == 3L)
    assert(got((2L, 3L)) == 14L)  // 10 ⨯ 11 -> 1110
    assert(got((3L, 3L)) == 15L)
    // 12-bit values interleave into disjoint even/odd masks
    assert(got((4095L, 0L)) == 0x555555L)
    assert(got((0L, 4095L)) == 0xAAAAAAL)
    // out-of-range and NULL input fail LOUDLY instead of silently masking
    // high bits / clustering all null keys together
    for (bad <- Seq(Seq((java.lang.Long.valueOf(70000L), java.lang.Long.valueOf(1L))),
        Seq((null: java.lang.Long, java.lang.Long.valueOf(1L))))) {
      val err = intercept[Exception] {
        bad.toDF("a", "b")
          .select(Sinks.zValue(col("a"), col("b"), 16)).collect()
      }
      assert(err.getMessage.contains("zValue") ||
        Option(err.getCause).exists(_.getMessage.contains("zValue")))
    }
  }

  test("writeZOrdered: round-trips the data and clusters the curve per file") {
    import spark.implicits._
    val dir = tmpDir("zorder")
    val df = (0 until 4096).map(i => ((i * 2654435761L) % 64, (i * 40503L) % 64, i.toLong))
      .toDF("x", "y", "p")
    Sinks.writeZOrdered(df, dir, "x", "y", targetFiles = 8, bits = 6)
    val back = spark.read.parquet(dir)
    assert(back.count() == 4096)
    assert(back.select("x", "y", "p").collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
    // clustering evidence: per-file z ranges must be (near-)disjoint — the
    // max z of file i stays below the min z of file i+2 (allow one-file
    // overlap at range-partition boundaries)
    import org.apache.spark.sql.functions.{input_file_name, min => fmin, max => fmax}
    val ranges = back
      .select(Sinks.zValue(col("x"), col("y"), 6).as("z"),
        input_file_name().as("f"))
      .groupBy("f").agg(fmin("z").as("lo"), fmax("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(3).foreach {
      case Array((_, hi0), _, (lo2, _)) => assert(hi0 <= lo2,
        s"files overlap on the curve: ${ranges.mkString(", ")}")
      case _ =>
    }
  }

  test("saved BM25 index: the probe's term filter PRUNES postings buckets") {
    import graft.operators.TextAnalysis
    val docs = (0 until 400)
      .map(i => (i.toLong, s"w${i % 40} common filler t${i % 7}"))
      .toDF("doc_id", "text")
    val idx = TextAnalysis.buildBm25Index(docs, "doc_id", "text")
    TextAnalysis.saveBm25Index(idx, "bkt_bm25", numBuckets = 8)
    try {
      val loaded = TextAnalysis.loadBm25Index(spark, "bkt_bm25", "doc_id")
      val probe = TextAnalysis.probeBm25(loaded, Seq("common"), k = 5)
      val plan = probe.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(m.isDefined,
        s"postings scan must report bucket selection:\n${plan.take(2500)}")
      assert(m.get.group(1).toInt < m.get.group(2).toInt,
        s"term filter must prune buckets, read ${m.get.group(1)}/${m.get.group(2)}")
      // and the pruned probe still equals the in-memory index's answer
      val a = probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = TextAnalysis.probeBm25(idx, Seq("common"), k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b)
    } finally
      Seq("bkt_bm25_postings", "bkt_bm25_doclens", "bkt_bm25_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
