package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{kernels, ArrayKernels}

/** Native kernel expressions vs independent Scala set/sequence models,
  * driven through the DataFrame surface (covers the codegen path for the
  * per-pair kernels and the eval path for the CodegenFallback ones). */
class KernelsSpec extends SparkSpec {

  test("sortedIntersectCount == Set.intersect on random sorted-distinct arrays") {
    import spark.implicits._
    val rng = new Random(11)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rng.nextInt(30))(rng.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rng.nextInt(30))(rng.nextInt(40).toLong).distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    val got = rows.toDF("a", "b", "expect")
      .withColumn("got", ArrayKernels.sortedIntersectCount(col("a"), col("b")))
      .filter(col("got") =!= col("expect")).count()
    assert(got == 0)
  }

  test("sortedJaccardGeq: exact for >= t, -1 only when truly below t") {
    import spark.implicits._
    val rng = new Random(17)
    // 0.4 is NOT binary-exact: the raw floating requirement t(n+m)/(1+t)
    // rounds UP, which a naive bail compares against and silently drops
    // exact-boundary pairs (caught live: 78k pairs at sf0.1)
    val t = 0.4
    val boundary = {
      // |A|=14, |B|=21, |A∩B|=10 -> jaccard = 10/25 = 0.4 exactly
      val common = (0L until 10L)
      ((common ++ (100L until 104L)).sorted,
        (common ++ (200L until 211L)).sorted,
        0.4)
    }
    val rows = boundary +: (1 to 400).map { _ =>
      // small value range -> plenty of overlap, so both branches exercise
      val a = Seq.fill(1 + rng.nextInt(30))(rng.nextInt(25).toLong).distinct.sorted
      val b = Seq.fill(1 + rng.nextInt(30))(rng.nextInt(25).toLong).distinct.sorted
      val i = a.toSet.intersect(b.toSet).size.toDouble
      (a, b, i / (a.size + b.size - i))
    }
    val got = rows.toDF("a", "b", "expect")
      .withColumn("got", ArrayKernels.sortedJaccardGeq(col("a"), col("b"), t))
      .collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    got.foreach { case (expect, g) =>
      if (expect >= t) assert(math.abs(g - expect) < 1e-12, s"exact for $expect")
      else assert(g == -1.0 || math.abs(g - expect) < 1e-12,
        s"below-threshold must be -1 or exact, got $g for $expect")
      // the filter semantics are what matters: (g >= t) <=> (expect >= t)
      assert((g >= t) == (expect >= t))
    }
    assert(got.count(_._1 >= t) > 10 && got.count(_._1 < t) > 10) // both sides hit
  }

  test("agreeCount / firstEqualIndex == zip models (incl. unequal lengths, empty)") {
    import spark.implicits._
    val rng = new Random(13)
    val rows = (1 to 200).map { _ =>
      val n = rng.nextInt(10); val m = rng.nextInt(10)
      val a = Seq.fill(n)(rng.nextInt(4).toLong)
      val b = Seq.fill(m)(rng.nextInt(4).toLong)
      val agree = a.zip(b).count { case (x, y) => x == y }
      val first = a.zip(b).indexWhere { case (x, y) => x == y } match {
        case -1 => 0
        case i => i + 1
      }
      (a, b, agree, first)
    }
    val bad = rows.toDF("a", "b", "eAgree", "eFirst")
      .withColumn("gAgree", ArrayKernels.agreeCount(col("a"), col("b")))
      .withColumn("gFirst", ArrayKernels.firstEqualIndex(col("a"), col("b")))
      .filter(col("gAgree") =!= col("eAgree") || col("gFirst") =!= col("eFirst"))
      .count()
    assert(bad == 0)
  }

  test("shingleHashes: sorted-distinct, matches string-shingle model cardinality") {
    import spark.implicits._
    def modelShingles(s: String, k: Int): Set[String] = {
      val n = s.trim.replaceAll("\\s+", " ").toLowerCase
      val cnt = math.max(n.length - k, 0) + 1
      (0 until cnt).map(i => n.substring(i, math.min(i + k, n.length))).toSet
    }
    val texts = Seq("", "ab", "hello world hello", "  MiXeD   Case  text ",
      "aaaaaaaaaa", "the quick brown fox jumps over the lazy dog")
    val rows = texts.map(t => (t, modelShingles(t, 5).size))
    val got = rows.toDF("text", "expectN")
      .withColumn("hs", graft.operators.Dedup.hashedShingles(col("text"), 5))
      .select(col("expectN"), size(col("hs")).as("gotN"),
        (col("hs") === array_sort(col("hs"))).as("sorted"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "cardinality")
      assert(r.getBoolean(2), "sortedness")
    }
  }

  test("minHashSig: correct length, elementwise-min property, jaccard estimate sane") {
    import spark.implicits._
    // signature of a union is the elementwise min of the signatures
    val a = Seq.fill(50)(Random.nextLong()).distinct
    val b = Seq.fill(50)(Random.nextLong()).distinct
    val df = Seq((a, b, a ++ b)).toDF("a", "b", "ab")
    val r = df.select(
      ArrayKernels.minHashSig(col("a"), 64).as("sa"),
      ArrayKernels.minHashSig(col("b"), 64).as("sb"),
      ArrayKernels.minHashSig(col("ab"), 64).as("sab")).head()
    val (sa, sb, sab) = (
      r.getSeq[Long](0), r.getSeq[Long](1), r.getSeq[Long](2))
    assert(sa.length == 64)
    assert(sab == sa.zip(sb).map { case (x, y) => math.min(x, y) })
  }

  test("vecCosine == HOF cosine composition; null on length mismatch") {
    import spark.implicits._
    val rng = new Random(31)
    val rows = (1 to 100).map { _ =>
      (Seq.fill(16)(rng.nextFloat()), Seq.fill(16)(rng.nextFloat()))
    }
    val hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => {
      def d(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
    }
    val bad = rows.toDF("a", "b")
      .select(
        ArrayKernels.vecCosine(col("a"), col("b")).as("k"),
        hof(col("a"), col("b")).as("h"))
      .filter(col("k") =!= col("h")) // bit-identical expected, not just close
      .count()
    assert(bad == 0)
    val mism = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
      .select(ArrayKernels.vecCosine(col("a"), col("b"))).head()
    assert(mism.isNullAt(0))
  }

  test("P14: withIngestTime stamps sink rows with processing time") {
    import spark.implicits._
    val before = System.currentTimeMillis() - 1000
    val out = graft.sources.Sinks.withIngestTime(Seq(1, 2).toDF("x"))
    val ts = out.select("ingest_ts").collect().map(_.getTimestamp(0).getTime)
    assert(ts.forall(t => t >= before && t <= System.currentTimeMillis() + 1000))
  }

  test("kernels.sortDistinct dedupes and sorts in place") {
    val a = Array(5L, 1L, 5L, 3L, 1L, 7L)
    val n = kernels.sortDistinct(a)
    assert(a.take(n).toSeq == Seq(1L, 3L, 5L, 7L))
    assert(kernels.sortDistinct(Array.empty[Long]) == 0)
  }

  test("charStats: hand values, empty/null edges, random == Scala histogram model") {
    import spark.implicits._
    def stats(s: String) = Seq(Tuple1(s)).toDF("t")
      .select(ArrayKernels.charStats(col("t")).as("c"))
      .select("c.n_chars", "c.n_distinct", "c.entropy_bits").head()
    val aab = stats("aab")
    assert(aab.getLong(0) == 3L && aab.getInt(1) == 2)
    // log2(3) - (2*log2(2) + 1*log2(1)) / 3
    assert(math.abs(aab.getDouble(2) - (math.log(3.0) / math.log(2.0) - 2.0 / 3.0)) < 1e-12)
    val uniform = stats("abcd")
    assert(uniform.getDouble(2) == 2.0 && uniform.getInt(1) == 4)
    val const = stats("aaaa")
    assert(const.getDouble(2) == 0.0 && const.getInt(1) == 1)
    val empty = stats("")
    assert(empty.getLong(0) == 0L && empty.getInt(1) == 0 && empty.isNullAt(2))
    // null text -> whole struct null (UnaryExpression null propagation)
    val n = Seq(Tuple1(null: String)).toDF("t")
      .select(ArrayKernels.charStats(col("t"))).head()
    assert(n.isNullAt(0))
    // non-ASCII code points count once each (no byte-level double counting)
    val uni = stats("é€é")
    assert(uni.getLong(0) == 3L && uni.getInt(1) == 2)
    // randomized vs a Scala code-point histogram model
    val rng = new Random(42)
    (1 to 50).foreach { _ =>
      val s = Seq.fill(rng.nextInt(60))(('a' + rng.nextInt(6)).toChar).mkString
      val got = stats(s)
      val hist = s.groupBy(identity).map(_._2.length)
      assert(got.getLong(0) == s.length.toLong)
      assert(got.getInt(1) == hist.size)
      if (s.nonEmpty) {
        val n = s.length.toDouble
        val want = hist.map(k => -(k / n) * (math.log(k / n) / math.log(2.0))).sum
        assert(math.abs(got.getDouble(2) - want) < 1e-9)
      } else assert(got.isNullAt(2))
    }
  }
}
