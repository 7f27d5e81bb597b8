package graft

import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Dedup, TextAnalysis}

import scala.util.Random

/** Round-17 optimization parity pins: every rewritten kernel/path must be
  * bit-identical to the form it replaced (the oracle hashes ride on it). */
class OptKernelSpec extends SparkSpec {

  test("hash56 kernel == conv(substring(md5(c),1,14),16,10) on random strings incl. unicode/empty/null") {
    import spark.implicits._
    val rng = new Random(17)
    val pool = "abc XYZ 0189-_:é☃😀日本語"
    val strs = (1 to 300).map { _ =>
      (1 to rng.nextInt(40)).map(_ => pool(rng.nextInt(pool.length))).mkString
    } ++ Seq("", "a", "😀")
    val df = strs.toDF("s")
    val got = df.select(
      Dedup.hash56(col("s")).as("k"),
      conv(substring(md5(col("s")), 1, 14), 16, 10).cast("long").as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // null in -> null out, like md5
    val n = Seq[Option[String]](None).toDF("s")
      .select(Dedup.hash56(col("s"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("winnowFingerprint offsets-walk form matches per-doc reference incl. non-ASCII") {
    import spark.implicits._
    // reference: the SQL/oracle construction — hash56 of every char 8-gram
    // of the normalized text, window-4 minima, distinct+sorted, first 8
    def ref(text: String): String = {
      val norm = text.trim.replaceAll("\\s+", " ").toLowerCase
      val n = norm.length // test strings are BMP-only => chars == code points
      val grams = (0 to math.max(n - 8, 0)).map { i =>
        val g = norm.substring(i, math.min(i + 8, n))
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8"))
        (0 until 7).foldLeft(0L)((h, j) => (h << 8) | (d(j) & 0xFFL))
      }
      val mins = (0 to math.max(grams.size - 4, 0)).map { w =>
        grams.slice(w, math.min(w + 4, grams.size)).min
      }
      mins.distinct.sorted.take(8).mkString(",")
    }
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld ünicode tëxt with áccents everywhere",
      "short", "", "  spaced   out   tokens   here  ",
      "日本語のテキストです これはテストです")
    val out = TextAnalysis.withFingerprint(docs.toDF("text"), "text")
      .select("text", "fingerprint").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    docs.foreach { t => assert(out(t) == ref(t), s"doc: $t") }
  }

  test("charShingles kernel == array_distinct(transform(sequence…substr)) incl. short/empty/unicode") {
    import spark.implicits._
    val rng = new Random(23)
    val pool = "ab c1é☃x"
    val strs = (1 to 200).map { _ =>
      (1 to rng.nextInt(30)).map(_ => pool(rng.nextInt(pool.length))).mkString
    } ++ Seq("", "ab", "aaaa", "日本語テキスト")
    val k = 3
    val df = strs.toDF("s")
    val rows = df.select(
      operators.Dedup.charShingles(col("s"), k).as("got"),
      array_distinct(transform(
        sequence(lit(0), greatest(
          length(lower(trim(regexp_replace(col("s"), "\\s+", " ")))) - k, lit(0))),
        i => lower(trim(regexp_replace(col("s"), "\\s+", " "))).substr(i + 1, lit(k))))
        .as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("phraseCount kernel == the sequence/filter HOF form on random token arrays") {
    import spark.implicits._
    val rng = new Random(31)
    val vocab = Seq("hash", "join", "scan", "x")
    val docs = (1 to 300).map { _ =>
      (1 to rng.nextInt(20)).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")
    } ++ Seq("hash join hash join", "hash", "", "hash join join hash join")
    // reference: count start positions by hand
    def ref(s: String): Long = {
      val t = s.trim.toLowerCase.split("\\s+").filter(_ => true)
      (0 to t.length - 2).count(i => t(i) == "hash" && t(i + 1) == "join").toLong
    }
    val out = TextAnalysis.phraseCount(
      docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("doc_id", "text"),
      "doc_id", "text", Seq("hash", "JOIN"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.zipWithIndex.foreach { case (d, i) =>
      val expect = ref(d)
      if (expect > 0) assert(out(i.toLong) == expect, s"doc: $d")
      else assert(!out.contains(i.toLong), s"doc: $d")
    }
  }

  test("logisticFit driver fast path == distributed ladder on the same 1-partition frame") {
    import spark.implicits._
    val rng = new Random(5)
    val rows = (1 to 500).map { i =>
      val x1 = rng.nextDouble() * 2 - 1
      val x2 = rng.nextDouble() * 2 - 1
      val y = if (x1 + 2 * x2 + 0.3 * rng.nextGaussian() > 0) 1.0 else 0.0
      (x1, x2, y)
    }
    val df = rows.toDF("x1", "x2", "y").repartition(1).cache()
    df.count()
    val fast = Classifier.logisticFitImpl(
      df, Seq("x1", "x2"), "y", iters = 24, lr = 2.0, driverFastPath = true)
      .collect()(0)
    val dist = Classifier.logisticFitImpl(
      df, Seq("x1", "x2"), "y", iters = 24, lr = 2.0, driverFastPath = false)
      .collect()(0)
    assert(fast == dist)
    df.unpersist()
  }

  test("logisticFit fast path: empty input yields the all-null row, like the ladder") {
    import spark.implicits._
    val df = Seq.empty[(Double, Double)].toDF("x", "y").repartition(1)
    val fast = Classifier.logisticFitImpl(
      df, Seq("x"), "y", iters = 3, lr = 1.0, driverFastPath = true).collect()(0)
    val dist = Classifier.logisticFitImpl(
      df, Seq("x"), "y", iters = 3, lr = 1.0, driverFastPath = false).collect()(0)
    assert(fast == dist)
    assert(fast.isNullAt(1)) // intercept null on empty input
  }

  test("langIdNgram kernel scorer == the relational explode/join/window " +
      "form incl. ties, zero overlap, null and short texts, non-ASCII") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "der schnelle braune fuchs springt über den faulen hund", "de"),
      (3L, "the lazy dog sleeps in the sun all day long", "en"),
      (4L, "über den wolken muss die freiheit wohl grenzenlos sein", "de"),
      (5L, "zz", "en"), // short text: single whole-string shingle
      (6L, null.asInstanceOf[String], "de"), // null text -> unk/0
      (7L, "日本語のテキストです、これは完全に別の文字です", "ja"),
      (8L, "xqv jkw zpf", "ja") // likely zero overlap -> unk/0
    ).toDF("doc_id", "text", "lang")
    val topN = 25
    val got = TextAnalysis.langIdNgram(docs, "doc_id", "text", "lang", topN)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // the pre-round-17 relational form, verbatim
    val exploded = docs.select(
        col("doc_id").as("_id"), col("lang").as("_lab"),
        explode(Dedup.charShingles(col("text"), 3)).as("_tri"))
      .persist()
    val counts = exploded.groupBy("_lab", "_tri").agg(count(lit(1)).as("_c"))
    val byLang = Window.partitionBy("_lab")
      .orderBy(col("_c").desc, col("_tri").asc)
    val profile = counts
      .withColumn("_rk", row_number().over(byLang))
      .filter(col("_rk") <= topN)
      .select(col("_lab").as("_plab"), col("_tri"))
    val overlap = exploded.select("_id", "_tri")
      .join(profile, Seq("_tri"))
      .groupBy("_id", "_plab").agg(count(lit(1)).as("_ov"))
    val byDoc = Window.partitionBy("_id")
      .orderBy(col("_ov").desc, col("_plab").asc)
    val pred = overlap
      .withColumn("_rk", row_number().over(byDoc)).filter(col("_rk") === 1)
    val ref = docs.select(col("doc_id"))
      .join(pred, col("doc_id") === pred("_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_plab"), lit("unk")).as("lang_pred"),
        coalesce(col("_ov"), lit(0L)).as("n_shared"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    exploded.unpersist()
    assert(got === ref)
    assert(got.exists(_._2 == "unk")) // the zero-overlap/null rows exercised
  }
}
