package graft

import org.apache.spark.sql.functions._

import graft.operators.SpanDedup

/** Sliding-window duplicated-span detection/removal vs a brute-force Scala
  * model of the same semantics. */
class SpanDedupSpec extends SparkSpec {

  private def toks(s: String): Vector[String] =
    s.replaceAll("\\s+", " ").trim.toLowerCase.split(" ", -1).toVector

  /** Brute-force: every (doc, offset) k-window, duplicated = same window
    * text at >1 (doc, offset) anywhere. */
  private def windows(
      corpus: Seq[(Long, String)], k: Int): Seq[(Long, Int, String)] =
    for {
      (id, text) <- corpus
      t = toks(text)
      i <- 0 to t.length - k
    } yield (id, i, t.slice(i, i + k).mkString(" "))

  // shared 5-token span "alpha beta gamma delta epsilon" planted in docs
  // 1, 2, and 3 at different offsets; doc 4 is clean; doc 5 is too short.
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "alpha beta gamma delta epsilon zz1 zz2 zz3 zz4",
    2L -> "yy1 yy2 alpha beta gamma delta epsilon yy3 yy4",
    3L -> "xx1 alpha  BETA gamma delta epsilon xx2 xx3 xx4",
    4L -> "unrelated tokens only here nothing shared at all",
    5L -> "tiny doc")

  private val k = 5

  test("duplicateSpanCoverage matches the brute-force window model") {
    import spark.implicits._
    val w = windows(corpus, k)
    val dupTexts = w.groupBy(_._3).filter(_._2.size > 1).keySet
    val expect = corpus.map { case (id, _) =>
      val mine = w.filter(_._1 == id)
      val dup = mine.count(x => dupTexts.contains(x._3))
      val frac =
        if (mine.isEmpty) 0.0
        else BigDecimal(dup.toDouble / mine.size + 1e-9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, mine.size.toLong, dup.toLong, frac)
    }.toSet

    val got = SpanDedup.duplicateSpanCoverage(
        corpus.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expect)
    // the corpus genuinely exercises both branches
    assert(expect.exists(_._3 > 0) && expect.exists(t => t._2 > 0 && t._3 == 0))
    // the sub-k doc reports (0, 0, 0.0)
    assert(expect.contains((5L, 0L, 0L, 0.0)))
  }

  test("stripDuplicateSpans keeps exactly the keeper occurrence's tokens") {
    import spark.implicits._
    val w = windows(corpus, k)
    val byText = w.groupBy(_._3)
    val dropped: Set[(Long, Int)] = (for {
      (_, occs) <- byText.toSeq if occs.size > 1
      keep = occs.minBy(o => (o._1, o._2))
      (id, pos, _) <- occs if (id, pos) != (keep._1, keep._2)
      i <- pos until pos + k
    } yield (id, i)).toSet
    val expect = corpus.map { case (id, text) =>
      val t = toks(text)
      val kept = t.indices.filterNot(i => dropped.contains((id, i))).map(t)
      (id, kept.mkString(" "), kept.size.toLong)
    }.toSet

    val got = SpanDedup.stripDuplicateSpans(
        corpus.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect)
    // doc 1 is the keeper (smallest (doc, offset)) — fully intact
    assert(expect.exists(t => t._1 == 1L && t._2 == toks(corpus.head._2).mkString(" ")))
    // docs 2 and 3 lost their copy of the span
    val d2 = got.find(_._1 == 2L).get
    assert(!d2._2.contains("gamma") && d2._3 < toks(corpus(1)._2).length)
  }

  test("null text and straddling duplicates behave as documented") {
    import spark.implicits._
    // the duplicated window straddles d08-style chunk cuts: offsets differ
    // across docs, which chunk dedup by construction cannot align — the
    // sliding form catches it (that's the whole point of t26 vs d08)
    val df = Seq[(java.lang.Long, String)](
      (10L, null),
      (11L, "a b c d e f g h"),
      (12L, "q r s t a b c d e f w z"))
      .toDF("doc_id", "text")
    val rows = SpanDedup.duplicateSpanCoverage(df, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows(10L) == ((0L, 0L)))          // null text → zero windows
    assert(rows(11L)._2 > 0 && rows(12L)._2 > 0) // cross-offset dup caught
    val strip = SpanDedup.stripDuplicateSpans(df, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(strip(10L) == "")
    assert(strip(11L) == "a b c d e f g h") // keeper doc intact
    assert(!strip(12L).contains("a b c d e f")) // non-keeper span removed
  }
}
