package graft

import org.apache.spark.sql.functions._

import graft.functions.ArrayKernels
import graft.operators.TextAnalysis

class BpeSpec extends SparkSpec {

  test("mergeAdjacentPair: greedy left-to-right, overlaps consumed, nulls pass through") {
    import spark.implicits._
    val df = Seq(
      Seq[String]("a", "a", "a"),
      Seq[String]("x", "a", "a", "y"),
      Seq[String]("a", "b", "a", "a"),
      Seq[String]("a", null, "a", "a")
    ).toDF("s")
    val got = df.select(ArrayKernels.mergeAdjacentPair(col("s"), "a", "a"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("aa", "a")) // standard greedy: aaa -> [aa, a]
    assert(got(1) == Seq("x", "aa", "y"))
    assert(got(2) == Seq("a", "b", "aa"))
    assert(got(3) == Seq("a", null, "aa"))
  }

  test("bpePairCounts: hand-counted weighted character pairs") {
    import spark.implicits._
    // "ab ab" + "ab" -> word 'ab' x3; "abc" -> a-b +1, b-c +1
    val df = Seq("ab ab", "ab", "abc").toDF("text")
    val got = TextAnalysis.bpePairCounts(df, "text", 1L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 4L, ("b", "c") -> 1L))
  }

  test("learnBpeMerges: the Sennrich corpus learns (e,s),(es,t),(l,o),(lo,w)") {
    import spark.implicits._
    // classic BPE example: low x5, lower x2, newest x6, widest x3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq(text).toDF("text")
    val got = TextAnalysis.learnBpeMerges(df, "text", 4).orderBy("rank")
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (e,s)=9 ties (s,t)=9 -> sym_l asc picks (e,s)
    assert(got(0) == ((1, "e", "s", 9L)))
    assert(got(1) == ((2, "es", "t", 9L)))
    // round 3: (l,o)=7 ties (o,w)=7 -> (l,o)
    assert(got(2) == ((3, "l", "o", 7L)))
    assert(got(3) == ((4, "lo", "w", 7L)))
  }

  test("applyBpeMerges: lowest-rank pair first, repeated to fixpoint") {
    import spark.implicits._
    // merges ranked: (e,s) < (es,t) < (l,o) < (lo,w)
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val df = Seq(
      Seq("l", "o", "w", "e", "s", "t"), // lowest -> [low, est]
      Seq("l", "o", "w"), // low -> [low]
      Seq("n", "e", "w"), // no applicable merge
      Seq("e", "s", "e", "s") // es twice in one round
    ).toDF("s")
    val got = df.select(ArrayKernels.applyBpeMerges(col("s"), merges))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("low", "est"))
    assert(got(1) == Seq("low"))
    assert(got(2) == Seq("n", "e", "w"))
    assert(got(3) == Seq("es", "es"))
  }

  test("encodeBpeTokenCount: per-doc counts from learned merges; null text -> 0") {
    import spark.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val df = Seq(
      (1L, "lowest low"), // [low, est] + [low] = 3
      (2L, "newest"), // n-e-w-est = 4
      (3L, null.asInstanceOf[String]),
      (4L, "   ") // whitespace only -> no words
    ).toDF("doc_id", "text")
    val got = TextAnalysis.encodeBpeTokenCount(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 4L, 3L -> 0L, 4L -> 0L))
  }

  test("saveBpeMerges/loadBpeMerges: persisted-vs-direct encode parity, " +
      "rank order preserved") {
    import spark.implicits._
    Seq("bpe_persist_spec_merges").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest") ++
      Seq.fill(6)("newer") ++ Seq.fill(3)("wider")).mkString(" ")
    val corpus = Seq(text).toDF("text")
    val merges = TextAnalysis.learnBpeMerges(corpus, "text", 6)
    val direct = merges.orderBy("rank").select("sym_l", "sym_r")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    TextAnalysis.saveBpeMerges(merges, "bpe_persist_spec")
    val loaded = TextAnalysis.loadBpeMerges(spark, "bpe_persist_spec")
    assert(loaded === direct && loaded.size === 6)
    val probe = Seq((1L, "lowest newer"), (2L, "wide low"), (3L, "xyz"))
      .toDF("doc_id", "text")
    def enc(m: Seq[(String, String)]) =
      TextAnalysis.encodeBpeTokenCount(probe, "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enc(loaded) === enc(direct))
    // a frame without the contract columns is rejected
    intercept[IllegalArgumentException] {
      TextAnalysis.saveBpeMerges(probe, "bpe_persist_bad")
    }
  }

  test("learnBpeMerges: driver fold == distributed ladder on the same " +
      "corpus (tie-breaks, early stop, multi-char merges)") {
    import spark.implicits._
    // corpus exercises: count ties broken by sym_l/sym_r byte order,
    // merged symbols re-entering later rounds, non-ASCII (2-byte UTF-8)
    // symbols where byte order != UTF-16 order would diverge, early stop
    val text = ((Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++
      Seq.fill(4)("héllo") ++ Seq.fill(2)("héllos")).mkString(" ") +
      " zq zq zq")
    val df = Seq(text, "aaa bbb aaa", text).toDF("text")
    def run(bound: Long) =
      TextAnalysis.learnBpeMergesBounded(df, "text", 12, 2L, bound)
        .orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    val driver = run(Long.MaxValue)
    val dist = run(0L)
    assert(driver === dist)
    assert(driver.nonEmpty)
    // early-stop parity at a high floor too
    def runFloor(bound: Long) =
      TextAnalysis.learnBpeMergesBounded(df, "text", 12, 11L, bound)
        .orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    assert(runFloor(Long.MaxValue) === runFloor(0L))
  }

  test("learnBpeMerges: stops early when nothing reaches minCount") {
    import spark.implicits._
    val df = Seq("ab cd ef").toDF("text")
    val got = TextAnalysis.learnBpeMerges(df, "text", 10, minCount = 2L)
    assert(got.count() == 0)
    val got2 = TextAnalysis.learnBpeMerges(df, "text", 10, minCount = 1L)
    // 3 two-char words: 3 merges exhaust every pair
    assert(got2.count() == 3)
  }
}
