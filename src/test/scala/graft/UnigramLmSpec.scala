package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Unigram-LM tokenizer induction: hand-pinned Viterbi (score argmax +
  * longest-qualifying backward rule), character coverage, learn determinism,
  * encode bookkeeping (exact BIGINT path scores, join-back zeros), and the
  * HALF_UP micro-logp boundary the cross-engine replay rests on. */
class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  test("viterbi: picks the higher-scoring segmentation; ties resolve to the longest piece") {
    // vocab: chars a,b (lp -100 each), "ab" (lp -150): "abab" best is
    // ab|ab (-300) over a|b|a|b (-400) and mixes (-350)
    val v = Map("a" -> -100L, "b" -> -100L, "ab" -> -150L)
    assert(TextAnalysis.unigramViterbi("abab", v, 4) === Seq("ab", "ab"))
    // exact tie: "ab" at -200 equals a|b at -200 -> longest piece wins
    val tie = Map("a" -> -100L, "b" -> -100L, "ab" -> -200L)
    assert(TextAnalysis.unigramViterbi("ab", tie, 4) === Seq("ab"))
    // chars-only coverage: no multi piece applies
    assert(TextAnalysis.unigramViterbi("ba", Map("a" -> -1L, "b" -> -2L,
      "ab" -> -1L), 4) === Seq("b", "a"))
  }

  test("microLogp: HALF_UP away from zero, matching SQL ROUND on doubles") {
    assert(TextAnalysis.microLogp(0.5) === -693147L) // ln(.5)*1e6 = -693147.18
    assert(TextAnalysis.microLogp(1.0) === 0L)
    // a .5 boundary rounds away from zero (DuckDB ROUND(-0.5) = -1)
    assert(java.math.BigDecimal.valueOf(-0.5)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue === -1L)
  }

  test("learn: deterministic across runs; vocabulary keeps every corpus character") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "a mat on the cat")).toDF("doc_id", "text")
    def run() = TextAnalysis.unigramLmLearn(df, "text", seedMulti = 10,
      emRounds = 3).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val a = run()
    assert(a === run())
    val pieces = a.map(_._1).toSet
    val chars = "thecatsonmr an".replace(" ", "").toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    // probabilities normalize: total count > 0 and every logp is negative
    assert(a.forall(_._4 <= 0L))
  }

  test("encode: path scores are exact vocab folds; docs with no tokens keep zeros") {
    val df = Seq(
      (1L, "the cat"),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmEncode(df, "doc_id", "text",
      seedMulti = 5, emRounds = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val (nw, np, sc) = out(1L)
    assert(nw === 2L && np >= 2L && sc < 0L)
    assert(out(2L) === ((0L, 0L, 0L)))
    assert(out(3L) === ((0L, 0L, 0L)))
  }

  test("encode: n_pieces bounded by characters and words; per-word stats reused per occurrence") {
    val df = Seq(
      (1L, "abc abc abc"),
      (2L, "abc")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmEncode(df, "doc_id", "text",
      seedMulti = 5, emRounds = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val (n1, p1, s1) = out(1L)
    val (n2, p2, s2) = out(2L)
    assert(n1 === 3L && n2 === 1L)
    // identical word -> identical per-occurrence stats, 3x in doc 1
    assert(p1 === 3 * p2 && s1 === 3 * s2)
    assert(p2 >= 1L && p2 <= 3L)
  }

  test("saveUnigramVocab/loadUnigramVocab: persisted-vs-direct encode " +
      "parity through unigramLmEncodeWith") {
    import spark.implicits._
    Seq("uni_persist_spec_vocab").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a cat ate the hat"),
      (3L, "a mat on the cat")).toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramLmLearn(corpus, "text",
      seedMulti = 10, emRounds = 2)
    // direct encode re-fits with the same hyperparameters -> the same
    // vocabulary, so encoding THROUGH the persisted frame must match it
    val direct = TextAnalysis.unigramLmEncode(corpus, "doc_id", "text",
      seedMulti = 10, emRounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4))).sortBy(_._1).toSeq
    TextAnalysis.saveUnigramVocab(vocab, "uni_persist_spec")
    val loaded = TextAnalysis.loadUnigramVocab(spark, "uni_persist_spec")
    val via = TextAnalysis.unigramLmEncodeWith(corpus, "doc_id", "text",
      loaded)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4))).sortBy(_._1).toSeq
    assert(via === direct && via.nonEmpty)
    // the frozen vocabulary also encodes UNSEEN corpora (chars it knows)
    val fresh = Seq((9L, "a cat on a mat"), (10L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmEncodeWith(fresh, "doc_id", "text",
      loaded).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(9L) >= 1L && out(10L) === 0L)
    intercept[IllegalArgumentException] {
      TextAnalysis.saveUnigramVocab(corpus, "uni_persist_bad")
    }
  }
}
