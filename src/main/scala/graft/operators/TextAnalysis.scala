package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: tokenization, language
  * heuristics, quality scoring, and document fingerprinting.
  *
  * North-star extension (the reference's only string op is a `contains`
  * predicate, `…/dodetl/stp/DataTransformer.scala:116`). Everything here is
  * built-in Catalyst expressions (split/filter/regexp/higher-order functions)
  * so it stays inside whole-stage codegen — no UDFs on the 100 TB hot path.
  */
object TextAnalysis {

  /** Shared stopword list; mirrored literally in the DuckDB oracles. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks)
  }

  /** N-gram-free language heuristic: stopword density ⇒ English-like.
    * (A real model is out of scope; the heuristic is deterministic and
    * mirrored in SQL for the oracle.) */
  def langIdHeuristic(c: Column): Column =
    when(stopwordRatio(c) >= lit(0.1), "en").otherwise("unk")

  /** BPE-ish token count: letter runs, digit runs, and single non-space
    * symbols — the pre-tokenization most BPE vocabularies apply.
    * Takes the column name (builds a SQL expression). */
  def bpeTokenCount(textCol: String): Column =
    size(expr(s"regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))

  /** Quality metrics + a deterministic linear score clamped to [0, 1]. */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    val nToks = tokenCount(c)
    val nonSpaceLen = length(regexp_replace(c, "\\s", ""))
    val avgTokLen = nonSpaceLen.cast("double") / nToks
    val punct = size(expr(
      s"regexp_extract_all($textCol, '[^A-Za-z0-9\\\\s]', 0)"))
    val punctRatio = punct.cast("double") / length(c)
    val stopR = stopwordRatio(c)
    val score = least(
      lit(1.0),
      greatest(lit(0.0),
        lit(0.2) + lit(0.05) * avgTokLen + lit(0.5) * stopR - lit(2.0) * punctRatio))
    df.withColumn("n_tokens", nToks)
      .withColumn("avg_token_len", round(avgTokLen, 6))
      .withColumn("punct_ratio", round(punctRatio, 6))
      .withColumn("stopword_ratio", round(stopR, 6))
      .withColumn("quality_score", round(score, 6))
      .withColumn("keep", score >= lit(0.5))
  }

  /** Winnowing-style rolling-hash fingerprint: char k-gram hash56 values,
    * sliding-window minima, distinct + sorted, first `take` kept, joined to a
    * comma-separated string — equal fingerprints ⇒ near-identical documents.
    * String output (not array<long>) so the result is sortable/hashable by
    * any comparison harness; hash56 (md5-derived, [[Dedup.hash56]]) so the
    * DuckDB oracle reproduces it exactly. */
  def withFingerprint(
      df: DataFrame, textCol: String, k: Int = 8, window: Int = 4,
      take: Int = 8, out: String = "fingerprint"): DataFrame = {
    df.withColumn(
      out,
      graft.functions.ArrayKernels.winnowFingerprint(
        Dedup.normalizeText(col(textCol)), k, window, take))
  }
}
