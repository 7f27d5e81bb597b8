package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Vocabulary bound below which [[learnBpeMerges]] folds merge rounds on
    * the driver (segmentation frames are model state, not corpus — ~tens
    * of MB at this bound); above it the distributed per-round ladder runs
    * unchanged. */
  val DriverBpeVocabBound: Long = 500000L

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

  /** Corpus-trained character-trigram language ID.
    *
    * Train: per label, the `topN` trigrams with the highest document
    * frequency (distinct trigrams per doc; ties broken lexicographically).
    * Classify: per doc, the label whose profile shares the most trigrams
    * (ties → smallest label; no overlap → "unk").
    *
    * Everything is relational — trigram explode, per-label windowed top-N,
    * profile join, per-doc argmax — so both training and inference run as
    * one Spark job, and the DuckDB oracle reproduces it exactly (integer
    * counts, deterministic tie-breaks). Scale: profiles are labels × topN
    * rows (tiny → broadcast); the windows partition by label / doc id, never
    * globally. At 100 TB you'd train the profile on a sample and persist it;
    * the classify side is unchanged.
    *
    * Output: (idCol, lang_pred, n_shared).
    */
  def langIdNgram(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      topN: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // TWO-PHASE form (round-17, guide §2.1/§4.1): phase 1 builds the
    // per-language topN trigram profiles — one explode + aggregate pass,
    // collected as BOUNDED MODEL state (≤ topN × nLangs strings, the
    // tokenizer-family build-once discipline). Phase 2 scores every doc
    // in one primitive scan ([[graft.functions.ArrayKernels
    // .langProfileOverlap]]): distinct char trigrams against the profile
    // sets, argmax with the same (ov desc, lang asc) tie-break the old
    // row_number window applied. Replaces the corpus-trigram persist, the
    // trigram join, and both windows — the previous shape's entire
    // shuffled surface; results bit-identical (spec-pinned against the
    // relational form, incl. ties, zero overlap, null/short texts).
    val exploded = df.select(
        col(labelCol).as("_lab"),
        explode(Dedup.charShingles(col(textCol), 3)).as("_tri"))
    val counts = exploded.groupBy("_lab", "_tri").agg(count(lit(1)).as("_c"))
    val byLang = Window.partitionBy("_lab").orderBy(col("_c").desc, col("_tri").asc)
    val profRows = counts
      .withColumn("_rk", row_number().over(byLang))
      .filter(col("_rk") <= topN)
      .select(col("_lab"), col("_tri"))
      .collect()
    val profiles = profRows.groupBy(_.getString(0)).toSeq
      .map { case (l, rs) => (l, rs.map(_.getString(1)).toSeq) }
    if (profiles.isEmpty)
      df.select(col(idCol), lit("unk").as("lang_pred"),
        lit(0L).as("n_shared"))
    else {
      val po = graft.functions.ArrayKernels
        .langProfileOverlap(col(textCol), 3, profiles)
      df.select(col(idCol), po.as("_po"))
        .select(
          col(idCol),
          coalesce(col("_po.lang"), lit("unk")).as("lang_pred"),
          coalesce(col("_po.ov"), lit(0L)).as("n_shared"))
    }
  }

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

  /** Deterministic train/validation/test assignment: md5-hash the id into
    * one of `buckets` buckets ([[Dedup.hash56]], so the split is identical
    * on every engine, run, and cluster size — re-running the pipeline never
    * migrates a document across splits, the property random `sample()` lacks).
    * Buckets `< trainUpTo` → train, `< valUpTo` → validation, rest → test.
    * Pure per-row expression: no shuffle, no state, trivially 100 TB-safe. */
  def deterministicSplit(
      df: DataFrame, idCol: String, buckets: Int = 100,
      trainUpTo: Int = 90, valUpTo: Int = 95): DataFrame = {
    require(0 < trainUpTo && trainUpTo <= valUpTo && valUpTo <= buckets)
    val bucket = pmod(Dedup.hash56(col(idCol).cast("string")), lit(buckets.toLong))
    df.withColumn("bucket", bucket)
      .withColumn(
        "split",
        when(col("bucket") < trainUpTo, "train")
          .when(col("bucket") < valUpTo, "validation")
          .otherwise("test"))
  }

  /** Global top-`k` most frequent tokens — the exact heavy-hitters query
    * (corpus vocabulary audits, boilerplate detection, stopword discovery).
    * Shape: explode → hash agg (map-side combine, shuffle ∝ DISTINCT tokens,
    * not token occurrences) → `TakeOrderedAndProject` for the top-k (each
    * partition keeps k rows; only k×partitions rows reach the driver side of
    * the sort — no global sort materializes). Ties break lexicographically
    * so the cut at `k` is deterministic. For streaming or
    * memory-bounded approximation, pair with
    * [[graft.functions.Sketches]] count-min estimates. */
  def topTerms(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)

  /** Email/phone patterns shared by redaction and counting — written in the
    * common subset of Java regex and RE2 so the DuckDB oracle applies the
    * IDENTICAL pattern. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"

  /** PII scrub for training corpora: replace every email/phone match with a
    * typed placeholder token. Pure per-row codegen'd expressions — no
    * shuffle, no UDF; at 100 TB this runs entirely inside the scan stage. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Count of email / phone matches (for redaction audit columns). */
  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe))

  /** Distinct `n`-token-gram set of the normalized text, as strings (the
    * decontamination unit; GPT-3-style dedup uses 13-grams — configurable
    * because short corpora need shorter grams). `let`-bound so the
    * tokenization runs once per row, not once per gram. */
  def tokenNgrams(c: Column, n: Int): Column =
    let(split(Dedup.normalizeText(c), " ")) { toks =>
      array_distinct(
        transform(
          sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
    }

  /** Non-distinct `n`-token-grams (repetition counting needs multiplicity —
    * [[tokenNgrams]] is the distinct-set form). `let`-bound tokenization. */
  def tokenNgramsAll(c: Column, n: Int): Column =
    let(split(Dedup.normalizeText(c), " ")) { toks =>
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))
    }

  /** Repetition-based quality filters (the Gopher-rule family, Rae et al.
    * 2021): the fraction of all `n`-grams taken by the single most frequent
    * one, and the fraction of tokens that are repeats — high values flag
    * boilerplate/spam that length or stopword ratios miss.
    *
    * Shape: gram explode → per-(doc, gram) hash count → per-doc max/sum —
    * every step map-side combines, shuffle ∝ gram occurrences, no per-row
    * interpreted fold. Output: (idCol, n_tokens, top_ngram_ratio,
    * dup_token_ratio, keep). */
  def repetitionStats(
      df: DataFrame, idCol: String, textCol: String, n: Int = 2,
      maxTopNgramRatio: Double = 0.2,
      maxDupTokenRatio: Double = 0.3): DataFrame = {
    val grams = df.select(
      col(idCol).as("_id"),
      explode(tokenNgramsAll(col(textCol), n)).as("_gram"))
    val perGram = grams.groupBy("_id", "_gram").agg(count(lit(1)).as("_c"))
    val perDoc = perGram.groupBy("_id")
      .agg(max(col("_c")).as("_top"), sum(col("_c")).as("_total"))
    // plain per-row expression (duplicated subexpr is fine OUTSIDE a lambda —
    // it evaluates per row, not per element; codegen CSEs it)
    val toks = split(Dedup.normalizeText(col(textCol)), " ")
    val base = df.select(
      col(idCol).as("_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("_distinct"))
    val topRatio = col("_top").cast("double") / col("_total")
    val dupRatio =
      lit(1.0) - col("_distinct").cast("double") / col("n_tokens")
    base.join(perDoc, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        col("n_tokens"),
        round(topRatio, 6).as("top_ngram_ratio"),
        round(dupRatio, 6).as("dup_token_ratio"),
        (topRatio <= maxTopNgramRatio && dupRatio <= maxDupTokenRatio)
          .as("keep"))
  }

  /** Duplicate-n-gram COVERAGE (the other Gopher repetition axis, Rae et
    * al. 2021): the fraction of a document's token positions lying inside
    * at least one n-gram that occurs ≥ 2 times in that document.
    * [[repetitionStats]]'s top-gram ratio is blind to a document whose
    * repetition is spread over MANY different recurring phrases — coverage
    * is exactly the measure that catches it. Output: `(idCol, n_tokens,
    * n_dup_grams, dup_coverage, keep)` — `n_dup_grams` = distinct repeating
    * grams, coverage 6 dp, `keep ⇔ coverage ≤ maxCoverage` (tested on the
    * UNROUNDED int/int ratio — exact in any engine).
    *
    * Shape: positional gram explode → per-(doc, gram) hash count → the
    * repeating-gram set joins back gram-wise (shuffle ∝ gram occurrences,
    * both sides pre-keyed by (doc, gram)) → covered positions explode n
    * rows per repeated occurrence → per-doc distinct count. No pairwise
    * comparison, no window; every aggregate map-side combines. A gram at
    * start index i covers positions i..i+n−1, which cannot pass the text
    * end: documents shorter than n tokens yield ONE truncated gram that
    * can never repeat. */
  def dupNgramCoverage(
      df: DataFrame, idCol: String, textCol: String, n: Int = 3,
      maxCoverage: Double = 0.3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = df.select(
      col(idCol).as("_id"),
      posexplode(tokenNgramsAll(col(textCol), n)).as(Seq("_pos", "_gram")))
    val dup = grams.groupBy("_id", "_gram")
      .agg(count(lit(1)).as("_c"))
      .where(col("_c") >= 2)
    val covered = grams
      .join(dup.select("_id", "_gram"), Seq("_id", "_gram"))
      .select(
        col("_id"),
        explode(sequence(col("_pos"), col("_pos") + lit(n - 1))).as("_p"))
      .groupBy("_id").agg(count_distinct(col("_p")).as("_cov"))
    val dupCounts = dup.groupBy("_id")
      .agg(count(lit(1)).as("_ndup"))
    val toks = split(Dedup.normalizeText(col(textCol)), " ")
    val base = df.select(col(idCol).as("_id"), size(toks).as("n_tokens"))
    val ratio =
      coalesce(col("_cov"), lit(0L)).cast("double") / col("n_tokens")
    base
      .join(dupCounts, Seq("_id"), "left")
      .join(covered, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        col("n_tokens"),
        coalesce(col("_ndup"), lit(0L)).as("n_dup_grams"),
        stableRound(ratio, 6).as("dup_coverage"),
        (ratio <= maxCoverage).as("keep"))
  }

  /** PER-ROW form of [[dupNgramCoverage]]'s coverage ratio — value-identical
    * by construction (spec-pinned on real docs), but a pure scalar
    * expression with no explode/aggregate, so it composes into the
    * STREAMING hygiene gate ([[graft.streaming.StreamingHygiene]]) where a
    * groupBy cannot (append-mode streams take only per-row transforms
    * before the sink).
    *
    * Mechanics, all inside one lambda tower: grams → duplicate-gram set
    * (sorted-adjacent-equal — O(g log g), not the O(g²) pairwise count) →
    * per-gram flags → covered-position count (each position scans its ≤ n
    * overlapping gram starts). Cost O(g·(|dups| + n)) per row with |dups|
    * tiny in real text; bounded by doc length, zero shuffle. Returns the
    * UNROUNDED ratio (callers round at their own boundary). */
  def dupCoverageRatio(c: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    let(split(Dedup.normalizeText(c), " ")) { toks =>
      let(transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))) { grams =>
        let(array_sort(grams)) { sorted =>
          let(array_distinct(filter(sorted, (x, i) =>
            i >= 1 && x === element_at(sorted, i)))) { dups =>
            let(transform(grams, g => array_contains(dups, g))) { fl =>
              let(size(fl)) { g =>
                aggregate(
                  sequence(lit(0), size(toks) - 1), lit(0L),
                  (acc, p) => {
                    val s = greatest(p - lit(n - 1), lit(0)) + 1
                    val len = greatest(
                      least(p, g - 1) - greatest(p - lit(n - 1), lit(0)) + 1,
                      lit(0))
                    acc + when(exists(slice(fl, s, len), b => b), 1L)
                      .otherwise(0L)
                  }).cast("double") / size(toks)
              }
            }
          }
        }
      }
    }
  }

  /** Flesch reading-ease + Flesch–Kincaid grade per document — the
    * READABILITY quality axis next to entropy (t39), lexical diversity
    * (t40), and repetition (t42): filters for "too simple" boilerplate or
    * "unreadably dense" legalese both need it. Counts use the classic
    * public heuristics: words = whitespace tokens containing an
    * alphanumeric, sentences = `[.!?]+`-delimited segments containing an
    * alphanumeric, syllables = vowel-run (`[aeiouy]+`) count per word
    * floored at 1. The three COUNTS are integers — exact in any engine —
    * so only the two final scores touch floating point (6dp-rounded).
    *
    * Shape: pure per-row lambda/regex kernels over the text — zero
    * shuffle, zero explode; at 100 TB it pipelines into the reading scan
    * like the rest of the hygiene family. Null-text rows are excluded
    * (no text, no readability); zero-word or zero-sentence docs keep
    * their counts with null scores. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = filter(split(trim(lower(t)), "\\s+"), w => w.rlike("[a-z0-9]"))
    val sents = size(filter(split(lower(t), "[.!?]+"), s => s.rlike("[a-z0-9]")))
      .cast("long")
    val syls = aggregate(ws, lit(0L), (acc, w) =>
      acc + greatest(
        size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))), lit(1))
        .cast("long"))
    df.where(t.isNotNull)
      .withColumn("n_words", size(ws).cast("long"))
      .withColumn("n_sentences", sents)
      .withColumn("n_syllables", syls)
      .select(
        col(idCol), col("n_words"), col("n_sentences"), col("n_syllables"),
        {
          val wps = col("n_words").cast("double") / col("n_sentences")
          val spw = col("n_syllables").cast("double") / col("n_words")
          when(col("n_words") > 0 && col("n_sentences") > 0,
            stableRound(
              lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6))
            .as("flesch")
        },
        {
          val wps = col("n_words").cast("double") / col("n_sentences")
          val spw = col("n_syllables").cast("double") / col("n_words")
          when(col("n_words") > 0 && col("n_sentences") > 0,
            stableRound(
              lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6))
            .as("fk_grade")
        })
  }

  /** Frozen whitespace-token vocabulary: distinct tokens with corpus
    * frequency ≥ `minCount` — the build half of [[oovRate]] (frequency
    * threshold rather than top-K: no tie-break ambiguity, and the cut is
    * the one BPE/wordpiece vocab builders actually apply first). One
    * explode + one token-keyed count; output `(_w, _n)` is
    * vocabulary-sized — persist it and score many corpora against it, the
    * frozen-model discipline of `trainDsir`/`trainNaiveBayes`. */
  def vocabulary(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    df.select(explode(tokens(col(textCol))).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_n"))
      .where(col("_n") >= minCount)
  }

  /** Out-of-vocabulary rate per document against a FROZEN [[vocabulary]]
    * frame — the tokenizer-fit readout ("how much of this corpus does my
    * vocab even cover?") run before committing a tokenizer, and the
    * domain-shift tripwire after (a rising OOV rate on a feed means the
    * vocab was built on different text). Output:
    * `(idCol, n_tokens, n_oov, oov_rate)`, counts exact integers,
    * rate 6dp. NULL-text documents emit NO row (nothing to cover —
    * the [[graft.operators.Classifier.scoreNaiveBayes]] explicit-absence
    * convention: left-join back and route them deliberately).
    *
    * Plan: one explode + (doc, token) count aggregate (shuffle ∝ distinct
    * doc-token pairs, map-side combined), one BROADCAST left join against
    * the vocabulary (MBs even web-scale), one doc-keyed fold. Nothing
    * corpus-sized moves twice. */
  def oovRate(
      df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = df
      .select(col(idCol), explode(tokens(col(textCol))).as("_w"))
      .groupBy(col(idCol), col("_w")).agg(count(lit(1)).as("_c"))
    toks
      .join(broadcast(vocab.select(col("_w"), lit(1).as("_in"))),
        Seq("_w"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("_c")).as("n_tokens"),
        sum(when(col("_in").isNull, col("_c")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        stableRound(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** Benchmark decontamination: flag training documents sharing at least
    * `minShared` n-token-grams with ANY benchmark document (the standard
    * guard against test-set leakage into training corpora). Returns
    * `(idCol, n_shared_grams)` for flagged training docs.
    *
    * Scale shape: benchmark grams explode to a DISTINCT gram set (size ∝
    * benchmark corpus, small by construction) and the match is a gram
    * equi-join against the training grams — shuffle ∝ gram occurrences, no
    * pairwise doc×doc comparison anywhere. At 100 TB the benchmark gram set
    * is broadcastable (benchmarks are MBs, not TBs) and Spark's AQE picks
    * that automatically from its size. */
  def contaminatedDocs(
      train: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      n: Int = 13, minShared: Int = 1): DataFrame =
    contaminatedDocsAgainst(
      train, benchmarkGramSet(benchmark, textCol, n), idCol, textCol, n,
      minShared)

  /** The build-once artifact behind [[contaminatedDocs]]: the benchmark's
    * DISTINCT `n`-gram set (`_gram`). Derive + persist it ONCE for probe-
    * many use ([[contaminatedDocsAgainst]], the streaming decontam attach)
    * — calling [[contaminatedDocs]] repeatedly re-runs this explode +
    * distinct per call. */
  def benchmarkGramSet(
      benchmark: DataFrame, textCol: String, n: Int = 13): DataFrame =
    benchmark
      .select(explode(tokenNgrams(col(textCol), n)).as("_gram"))
      .distinct()

  /** [[contaminatedDocs]] against a PREBUILT [[benchmarkGramSet]] — `n`
    * must match the geometry the gram set was built with (a mismatch
    * silently probes empty). */
  def contaminatedDocsAgainst(
      train: DataFrame, benchGrams: DataFrame,
      idCol: String, textCol: String,
      n: Int = 13, minShared: Int = 1): DataFrame = {
    val trainGrams = train.select(
      col(idCol), explode(tokenNgrams(col(textCol), n)).as("_gram"))
    trainGrams
      .join(benchGrams, Seq("_gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** Scored decontamination — [[contaminatedDocs]]'s binary flag graded into
    * the per-document CONTAMINATION FRACTION: of a training doc's distinct
    * `n`-grams, how many occur anywhere in the benchmark corpus. Returns
    * `(idCol, n_grams, n_shared, contam_score)` for every training doc that
    * has at least one gram; thresholding is the caller's policy (GPT-3-style
    * pipelines drop above a fraction rather than on first overlap).
    *
    * Same scale shape as [[contaminatedDocs]]: the benchmark collapses to
    * its DISTINCT gram set before moving (benchmarks are MBs — AQE
    * broadcasts the probe), the match is a LEFT gram equi-join so unshared
    * grams still count the denominator, and the per-doc ratio is one hash
    * aggregate — shuffle ∝ training gram occurrences, never doc×doc. */
  def contaminationScore(
      train: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val benchGrams = benchmark
      .select(explode(tokenNgrams(col(textCol), n)).as("_gram"))
      .distinct()
      .withColumn("_hit", lit(1L))
    val trainGrams = train.select(
      col(idCol), explode(tokenNgrams(col(textCol), n)).as("_gram"))
    trainGrams
      .join(benchGrams, Seq("_gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_shared"))
      .select(
        col(idCol), col("n_grams"), col("n_shared"),
        stableRound(
          col("n_shared").cast("double") / col("n_grams"), 6)
          .as("contam_score"))
  }

  /** Contamination span LOCALIZATION — [[contaminationScore]] tells you how
    * much of a doc overlaps the benchmark; this tells you WHERE: maximal
    * contiguous token ranges covered by benchmark-shared `n`-grams, as
    * `(idCol, span_start, span_end, n_grams)` (0-based token offsets,
    * inclusive). The surgical-removal / audit companion: drop the span,
    * keep the doc.
    *
    * Shape: positioned gram explode (∝ training tokens) → semi-join
    * against the benchmark's distinct gram set (benchmarks are MBs — AQE
    * broadcasts) → gaps-and-islands merge of overlapping hit windows. The
    * island window partitions by doc over HITS ONLY — bounded by the
    * contaminated-gram count of one doc, never the corpus, and only
    * matched docs reach it. */
  def contaminationSpans(
      train: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val benchGrams = benchmark
      .select(explode(tokenNgrams(col(textCol), n)).as("_gram"))
      .distinct()
    val pos = train
      .select(
        col(idCol).as("_id"),
        split(Dedup.normalizeText(col(textCol)), " ").as("_t"))
      .select(
        col("_id"),
        posexplode(
          when(
            size(col("_t")) >= n,
            transform(
              sequence(lit(1), size(col("_t")) - n + 1),
              i => concat_ws(" ", slice(col("_t"), i, lit(n)))))
            .otherwise(array().cast("array<string>"))))
      .withColumnsRenamed(Map("pos" -> "_pos", "col" -> "_gram"))
    val hits = pos.join(benchGrams, Seq("_gram"), "left_semi")
    val w = Window.partitionBy("_id").orderBy("_pos")
    hits
      .withColumn("_prev", lag(col("_pos"), 1).over(w))
      // spans [p, p+n-1] merge while they overlap or touch: p ≤ prev + n
      .withColumn(
        "_new",
        when(col("_prev").isNull || col("_pos") > col("_prev") + n, 1L)
          .otherwise(0L))
      .withColumn(
        "_grp",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("_id"), col("_grp"))
      .agg(
        min(col("_pos")).cast("long").as("span_start"),
        (max(col("_pos")) + (n - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(
        col("_id").as(idCol),
        col("span_start"), col("span_end"), col("n_grams"))
  }

  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct
    * `n`-token-grams that occur in no other document — the inverse of the
    * boilerplate signal (near-zero novelty = the doc is assembled from
    * corpus-common phrases; near-one = fresh text). Returns
    * `(idCol, n_grams, n_unique, novelty)`.
    *
    * Shape: distinct-gram explode → gram document-frequency hash aggregate
    * (map-side combined, shuffle ∝ DISTINCT grams) → equi-join back
    * (shuffle ∝ doc-gram pairs) → per-doc counts. Same scale family as
    * [[contaminatedDocs]]/[[tfIdfTopTerms]]: no doc×doc comparison, a
    * corpus-common gram is a hot GROUP KEY (combiner-absorbed), and at
    * 100 TB AQE picks broadcast vs shuffle for the frequency join from real
    * sizes. */
  def noveltyScore(
      df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val grams = df.select(
      col(idCol).as("_id"), explode(tokenNgrams(col(textCol), n)).as("_gram"))
    val dfreq = grams.groupBy("_gram").agg(count(lit(1)).as("_df"))
    grams.join(dfreq, Seq("_gram"))
      .groupBy("_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("_df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(
        col("_id").as(idCol), col("n_grams"), col("n_unique"),
        stableRound(
          col("n_unique").cast("double") / col("n_grams"), 6).as("novelty"))
  }

  /** Per-document top-`k` TF-IDF terms — the classic keyword/topic signal
    * for corpus exploration and per-document routing. Smoothed idf
    * `ln((N + 1) / (df + 1))`; scores round to 6dp BEFORE ranking so the
    * rank cut is deterministic on both engines (a last-ulp `ln` difference
    * cannot reorder terms; equal rounded scores break ties on the term).
    *
    * Shape: token explode → per-(doc, term) hash count (map-side combined,
    * shuffle ∝ distinct (doc, term)) → per-term document frequencies (small,
    * ∝ vocabulary — AQE broadcasts the join back) → corpus size as a
    * broadcast one-row frame (never a driver `collect`) →
    * [[TopK.perGroup]]'s two-pass rank (hot documents cannot straggle a
    * task, though `tokens-per-doc` already bounds the group). Tokens shorter
    * than `minTokenLen` are noise-pruned before any shuffle. */
  def tfIdfTopTerms(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, minTokenLen: Int = 3): DataFrame = {
    val toks = df.select(
        col(idCol).as("_id"), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) >= minTokenLen)
    val tf = toks.groupBy("_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("_df"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("_n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", stableRound(
        col("tf") * log((col("_n") + 1).cast("double") / (col("_df") + 1)), 6))
    TopK.perGroup(scored, Seq("_id"), Seq(col("tfidf").desc, col("term").asc), k)
      .select(col("_id").as(idCol), col("rank"), col("term"), col("tf"),
        col("tfidf"))
  }

  /** Top-`k` documents for a term query by BM25 (Robertson/Spärck Jones —
    * the lexical-retrieval baseline every RAG/decontamination pipeline
    * starts from). `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`, the standard
    * Lucene-style non-negative form; a query term repeated in `queryTerms`
    * weights its contribution by its multiplicity (standard qtf). Scores
    * round to 6dp (tie-broken by id) before the cut; zero-score docs (no
    * query term present) are dropped.
    *
    * Shape — deliberately NOT the explode+join shape of [[tfIdfTopTerms]]:
    * the query is a handful of CONSTANT terms, so per-doc term frequencies
    * compute as `size(filter(tokens, _ = term))` — per-row codegen'd
    * higher-order functions inside the scan stage, no token explode, no
    * (doc, term) shuffle at all. The corpus stats (N, avgdl, per-term df)
    * collapse into ONE one-row aggregate (all-in combiner, bytes moved ∝
    * #partitions) broadcast back; the finisher is
    * `orderBy(...).limit(k)` = `TakeOrderedAndProject` (partition-local
    * top-k). Total cost at 100 TB: two narrow scans + one scalar exchange —
    * a doc with a million tokens is just a longer per-row loop, never a hot
    * key. The token array is projected ONCE in its own select (a multi-use
    * non-cheap alias, which `CollapseProject` refuses to duplicate), so the
    * split runs once per row, not once per query term. */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: queryTerms must be non-empty")
    // standard BM25 query-term-frequency weighting: a term repeated in the
    // query multiplies its contribution by its multiplicity (qtf), it is
    // not silently deduped
    val terms = queryTerms.distinct
    val qtf = queryTerms.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val tfCols = terms.indices.map { i =>
      size(filter(col("_toks"), x => x === lit(terms(i))))
        .cast("double").as(s"_tf$i")
    }
    val perDoc = df
      .select(col(idCol).as("_id"), tokens(col(textCol)).as("_toks"))
      .select(
        (col("_id") +: size(col("_toks")).cast("double").as("_dl") +: tfCols): _*)
    val statAggs =
      avg(col("_dl")).as("_avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"_tf$i") > 0, 1.0).otherwise(0.0)).as(s"_df$i"))
    val stats = perDoc.agg(count(lit(1)).cast("double").as("_n"), statAggs: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i")
      val dfq = col(s"_df$i")
      val idf = log(lit(1.0) + (col("_n") - dfq + lit(0.5)) / (dfq + lit(0.5)))
      val contrib = idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl")))
      if (qtf(terms(i)) == 1.0) contrib else contrib * lit(qtf(terms(i)))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .withColumn("bm25", stableRound(score, 6))
      .filter(col("bm25") > 0)
      .select(col("_id").as(idCol), col("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** A materialized lexical index for repeated BM25 retrieval: the classic
    * inverted shape — per-(term, doc) postings, per-doc lengths, one-row
    * corpus stats. [[bm25TopK]] is the right plan for ONE ad-hoc query (two
    * narrow corpus scans); a retrieval/decontamination service issuing
    * thousands of queries should pay the corpus scans ONCE here and probe
    * term-sliced postings forever after — the same build-once/probe-many
    * split as [[graft.operators.Similarity.IvfIndex]]. Persisted via
    * [[saveBm25Index]] with postings BUCKETED on `term`, a probe's postings
    * filter prunes buckets and the candidate set never re-scans the
    * corpus. */
  final case class Bm25Index(
      postings: DataFrame, docLens: DataFrame, stats: DataFrame,
      idCol: String) {
    def persisted(): Bm25Index = {
      postings.persist(); docLens.persist(); stats.persist()
      postings.count(); docLens.count(); stats.count()
      this
    }
    def unpersisted(): Bm25Index = {
      postings.unpersist(); docLens.unpersist(); stats.unpersist(); this
    }
  }

  /** Build the inverted index: one exploded corpus pass for the postings
    * (map-side combined, shuffle ∝ distinct (term, doc)), one narrow pass
    * for doc lengths (kept separate rather than derived from postings so a
    * NULL-text doc still counts toward `N`/`avgdl` exactly as
    * [[bm25TopK]]'s per-row scan counts it — parity is spec-pinned). */
  def buildBm25Index(df: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val lens = df.select(
      col(idCol).as("_ix_id"),
      size(tokens(col(textCol))).cast("double").as("_dl"))
    val postings = df
      .select(col(idCol).as("_ix_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("term", "_ix_id").agg(count(lit(1)).cast("double").as("tf"))
    // _nl (docs with a real length) rides along solely so extendBm25Index
    // can merge avgdl exactly from one-row frames; probes ignore it
    val stats = lens.agg(
      count(lit(1)).cast("double").as("_n"), avg("_dl").as("_avgdl"),
      count(col("_dl")).cast("double").as("_nl"))
    Bm25Index(postings, lens, stats, idCol)
  }

  /** BM25 top-`k` against a prebuilt [[Bm25Index]] — identical scoring
    * contract to [[bm25TopK]] (Lucene idf, qtf multiplicity, 6-dp rounding,
    * zero-score drop), different cost model: work ∝ postings of the QUERY
    * terms, not corpus size. The term filter prunes postings (bucket-pruned
    * when the index is loaded from [[saveBm25Index]] tables); per-term
    * document frequencies fold from the already-sliced candidates; the
    * doc-length join is candidate-sized (AQE broadcasts the slice); the
    * finisher is the partition-local top-k. */
  def probeBm25(
      index: Bm25Index, queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "probeBm25: queryTerms must be non-empty")
    val terms = queryTerms.distinct
    val qtf = queryTerms.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val cand = index.postings.filter(col("term").isin(terms: _*))
    val dfreq = cand.groupBy("term").agg(count(lit(1)).cast("double").as("_df"))
    val contrib = cand
      .join(broadcast(dfreq), Seq("term"))
      .join(index.docLens, Seq("_ix_id"))
      .crossJoin(broadcast(index.stats))
      .select(
        col("_ix_id"), col("term"),
        (element_at(typedLit(qtf), col("term")) *
          (log(lit(1.0) + (col("_n") - col("_df") + lit(0.5)) / (col("_df") + lit(0.5))) *
            col("tf") * lit(k1 + 1.0) /
            (col("tf") + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl"))))).as("_c"))
    // fold per doc in FIXED query-term order, mirroring bm25TopK's
    // left-associated expression — a plain sum() accumulates in row order,
    // which is partition-dependent, and double addition is not
    // associative, so a 3+-term score could round differently at the 6-dp
    // boundary between the probe and the scan form (or between layouts).
    // Each per-term cell is the sum of AT MOST ONE row (postings are
    // per-(term, doc)) — exact — and a missing term contributes literal
    // 0.0, exactly bm25TopK's tf=0 term.
    val termCells = terms.indices.map(i =>
      coalesce(
        sum(when(col("term") === terms(i), col("_c"))), lit(0.0)).as(s"_c$i"))
    val score = terms.indices.map(i => col(s"_c$i")).reduce(_ + _)
    contrib
      .groupBy("_ix_id")
      .agg(termCells.head, termCells.tail: _*)
      .withColumn("bm25", stableRound(score, 6))
      .filter(col("bm25") > 0)
      .select(col("_ix_id").as(index.idCol), col("bm25"))
      .orderBy(col("bm25").desc, col(index.idCol))
      .limit(k)
  }

  /** Incrementally extend a [[Bm25Index]] with newly ingested documents —
    * the ONLY corpus touched is the new batch (the d11/s04 incremental
    * discipline): its postings and lengths aggregate from the batch alone
    * and union in; the corpus stats merge EXACTLY from the two one-row
    * frames (`n' = n + m`, `avgdl' = (n·avgdl + m·avgdl_new) / (n + m)`
    * with null-length docs contributing to `n` but not the length mean,
    * matching [[buildBm25Index]]'s `avg` semantics) — the existing
    * postings are never re-read, let alone the old corpus. Callers are
    * responsible for id disjointness, same as [[extendIvfIndex]]. */
  def extendBm25Index(
      index: Bm25Index, newDocs: DataFrame, textCol: String): Bm25Index = {
    val fresh = buildBm25Index(newDocs, index.idCol, textCol)
    val old = index.stats.select(
      col("_n").as("_on"), col("_avgdl").as("_oavg"), col("_nl").as("_onl"))
    val merged = old.crossJoin(fresh.stats)
      .select(
        (col("_on") + col("_n")).as("_n"),
        when(col("_onl") + col("_nl") > 0,
          (coalesce(col("_oavg"), lit(0.0)) * col("_onl") +
            coalesce(col("_avgdl"), lit(0.0)) * col("_nl")) /
            (col("_onl") + col("_nl"))).as("_avgdl"),
        (col("_onl") + col("_nl")).as("_nl"))
    Bm25Index(
      index.postings.unionByName(fresh.postings),
      index.docLens.unionByName(fresh.docLens),
      merged, index.idCol)
  }

  /** Persist a [[Bm25Index]]: postings bucketed on `term` so probe-time
    * term filters prune buckets and repeated probes never shuffle the
    * postings; lengths and stats as plain tables. */
  def saveBm25Index(index: Bm25Index, name: String, numBuckets: Int): Unit = {
    graft.sources.Sinks.writeBucketed(
      index.postings, s"${name}_postings", Seq("term"), numBuckets)
    index.docLens.write.mode("overwrite").saveAsTable(s"${name}_doclens")
    index.stats.write.mode("overwrite").saveAsTable(s"${name}_stats")
  }

  def loadBm25Index(
      spark: org.apache.spark.sql.SparkSession, name: String,
      idCol: String): Bm25Index =
    Bm25Index(
      spark.table(s"${name}_postings"), spark.table(s"${name}_doclens"),
      spark.table(s"${name}_stats"), idCol)

  /** Top-`k` bigram collocations by pointwise mutual information — the
    * phrase-mining step (learn "new york"-style multi-word units before
    * tokenizer training or query expansion). PMI compares the observed
    * bigram rate against independence:
    * `ln( (c12/M) / ((c1/N)·(c2/N)) )`, with `M` total bigrams and `N`
    * total tokens, both from this corpus.
    *
    * Shape: both count tables are map-side-combined hash aggregates
    * (shuffle ∝ distinct grams — a corpus-common gram is a hot GROUP key,
    * combiner-absorbed); the two scalar totals are one-row broadcast
    * frames; the unigram joins are vocabulary-sized (AQE broadcasts); the
    * final top-k is `TakeOrderedAndProject` (partition-local top-k, never
    * a global sort). `minCount` prunes noise bigrams BEFORE the joins.
    *
    * Output: `(w1, w2, n_pair, pmi)` — pmi stable-rounded to 6 dp, ties
    * broken on (w1, w2). */
  def pmiCollocations(
      df: DataFrame, textCol: String, k: Int = 20, minCount: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val uni = df
      .select(explode(split(Dedup.normalizeText(col(textCol)), " ")).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_c"))
    val nTok = uni.agg(sum("_c").as("_n"))
    // single-token documents yield a degenerate 1-token "gram" (the
    // sequence lower bound in tokenNgramsAll) — the 2-part filter drops it
    val bg = df
      .select(explode(tokenNgramsAll(col(textCol), 2)).as("_g"))
      .filter(size(split(col("_g"), " ")) === 2)
    val nPair = bg.agg(count(lit(1)).as("_m"))
    val pair = bg.groupBy("_g").agg(count(lit(1)).as("_c12"))
      .filter(col("_c12") >= minCount)
      .select(
        element_at(split(col("_g"), " "), 1).as("w1"),
        element_at(split(col("_g"), " "), 2).as("w2"),
        col("_c12"))
    pair
      .join(uni.withColumnRenamed("_w", "w1").withColumnRenamed("_c", "_c1"), Seq("w1"))
      .join(uni.withColumnRenamed("_w", "w2").withColumnRenamed("_c", "_c2"), Seq("w2"))
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nPair))
      .select(
        col("w1"), col("w2"), col("_c12").as("n_pair"),
        stableRound(
          log((col("_c12").cast("double") * col("_n") * col("_n")) /
            (col("_m").cast("double") * col("_c1") * col("_c2"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Fixed-width overlapping token chunks — the RAG / context-window
    * splitter: each document becomes `ceil((T - overlap) / step)` chunks of
    * up to `chunkTokens` tokens, consecutive chunks sharing `overlap`
    * tokens (text is whitespace-normalized and lowercased first, so chunk
    * boundaries align with this engine's tokenizer everywhere).
    *
    * Purely map-side — tokenize, a per-row `sequence` explode, and slices;
    * ZERO shuffle at any scale. Output: `(idCol, chunk_id, start_tok,
    * n_tokens, chunk_text)`, chunk_id and start_tok 0-based; the last
    * chunk may be short, and is non-empty by construction. */
  def chunkDocs(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 20, overlap: Int = 5): DataFrame = {
    require(overlap >= 0, s"overlap must be >= 0, got $overlap")
    require(chunkTokens > overlap,
      s"chunkTokens ($chunkTokens) must exceed overlap ($overlap)")
    val step = chunkTokens - overlap
    df.select(
        col(idCol), split(Dedup.normalizeText(col(textCol)), " ").as("_toks"))
      .withColumn("_nc",
        greatest(lit(1L),
          ceil((size(col("_toks")) - lit(overlap)).cast("double") / step)
            .cast("long")))
      .select(
        col(idCol), col("_toks"),
        explode(sequence(lit(0L), col("_nc") - 1)).as("chunk_id"))
      .select(
        col(idCol), col("chunk_id"),
        (col("chunk_id") * step).as("start_tok"),
        graft.operators.let(
          slice(col("_toks"), (col("chunk_id") * step + 1).cast("int"),
            lit(chunkTokens))) { ch =>
          struct(
            size(ch).cast("long").as("n"), concat_ws(" ", ch).as("t"))
        }.as("_ch"))
      .select(
        col(idCol), col("chunk_id"), col("start_tok"),
        col("_ch.n").as("n_tokens"), col("_ch.t").as("chunk_text"))
  }

  /** T51 — sentence-aware RAG chunking: [[chunkDocs]] cuts on raw token
    * offsets mid-sentence; this variant packs WHOLE sentences (the t43
    * `[.!?]+` kernel: segments containing an alphanumeric, lowercased,
    * whitespace-collapsed) into chunks of `budgetTokens`, overlapping by
    * `overlapSents` sentences. Boundary rule = the [[Packing.packSequences]]
    * first-token contract: a sentence belongs to the chunk its FIRST token
    * lands in under the running token count, so the budget is a soft
    * target — a chunk can run over by at most one sentence's tail, and a
    * single over-budget sentence still forms a (whole) chunk, never a
    * split sentence (its successor's chunk_id then JUMPS: ids are
    * `tokens-before DIV budget`, stable but gappy around an over-budget
    * sentence — only ids with members are emitted). Each chunk after the
    * first also re-carries the `overlapSents` sentences immediately
    * before its first own sentence (RAG context stitching);
    * `n_tokens`/`n_sents` count the carried sentences too.
    *
    * Purely map-side like t22 — sentence split, per-row array folds, one
    * explode per chunk; ZERO Exchange at any scale (pinned in
    * TextAnalysisSpec). The running count is an O(sents²)-per-document
    * slice-fold (sentence counts are tens, not thousands; the quadratic
    * is per-ROW compute that pipelines into the scan, chosen over a
    * stateful fold because an engine-portable oracle can replay slice
    * sums verbatim). Null-text and sentence-free documents produce no
    * chunks (nothing to retrieve — unlike t22's singleton empty chunk,
    * and documented here as the contract difference).
    *
    * Output: `(idCol, chunk_id, start_sent, n_sents, n_tokens,
    * chunk_text)` — chunk_id and start_sent 0-based. */
  def sentenceChunks(
      df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int, overlapSents: Int = 0): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    require(overlapSents >= 0, s"overlapSents must be >= 0, got $overlapSents")
    val sents = transform(
      filter(split(lower(trim(col(textCol))), "[.!?]+"),
        s => s.rlike("[a-z0-9]")),
      s => trim(regexp_replace(s, "\\s+", " ")))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), sents.as("_s"))
      .where(size(col("_s")) > 0)
      .withColumn("_tc",
        expr("transform(_s, s -> CAST(size(split(s, ' ')) AS BIGINT))"))
      // cumulative tokens BEFORE each sentence (1-based positions)
      .withColumn("_cum",
        expr("""transform(sequence(1, size(_tc)),
                          i -> aggregate(slice(_tc, 1, i - 1),
                                         CAST(0 AS BIGINT), (a, x) -> a + x))"""))
      .withColumn("_cid",
        expr(s"transform(_cum, cb -> cb div ${budgetTokens.toLong}L)"))
      .select(col(idCol), col("_s"), col("_tc"), col("_cid"),
        explode(expr("array_distinct(_cid)")).as("chunk_id"))
      // chunk members: its own contiguous sentence range (_cid is
      // non-decreasing) + the `overlapSents` sentences immediately before
      // it — "immediately before", not "of chunk k-1", so the carry
      // survives the gapped ids an over-budget sentence leaves behind
      .withColumn("_m",
        expr(s"""filter(sequence(1, size(_s)),
                        i -> element_at(_cid, i) = chunk_id
                          OR (i < size(filter(_cid, c -> c < chunk_id)) + 1
                              AND i >= size(filter(_cid, c -> c < chunk_id))
                                  + 1 - ${overlapSents.toLong}L))"""))
      .select(
        col(idCol), col("chunk_id"),
        expr("CAST(element_at(_m, 1) - 1 AS BIGINT)").as("start_sent"),
        expr("CAST(size(_m) AS BIGINT)").as("n_sents"),
        expr("aggregate(_m, CAST(0 AS BIGINT), (a, i) -> a + element_at(_tc, i))")
          .as("n_tokens"),
        expr("array_join(transform(_m, i -> element_at(_s, i)), ' ')")
          .as("chunk_text"))
  }

  /** Corpus-trained unigram log-probability score — the CCNet-style quality
    * signal: each document's mean per-token `ln P(token)`, with `P`
    * estimated from THIS corpus's own token frequencies. Very low scores
    * mark gibberish / far-out-of-distribution documents; very high scores
    * mark stopword soup — both tails are what a curation pipeline cuts.
    *
    * Shape: per-(doc, token) counts first (map-side combined — shuffle ∝
    * DISTINCT doc×token pairs, not token occurrences, so a corpus-common
    * token is a hot GROUP key absorbed by the combiner, not a hot JOIN
    * key), token frequencies aggregated from those (∝ vocabulary), the
    * corpus total as a one-row broadcast frame (the [[tfIdfTopTerms]]
    * scalar pattern — never a driver collect), the frequency join
    * AQE-sized (a Zipf-bounded vocabulary broadcasts at any realistic
    * scale), and the per-doc mean is the count-weighted fold over the
    * doc's distinct tokens.
    *
    * Output: `(idCol, n_tokens, avg_logprob)`, score stable-rounded to
    * 6 dp. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df
      .select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("_w"))
      .groupBy("_id", "_w").agg(count(lit(1)).as("_c"))
    val freq = tf.groupBy("_w").agg(sum("_c").as("_wc"))
    val total = freq.agg(sum("_wc").as("_n"))
    tf.join(freq, Seq("_w"))
      .crossJoin(broadcast(total))
      .select(
        col("_id"), col("_c"),
        (col("_c") * log(col("_wc").cast("double") / col("_n"))).as("_wlp"))
      .groupBy("_id")
      .agg(
        sum("_c").cast("long").as("n_tokens"),
        stableRound(sum("_wlp") / sum("_c"), 6).as("avg_logprob"))
      .withColumnRenamed("_id", idCol)
  }

  /** Per-document mean bigram log-probability under the corpus's own
    * bigram language model — the CCNet-style perplexity quality signal one
    * order up from [[unigramLogProb]] (a doc of common words in an
    * improbable ORDER scores low here but normal there; word-salad spam is
    * exactly that). `P(w2|w1) = C(w1 w2) / C(w1·)` with no smoothing: the
    * model is trained on the scored corpus itself, so every observed
    * bigram has positive count by construction, and the context total
    * `C(w1·)` is the sum of `C(w1 w2)` over the bigram table — derived
    * FROM the bigram aggregate, never a second corpus pass.
    *
    * Shape: one bigram explode → per-(doc, bigram) hash count (map-side
    * combined; shuffle ∝ bigram occurrences); the model tables are
    * bigram-vocabulary-sized aggregates of that frame, joined back
    * AQE-sized. Docs with fewer than 2 tokens have no bigram evidence and
    * report `(0, NULL)` — emitted, not dropped (the [[Classifier]] lesson:
    * absence must be an explicit outcome for keep/reroute pipelines).
    *
    * Output: `(idCol, n_bigrams, avg_logprob)`, 6 dp. */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df
      .select(
        col(idCol).as("_id"),
        explode(
          let(tokens(col(textCol))) { t =>
            when(
              size(t) >= 2,
              transform(
                sequence(lit(1), size(t) - 1),
                i => concat_ws(" ", slice(t, i, lit(2)))))
              .otherwise(array().cast("array<string>"))
          }).as("_bg"))
      .groupBy("_id", "_bg").agg(count(lit(1)).as("_c"))
    val bf = tf.groupBy("_bg").agg(sum("_c").as("_bc"))
    val cf = bf
      .groupBy(substring_index(col("_bg"), " ", 1).as("_w1"))
      .agg(sum("_bc").as("_cc"))
    val scored = tf.join(bf, Seq("_bg"))
      .withColumn("_w1", substring_index(col("_bg"), " ", 1))
      .join(cf, Seq("_w1"))
      .select(
        col("_id"), col("_c"),
        (col("_c") * log(col("_bc").cast("double") / col("_cc"))).as("_wlp"))
      .groupBy("_id")
      .agg(
        sum("_c").cast("long").as("_nb"),
        stableRound(sum("_wlp") / sum("_c"), 6).as("_lp"))
    df.select(col(idCol).as("_id"))
      .join(scored, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("_nb"), lit(0L)).as("n_bigrams"),
        col("_lp").as("avg_logprob"))
  }

  /** Held-out Stupid Backoff scoring (Brants et al. 2007) — the FROZEN-LM
    * form of [[bigramLogProb]], and the one production quality filters
    * actually run: score NEW data against a model trained on a held
    * corpus. Trained-on-itself bigram MLE ([[t28|bigramLogProb]]) never
    * exercises smoothing — every scored bigram was seen by construction;
    * here the backoff chain is live: `S(w2|w1) = C(w1w2)/C(w1)` if the
    * train corpus saw the bigram, else `α·C(w2)/N` if it saw the unigram,
    * else `α²/N` (the OOV floor) — Stupid Backoff's relative frequencies,
    * NOT normalized probabilities, which is exactly why it needs no
    * discounting pass and scales to web-corpus LMs.
    *
    * Output per scored doc with ≥1 transition: `(idCol, n_transitions,
    * n_backoff, n_oov, avg_logscore)` — the two count columns make the
    * backoff path part of the hash-checked contract. Docs with < 2 tokens
    * are omitted (no transition to score).
    *
    * Shape: the model is two train-side map-side-combined aggregates
    * (vocabulary-sized frames); scoring is one bigram explode over the
    * scored side + three vocabulary joins (AQE broadcasts them at web
    * scale the same way it does [[unigramLogProb]]'s) + one per-doc fold.
    * Nothing is collected. */
  def stupidBackoffScore(
      train: DataFrame, score: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.4): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    def bigrams(c: Column): Column =
      let(tokens(c)) { t =>
        when(
          size(t) >= 2,
          transform(
            sequence(lit(1), size(t) - 1),
            i => concat_ws(" ", slice(t, i, lit(2)))))
          .otherwise(array().cast("array<string>"))
      }
    val uni = train.select(explode(tokens(col(textCol))).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_uc"))
    val total = uni.agg(sum("_uc").as("_n"))
    val bi = train.select(explode(bigrams(col(textCol))).as("_bg"))
      .groupBy("_bg").agg(count(lit(1)).as("_bc"))
    val tf = score
      .select(col(idCol).as("_id"), explode(bigrams(col(textCol))).as("_bg"))
      .groupBy("_id", "_bg").agg(count(lit(1)).as("_c"))
      .withColumn("_w1", substring_index(col("_bg"), " ", 1))
      .withColumn("_w2", substring_index(col("_bg"), " ", -1))
    tf.join(bi, Seq("_bg"), "left")
      .join(uni.select(col("_w").as("_w1"), col("_uc").as("_uc1")),
        Seq("_w1"), "left")
      .join(uni.select(col("_w").as("_w2"), col("_uc").as("_uc2")),
        Seq("_w2"), "left")
      .crossJoin(broadcast(total))
      .withColumn("_score",
        when(col("_bc").isNotNull, col("_bc").cast("double") / col("_uc1"))
          .when(col("_uc2").isNotNull,
            lit(alpha) * col("_uc2").cast("double") / col("_n"))
          .otherwise(lit(alpha * alpha) / col("_n")))
      .groupBy("_id")
      .agg(
        sum("_c").cast("long").as("n_transitions"),
        sum(when(col("_bc").isNull, col("_c")).otherwise(lit(0L)))
          .as("n_backoff"),
        sum(when(col("_bc").isNull && col("_uc2").isNull, col("_c"))
          .otherwise(lit(0L))).as("n_oov"),
        stableRound(sum(col("_c") * log(col("_score"))) / sum("_c"), 6)
          .as("avg_logscore"))
      .withColumnRenamed("_id", idCol)
  }

  /** Zipf-law fit of the corpus vocabulary: OLS of `ln(freq)` against
    * `ln(rank)` over the term-frequency table — `alpha` (the negated
    * slope, ~1 for natural language) and `r2` are the standard "is this
    * corpus natural text or something synthetic/templated" fingerprint,
    * and the drift of `alpha` across ingest batches is a cheap corpus
    * monitor. Returns ONE row:
    * `(n_types, n_tokens, alpha, intercept, r2)`, 6 dp; alpha/r2 NULL on
    * degenerate vocabularies (fewer than 2 types).
    *
    * Shape: one token explode → vocabulary hash aggregate (map-side
    * combined); ranks come from the DISTRIBUTED prefix sum over
    * `(freq desc, term)` ([[Packing.globalRunningSums]] — a naive
    * `row_number()` over an unpartitioned window would pull the whole
    * vocabulary through one task); the fit is one closed-form aggregate
    * of the ranked frame. Nothing after the first aggregate is
    * corpus-size-proportional. */
  def zipfFit(df: DataFrame, textCol: String): DataFrame = {
    // persist the vocabulary frame: globalRunningSums consumes it twice
    // (per-slice window + offsets), and without the pin each consumer
    // re-runs the corpus explode+aggregate — the only corpus-proportional
    // stage, doubled (the rocSweep cache discipline; released by the
    // one-shot listener after the caller's first action)
    val tf = df.select(explode(tokens(col(textCol))).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_c"))
      .persist()
    val ranked = Packing.globalRunningSums(
      tf.withColumn("_one", lit(1L)),
      Seq(col("_c").desc, col("_w").asc),
      Seq("_one" -> "_rank"))
    val x = log(col("_rank").cast("double"))
    val y = log(col("_c").cast("double"))
    val agg = ranked.agg(
      count(lit(1)).as("n_types"),
      sum(col("_c")).cast("long").as("n_tokens"),
      sum(x).as("_sx"), sum(y).as("_sy"),
      sum(x * y).as("_sxy"), sum(x * x).as("_sxx"), sum(y * y).as("_syy"))
    val n = col("n_types").cast("double")
    val dx = n * col("_sxx") - col("_sx") * col("_sx")
    val dy = n * col("_syy") - col("_sy") * col("_sy")
    val cov = n * col("_sxy") - col("_sx") * col("_sy")
    val slope = cov / dx
    val out = agg.select(
      col("n_types"), col("n_tokens"),
      stableRound(when(dx > 0.0, -slope), 6).as("alpha"),
      stableRound(when(dx > 0.0, (col("_sy") - slope * col("_sx")) / n), 6)
        .as("intercept"),
      stableRound(when(dx > 0.0 && dy > 0.0, cov * cov / (dx * dy)), 6)
        .as("r2"))
    ManagedPairs(out, Seq(tf)).releaseOnFirstUse()
  }

  /** Per-source distribution drift: `KL(p_source ‖ p_corpus)` over unigram
    * term distributions — the standard monitor for "did this crawl slice /
    * ingest batch drift away from the corpus mix" (0 = identical to the
    * blend; large = divergent vocabulary). No smoothing is needed: every
    * source term is by construction in the corpus, so `q(t) > 0` wherever
    * `p(t) > 0`. Returns `(groupCol, n_terms, n_tokens, kl)`, kl rounded
    * to 6dp.
    *
    * Shape: one token explode → per-(source, term) hash count (map-side
    * combined, shuffle ∝ sources × vocabulary — a corpus-common term is a
    * hot GROUP key, combiner-absorbed); corpus term frequencies and
    * per-source totals aggregate FROM that table (∝ vocabulary / ∝
    * sources, never a second corpus pass); the corpus total is a one-row
    * broadcast frame; both joins are vocabulary-/source-sized (AQE
    * broadcasts). Nothing in the plan is proportional to corpus size after
    * the first aggregate. Null-group rows are filtered BEFORE the explode —
    * they could never reach the output anyway (the equi-join drops null
    * keys), but filtering them up front keeps every downstream branch's
    * scan predicate identical, so the (source, term) exchange is
    * canonically equal across all four consumers and plans as ONE exchange
    * + `ReusedExchange`s; without it, join-inferred `isnotnull` lands on
    * one branch only and the corpus scan + explode silently runs twice. */
  def sourceDrift(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val gt = df
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), explode(tokens(col(textCol))).as("_t"))
      .groupBy("_g", "_t").agg(count(lit(1)).as("_c"))
    val ct = gt.groupBy("_t").agg(sum("_c").as("_ct"))
    val gn = gt.groupBy("_g").agg(sum("_c").as("_ng"))
    val n = ct.agg(sum("_ct").as("_n"))
    gt.join(ct, Seq("_t"))
      .join(gn, Seq("_g"))
      .crossJoin(broadcast(n))
      .select(
        col("_g"), col("_c"),
        ((col("_c") / col("_ng")) *
          log((col("_c") / col("_ng")) / (col("_ct") / col("_n")))).as("_kl"))
      .groupBy("_g")
      .agg(
        count(lit(1)).as("n_terms"),
        sum("_c").cast("long").as("n_tokens"),
        stableRound(sum("_kl"), 6).as("kl"))
      .withColumnRenamed("_g", groupCol)
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by its log
    * importance ratio under two unigram LMs — a TARGET model trained on
    * the docs matching `targetPred` and a RAW model trained on the rest.
    * `log w(x) = Σ_tokens c(t)·(ln p_target(t) − ln p_raw(t))`, with add-k
    * smoothing over the UNION vocabulary so tokens unseen on either side
    * stay finite: `p(t) = (c(t)+k)/(N + k·V)`. Selecting the top raw docs
    * by this weight (or sampling ∝ exp(weight) via
    * [[TopK.weightedSampleNoReplacement]]) is the published recipe for
    * tilting a web crawl toward a curated target domain.
    *
    * Both sides are scored (a target doc's weight is a useful sanity
    * diagnostic — it should skew positive); `is_target` rides along so the
    * caller selects raw docs only. Docs with NULL text carry no token
    * evidence and report `(n_tokens=0, log_weight=NULL)` — emitted, not
    * dropped (the [[Classifier]] lesson: absence must be an explicit
    * outcome for keep/reroute pipelines).
    *
    * Shape: ONE corpus pass — per-(doc, token) counts (map-side combined;
    * shuffle ∝ distinct doc×token pairs, corpus-hot tokens are hot GROUP
    * keys absorbed by the combiner), then both LMs come from ONE
    * vocabulary-sized conditional aggregate of that frame (never a second
    * corpus pass), totals are a one-row broadcast, and the
    * tf→vocabulary join is AQE-sized (a Zipf-bounded vocabulary
    * broadcasts at any realistic scale). Zero UDFs.
    *
    * Output: `(idCol, is_target, n_tokens, log_weight)`, 6 dp. */
  def dsirWeights(
      df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, smoothing: Double = 1.0): DataFrame = {
    require(smoothing > 0, s"smoothing must be > 0, got $smoothing")
    val tf = df
      .select(
        col(idCol).as("_id"),
        targetPred.cast("boolean").as("_tgt"),
        explode(tokens(col(textCol))).as("_w"))
      .groupBy("_id", "_tgt", "_w").agg(count(lit(1)).as("_c"))
    val freq = tf.groupBy("_w").agg(
      sum(when(col("_tgt"), col("_c")).otherwise(0L)).as("_ct"),
      sum(when(!col("_tgt"), col("_c")).otherwise(0L)).as("_cr"))
    val totals = freq.agg(
      sum("_ct").as("_nt"), sum("_cr").as("_nr"),
      count(lit(1)).as("_v"))
    val k = lit(smoothing)
    val scored = tf.join(freq, Seq("_w"))
      .crossJoin(broadcast(totals))
      .select(
        col("_id"), col("_c"),
        (col("_c") *
          (log((col("_ct") + k) / (col("_nt") + k * col("_v"))) -
            log((col("_cr") + k) / (col("_nr") + k * col("_v"))))).as("_wlr"))
      .groupBy("_id")
      .agg(
        sum("_c").cast("long").as("_n"),
        stableRound(sum("_wlr"), 6).as("_lw"))
    df.select(col(idCol).as("_id"), targetPred.cast("boolean").as("is_target"))
      .join(scored, Seq("_id"), "left")
      .select(
        col("_id").as(idCol), col("is_target"),
        coalesce(col("_n"), lit(0L)).as("n_tokens"),
        col("_lw").as("log_weight"))
  }

  /** A trained DSIR model: the per-token log ratios as a vocabulary-sized
    * frame plus the smoothed ratio an OUT-OF-VOCABULARY token gets
    * (`ln((Nr + kV)/(Nt + kV))` — both smoothed probabilities collapse to
    * `k/(N + kV)` for an unseen token). Build once on the curated
    * target + a raw sample; score any corpus against the FROZEN model —
    * the production DSIR shape, where the 100 TB crawl is scored but never
    * trained on ([[dsirWeights]] is the train-and-score-the-same-corpus
    * convenience). */
  final case class DsirModel(
      vocab: DataFrame, oovLogRatio: Double, smoothing: Double,
      private[graft] val backing: Option[DataFrame] = None) {
    /** Pin the vocabulary itself in executor storage and materialize it
      * now; the training-time counts cache (which backed `vocab` until
      * here) is released — the vocabulary is self-contained after this. */
    def persisted(): DsirModel = {
      vocab.persist(); vocab.count()
      backing.foreach(_.unpersist(blocking = false))
      this
    }
    def unpersisted(): DsirModel = {
      vocab.unpersist()
      backing.foreach(_.unpersist(blocking = false))
      this
    }
  }

  /** Train the two unigram LMs in ONE corpus pass: the (token, counts)
    * aggregate is persisted, the totals `head()` below is the single
    * action that materializes it (a build-time action on an already
    * aggregated frame — three scalars, not a data collect), and the
    * vocabulary's log ratios read that cache, never the corpus. The
    * returned model keeps the counts cache as its backing store until
    * `persisted()` pins the vocabulary itself (releasing the counts) or
    * `unpersisted()` drops both. */
  def trainDsir(
      df: DataFrame, textCol: String, targetPred: Column,
      smoothing: Double = 1.0): DsirModel = {
    require(smoothing > 0, s"smoothing must be > 0, got $smoothing")
    val freq = df
      .select(
        targetPred.cast("boolean").as("_tgt"),
        explode(tokens(col(textCol))).as("_w"))
      .groupBy("_w").agg(
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"),
        sum(when(!col("_tgt"), 1L).otherwise(0L)).as("_cr"))
      .persist()
    val Seq(nt, nr, v) = {
      val r = freq
        .agg(sum("_ct").as("_nt"), sum("_cr").as("_nr"), count(lit(1)).as("_v"))
        .head()
      Seq(r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val k = lit(smoothing)
    val vocab = freq.select(
      col("_w"),
      (log((col("_ct") + k) / (lit(nt) + k * v)) -
        log((col("_cr") + k) / (lit(nr) + k * v))).as("_lr"))
    DsirModel(
      vocab,
      math.log((nr + smoothing * v) / (nt + smoothing * v)),
      smoothing,
      backing = Some(freq))
  }

  /** Score a corpus against a FROZEN [[DsirModel]]: explode tokens, LEFT
    * join the vocabulary (AQE broadcasts it — Zipf-bounded at any
    * realistic scale), unseen tokens take the model's OOV ratio, fold per
    * doc. The scored corpus is touched exactly once; nothing re-trains.
    * Same null-text contract as [[dsirWeights]]: `(n_tokens=0,
    * log_weight=NULL)`, emitted. Output: `(idCol, n_tokens,
    * log_weight)`, 6 dp. */
  def scoreDsir(
      model: DsirModel, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val scored = df
      .select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("_w"))
      .join(model.vocab, Seq("_w"), "left")
      .groupBy("_id")
      .agg(
        count(lit(1)).cast("long").as("_n"),
        stableRound(
          sum(coalesce(col("_lr"), lit(model.oovLogRatio))), 6).as("_lw"))
    df.select(col(idCol).as("_id"))
      .join(scored, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("_n"), lit(0L)).as("n_tokens"),
        col("_lw").as("log_weight"))
  }

  // ---- BPE tokenizer induction -------------------------------------------

  /** Word-frequency table of `textCol` (whitespace words, lowercased):
    * `(_w, _n)`. THE one corpus pass of the BPE learner — everything after
    * operates on this Zipf-bounded frame (Sennrich et al. 2016's trick:
    * merge statistics over word types × counts equal merge statistics over
    * the corpus, at vocabulary cost). */
  private def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("_w"))
      .where(length(col("_w")) > 0)
      .groupBy("_w").agg(count(lit(1)).as("_n"))

  /** Adjacent symbol pairs of `_sym`, weighted by word count, aggregated:
    * `(sym_l, sym_r, cnt)`. Overlapping occurrences count naively
    * (`aaa` → 2× (a,a)) — the standard BPE statistic. */
  private def pairCounts(seg: DataFrame): DataFrame =
    seg.where(size(col("_sym")) >= 2)
      .select(col("_n"), explode(expr(
        """transform(sequence(1, size(_sym) - 1),
           i -> struct(element_at(_sym, i) AS l, element_at(_sym, i + 1) AS r))"""))
        .as("_p"))
      .groupBy(col("_p.l").as("sym_l"), col("_p.r").as("sym_r"))
      .agg(sum(col("_n")).as("cnt"))

  /** The ORACLED slice of BPE learning: round-0 adjacent-CHARACTER pair
    * counts over the word-frequency table, keeping pairs with
    * `cnt >= minCount`. Same aggregate [[learnBpeMerges]] starts from. */
  def bpePairCounts(df: DataFrame, textCol: String, minCount: Long): DataFrame =
    pairCounts(
      wordFreq(df, textCol)
        .select(col("_w"), col("_n"), split(col("_w"), "(?!^)(?!$)").as("_sym")))
      .where(col("cnt") >= minCount)

  /** Learn `numMerges` BPE merges from scratch (character-level start):
    * output `(rank, sym_l, sym_r, pair_count)`, rank 1 = first merge.
    * Deterministic: argmax ties break (count desc, sym_l asc, sym_r asc).
    * Stops early when no pair reaches `minCount`.
    *
    * Scale shape: ONE corpus pass ([[wordFreq]]); each merge round is one
    * aggregate + one kernel rewrite over the VOCABULARY-sized segmentation
    * frame (persisted stepwise like [[Similarity.buildIvfIndexAuto]]'s Lloyd
    * rounds — lazy chaining would replay all prior rewrites each round), and
    * one driver-side argmax fetched via `TakeOrdered(1)`. A 100 TB corpus
    * with a 10 M-type vocabulary runs 10k merges over 10 M rows, corpus
    * untouched after pass one. */
  def learnBpeMerges(
      df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L): DataFrame =
    learnBpeMergesBounded(df, textCol, numMerges, minCount, DriverBpeVocabBound)

  /** [[learnBpeMerges]] with the driver-fold vocabulary bound explicit —
    * spec surface so parity between the bounded driver fold and the
    * distributed per-round ladder is pinned on the same frame (bound 0
    * forces distributed; a large bound forces the driver fold). */
  private[graft] def learnBpeMergesBounded(
      df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long, driverVocabBound: Long): DataFrame = {
    require(numMerges >= 1, s"learnBpeMerges: numMerges must be >= 1, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var seg = wordFreq(df, textCol)
      .select(col("_w"), col("_n"), split(col("_w"), "(?!^)(?!$)").as("_sym"))
      .persist()
    val vocabSize = seg.count()
    // BOUNDED DRIVER FAST PATH (the Dedup.connectedComponents discipline:
    // driver fast path behind an explicit bound, distributed fallback
    // above it): the segmentation frame is VOCABULARY-sized — the same
    // Zipf-bounded model state the tokenizer family already collects at
    // build time — and each merge round is a fold over it. Below the bound
    // one collect replaces 2·numMerges scheduler-floor jobs (pair-count
    // argmax + rewrite materialization per round; measured 17 jobs →
    // 2 for the 8-merge t36 at sf0.1). Arithmetic is integer (exact), the
    // argmax tie-break compares UTF8String bytes exactly like Spark's
    // string ordering, and the greedy rewrite is the MergeAdjacentPair
    // kernel's own loop — parity spec-pinned against the distributed path.
    if (vocabSize <= driverVocabBound) {
      val rows = seg.select(col("_n"), col("_sym")).collect()
      seg.unpersist(blocking = false)
      val counts = rows.map(_.getLong(0))
      val syms = rows.map(_.getSeq[String](1).toArray)
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var rank = 1
      var done = false
      while (rank <= numMerges && !done) {
        val pair = scala.collection.mutable.HashMap.empty[(String, String), Long]
        var i = 0
        while (i < syms.length) {
          val s = syms(i)
          var j = 0
          while (j + 1 < s.length) {
            val k = (s(j), s(j + 1))
            pair.update(k, pair.getOrElse(k, 0L) + counts(i))
            j += 1
          }
          i += 1
        }
        // argmax with Spark's orderBy tie-break: cnt desc, sym_l asc,
        // sym_r asc under BINARY (UTF8 byte) string order
        def less(a: ((String, String), Long), b: ((String, String), Long)): Boolean = {
          if (a._2 != b._2) a._2 > b._2
          else {
            val cl = org.apache.spark.unsafe.types.UTF8String.fromString(a._1._1)
              .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b._1._1))
            if (cl != 0) cl < 0
            else org.apache.spark.unsafe.types.UTF8String.fromString(a._1._2)
              .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b._1._2)) < 0
          }
        }
        val top = pair.foldLeft(Option.empty[((String, String), Long)]) {
          case (best, e) =>
            if (best.isEmpty || less(e, best.get)) Some(e) else best
        }
        top match {
          case Some(((l, r), c)) if c >= minCount =>
            merges += ((rank, l, r, c))
            val lr = l + r
            var x = 0
            while (x < syms.length) {
              val s = syms(x)
              if (s.length >= 2) {
                val out = new Array[String](s.length)
                var a = 0
                var k2 = 0
                while (a < s.length) {
                  if (a + 1 < s.length && s(a) == l && s(a + 1) == r) {
                    out(k2) = lr; k2 += 1; a += 2
                  } else { out(k2) = s(a); k2 += 1; a += 1 }
                }
                syms(x) = java.util.Arrays.copyOf(out, k2)
              }
              x += 1
            }
            rank += 1
          case _ => done = true
        }
      }
      return merges.result().toDF("rank", "sym_l", "sym_r", "pair_count")
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = pairCounts(seg)
        .orderBy(col("cnt").desc, col("sym_l"), col("sym_r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, c))
        val next = seg
          .withColumn("_sym",
            graft.functions.ArrayKernels.mergeAdjacentPair(col("_sym"), l, r))
          .persist()
        next.count()
        seg.unpersist(blocking = false)
        seg = next
        rank += 1
      }
    }
    seg.unpersist(blocking = false)
    merges.result().toDF("rank", "sym_l", "sym_r", "pair_count")
  }

  /** Encode every document with a learned merge table: per-doc BPE token
    * count (`n_bpe_tokens`) — the number the packing/budgeting operators
    * (t14/t23) actually want once a real tokenizer exists, where t03's
    * regex count is the pre-tokenizer approximation. `merges` is
    * [[learnBpeMerges]] output collected as (sym_l, sym_r) in rank order.
    *
    * Scale shape: the encoder kernel runs once per DISTINCT word (the
    * vocabulary frame — same Zipf-bounded trick as learning), then the
    * per-doc count is an equi-join of the doc's words against that
    * vocabulary and a sum — the corpus-sized sides carry only
    * (doc id, word); no document is ever re-encoded per occurrence. Docs
    * with NULL/empty text emit `n_bpe_tokens = 0` (kept via the id
    * join-back, unlike a bare explode). */
  def encodeBpeTokenCount(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = df
      .select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("_w"))
      .where(length(col("_w")) > 0)
    val vocab = words.select("_w").distinct()
      .select(col("_w"),
        size(graft.functions.ArrayKernels.applyBpeMerges(
          split(col("_w"), "(?!^)(?!$)"), merges)).cast("long").as("_k"))
    val perDoc = words.join(vocab, Seq("_w"))
      .groupBy("_id").agg(sum(col("_k")).as("_n"))
    df.select(col(idCol).as("_id"))
      .join(perDoc, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("_n"), lit(0L)).as("n_bpe_tokens"))
  }

  /** Exact phrase occurrences per document — SCAN form for a CONSTANT
    * phrase (the [[bm25TopK]] philosophy): the phrase is a literal, so
    * adjacency checks run as per-row higher-order functions over the
    * token array inside the scan stage — no token explode, no (doc, term)
    * shuffle, no index. Occurrences may overlap (`"a a a"` contains
    * `"a a"` twice — the count is of start positions). Docs with no
    * occurrence (including null/short texts) are dropped. Output:
    * `(idCol, n_occurrences)`.
    *
    * For probe-many workloads build [[buildPositionalIndex]] once and
    * [[probePhrase]] it — same results (spec-pinned parity), probe cost
    * ∝ the phrase terms' postings instead of a corpus scan. */
  def phraseCount(
      df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty && phrase.forall(w => w.nonEmpty && !w.exists(_.isWhitespace)),
      "phraseCount: phrase must be non-empty whitespace-free tokens")
    // tokens() lower-cases the corpus side — fold the phrase to match, or a
    // capitalized query term would silently never match anything
    val terms = phrase.map(_.toLowerCase)
    val base = df.select(col(idCol), tokens(col(textCol)).as("_t"))
    // one primitive pass per row (round-17 optimization: the previous
    // `size(filter(sequence(1, n−L+1), …))` HOF tower evaluated an
    // interpreted lambda with two element_at dispatches per start — the
    // whole scan stage was ~0.5 ms/doc; the kernel is bit-identical,
    // spec-pinned, incl. the null-text → 0 CaseWhen the HOF form had)
    val matches = graft.functions.ArrayKernels.phraseCountKernel(col("_t"), terms)
    base.select(col(idCol),
        coalesce(matches, lit(0L)).as("n_occurrences"))
      .where(col("n_occurrences") > 0)
  }

  /** Positional inverted index: `(term, _id, _pos)` postings with 0-based
    * ORIGINAL token positions — the build-once artifact behind exact
    * phrase retrieval at probe-many scale (persist bucketed on `term`
    * like [[saveBm25Index]]'s postings). */
  final case class PositionalIndex(postings: DataFrame)

  def buildPositionalIndex(
      df: DataFrame, idCol: String, textCol: String): PositionalIndex =
    PositionalIndex(
      df.select(col(idCol).as("_id"),
          posexplode(tokens(col(textCol))).as(Seq("_pos", "term")))
        .where(length(col("term")) > 0))

  /** Incremental positional-index maintenance: the new batch is the ONLY
    * corpus touched (its postings are built and unioned in — the
    * [[extendBm25Index]] discipline, with no stats to fold since phrase
    * matching needs none). Caller guarantees disjoint doc ids. */
  def extendPositionalIndex(
      index: PositionalIndex, newDocs: DataFrame,
      idCol: String, textCol: String): PositionalIndex =
    PositionalIndex(index.postings.unionByName(
      buildPositionalIndex(newDocs, idCol, textCol).postings))

  /** Phrase probe through a [[PositionalIndex]]: the classical positional-
    * postings intersection — term j's postings shifted to start positions
    * (`_pos − j`) and equi-joined across the phrase on `(_id, _start)`;
    * each surviving row is one occurrence start. Probe cost ∝ the PHRASE
    * TERMS' postings (predicate-pruned — bucketed persistence makes the
    * term filter a bucket prune), never a corpus scan. Identical results
    * to [[phraseCount]] (spec-pinned). Output: `(idOut, n_occurrences)`. */
  def probePhrase(
      index: PositionalIndex, phrase: Seq[String],
      idOut: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty && phrase.forall(w => w.nonEmpty && !w.exists(_.isWhitespace)),
      "probePhrase: phrase must be non-empty whitespace-free tokens")
    // the index terms are tokens()-lower-cased — fold the phrase to match
    phrase.map(_.toLowerCase).zipWithIndex.map { case (w, j) =>
        index.postings.where(col("term") === w)
          .select(col("_id"), (col("_pos") - j).as("_start"))
      }
      .reduce((a, b) => a.join(b, Seq("_id", "_start")))
      .groupBy("_id").agg(count(lit(1)).as("n_occurrences"))
      .select(col("_id").as(idOut), col("n_occurrences"))
  }

  /** Blocklist tagging — the ubiquitous curation gate (profanity / boilerplate
    * / banned-domain term lists): per document, which of `terms` appear as
    * whole tokens, plus the keep/drop verdict. The term list is a LITERAL
    * compiled into the plan (the 100 TB shape: a curation blocklist is
    * thousands of terms — driver-side, broadcast free inside codegen), so the
    * whole operator is one shuffle-free map pass over the corpus:
    * `array_intersect` of the doc's distinct tokens with the literal array.
    * Matched terms are emitted sorted + comma-joined for a deterministic,
    * engine-comparable readout. NULL text → no matches, not-blocked.
    *
    * Output: `(idCol, n_matched, matched_csv, blocked)`. */
  def blocklistTag(
      df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklistTag: empty term list")
    require(terms.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      "blocklistTag: terms must be non-empty single tokens")
    // tokens() lower-cases the corpus side — fold the blocklist to match
    // (a capitalized banned term would otherwise silently never block)
    val termArray = array(terms.map(_.toLowerCase).distinct.map(lit): _*)
    // NULL text flows to an EMPTY match set up front (not null-per-output):
    // size/array_join null semantics differ across ANSI modes, a coalesced
    // array does not
    val matched = coalesce(
      array_sort(array_intersect(
        array_distinct(filter(tokens(col(textCol)), t => length(t) > 0)),
        termArray)),
      array().cast("array<string>"))
    df.select(
      col(idCol),
      size(matched).as("n_matched"),
      array_join(matched, ",").as("matched_csv"),
      (size(matched) > 0).as("blocked"))
  }

  /** Per-document character profile: code-point count, distinct code points,
    * Shannon entropy (bits/char) — the cheap gibberish detector (entropy ≈ 0
    * = one repeated char; natural prose ~4.1-4.5). One shuffle-free map pass
    * via the [[graft.functions.CharStats]] kernel — the relational
    * formulation would explode a row PER CHARACTER (≈ a 100× corpus blow-up
    * through the shuffle); the kernel keeps the histogram in a per-row
    * primitive array instead. Empty/NULL text → counts 0, entropy null.
    *
    * Output: `(idCol, n_chars_counted, n_distinct_chars, entropy_bits)`
    * (entropy 6 dp). */
  def charProfile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.ArrayKernels.charStats(col(textCol)).as("_cs"))
      .select(
        col(idCol),
        coalesce(col("_cs.n_chars"), lit(0L)).as("n_chars_counted"),
        coalesce(col("_cs.n_distinct"), lit(0)).as("n_distinct_chars"),
        stableRound(col("_cs.entropy_bits"), 6).as("entropy_bits"))

  /** Unicode canonical normalization of a text column — the cleaning step
    * that runs BEFORE any hash-keyed op (dedup, token hashing, blocklists):
    * a decomposed `é` (e + combining acute) and a composed `é` are
    * different byte strings to every md5/FNV in the pipeline until they're
    * normalized to one form. One shuffle-free map pass through the
    * [[graft.functions.UnicodeNormalize]] kernel (ASCII fast-path skips
    * the rebuild entirely — on natural web corpora the overwhelmingly
    * common case). Output: `(idCol, <textCol>_norm, changed)`; NULL text
    * → null normalized, changed = false. */
  def normalizeText(
      df: DataFrame, idCol: String, textCol: String,
      form: String = "NFC"): DataFrame = {
    val norm = graft.functions.ArrayKernels.unicodeNormalize(col(textCol), form)
    df.select(
      col(idCol),
      norm.as(s"${textCol}_norm"),
      not(col(textCol) <=> norm).as("changed"))
  }

  /** Lexical diversity — type-token ratio + hapax ratio, the repetitive-
    * template detector that catches what char entropy can't (a page of
    * distinct chars but the same 10 words): per doc, `n_tokens`,
    * `n_types` (distinct tokens), `n_hapax` (tokens occurring once),
    * `ttr = types/tokens`, `hapax_ratio = hapax/types`.
    *
    * Scale shape: explode to (doc, token) postings, ONE map-side-combined
    * aggregate to per-(doc, token) counts, then a doc-keyed re-aggregate —
    * the t13 tf-idf shuffle shape, bounded by corpus token count, with no
    * per-doc value buffers. Docs with no tokens are kept via the id
    * join-back (counts 0, ratios null). */
  def lexicalDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perTok = df
      .select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("_w"))
      .where(length(col("_w")) > 0)
      .groupBy("_id", "_w").agg(count(lit(1)).as("_k"))
    val perDoc = perTok.groupBy("_id").agg(
      sum("_k").as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("_k") === 1, 1L).otherwise(0L)).as("n_hapax"))
    df.select(col(idCol).as("_id"))
      .join(perDoc, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
        stableRound(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("ttr"),
        stableRound(col("n_hapax").cast("double") / col("n_types"), 6)
          .as("hapax_ratio"))
  }

  /** T48 — TF-IDF keyword extraction: top-`k` characteristic terms per
    * document — the document-side readout next to t09's BM25 (BM25 ranks
    * DOCUMENTS for a query; this ranks TERMS for a document — tagging,
    * clustering labels, near-dup explanations). Scoring is the sklearn
    * smooth-idf convention, declared: `tf · (ln((N+1)/(df+1)) + 1)` with
    * N = documents holding ≥ 1 token; scores are 6 dp-rounded BEFORE
    * ranking (the t13 round-then-rank discipline — tie-breaks engine-
    * portable, term asc). Output `(idCol, rank, term, score)`.
    *
    * Shape: one corpus tokenize into the (doc, term, tf) frame; df and N
    * are term-vocabulary/one-row aggregates broadcast back; top-k rides
    * [[TopK.perGroup]]'s two-pass local prune — no document-partitioned
    * window over the raw token stream. */
  def tfidfKeywords(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df
      .select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("_w"))
      .where(length(col("_w")) > 0)
    val tf = toks.groupBy("_id", "_w").agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy("_w").agg(count(lit(1)).as("_df"))
    val nd = tf.select("_id").distinct().agg(count(lit(1)).as("_nd"))
    val scored = tf
      .join(broadcast(dfreq), Seq("_w"))
      .crossJoin(broadcast(nd))
      .withColumn("score",
        stableRound(
          col("_tf") *
            (log((col("_nd") + 1).cast("double") / (col("_df") + 1)) +
              lit(1.0)), 6))
    TopK.perGroup(scored, Seq("_id"),
        Seq(col("score").desc, col("_w").asc), k)
      .select(col("_id").as(idCol), col("rank").cast("long").as("rank"),
        col("_w").as("term"), col("score"))
  }

  /** T49 — n-gram NOVELTY profile: per document, the fraction of its
    * distinct n-grams whose FIRST corpus occurrence (by doc_id order — the
    * corpus ingestion order) is this document. The curation readout between
    * t18's binary benchmark decontamination and d08's destructive chunk
    * dedup: a low-novelty document late in the corpus is recombined
    * boilerplate a dedup pass missed (every gram seen before, just never
    * all together), and down-weighting it is the duplication-aware-weights
    * (d17) story at sub-document granularity. Output:
    * `(idCol, n_grams, n_novel, novelty)` — distinct grams per doc, grams
    * first seen here, their ratio (6 dp; docs with no grams keep zeros and
    * a null ratio via the id join-back).
    *
    * Shape: one corpus explode to the (gram, doc) frame, ONE
    * map-side-combined `min(doc_id)` aggregate per gram (shuffle ∝
    * distinct grams — Zipf-bounded), one equi-join back. No window, no
    * ordering pass — "first occurrence" is an argmin, not a sort. */
  def ngramNovelty(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    ngramNoveltyAgainst(df, idCol, textCol, n, prior = None)

  /** The `(_id, _g)` distinct doc-gram frame behind [[ngramNovelty]] —
    * exposed for the streaming attach's gram-store deltas. */
  private[graft] def docGrams(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df
      // explicit: a NULL text has no grams (tokenNgrams would otherwise
      // emit one "" gram via concat_ws's null-skipping — spec-pinned)
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("_id"),
        explode(tokenNgrams(col(textCol), n)).as("_g"))
      .select("_id", "_g").distinct()

  /** [[ngramNovelty]] scored against an accumulated PRIOR gram store (one
    * `_g` column): a gram is novel for a doc iff it is absent from the
    * prior AND this doc is its first holder (min id) within `df` — which
    * with an empty prior IS the batch operator, and with the previous
    * triggers' store is exactly the per-trigger ingest monitor
    * [[graft.streaming.StreamingNovelty]] maintains (streamed novelty ==
    * batch novelty over the concatenation, parity-pinned there). */
  def ngramNoveltyAgainst(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      prior: Option[DataFrame]): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = docGrams(df, idCol, textCol, n)
    val fresh = prior match {
      case Some(p) => grams.join(p.select(col("_g")), Seq("_g"), "left_anti")
      case None    => grams
    }
    val first = fresh.groupBy("_g").agg(min(col("_id")).as("_first"))
    val perDoc = grams.join(first, Seq("_g"), "left")
      .groupBy("_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("_first") === col("_id"), 1L).otherwise(0L))
          .as("n_novel"))
    df.select(col(idCol).as("_id"))
      .join(perDoc, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        stableRound(
          col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
  }

  /** T50 — Heaps-law vocabulary growth: cumulative distinct word TYPES vs
    * cumulative TOKENS along the corpus in ingestion (doc id) order — the
    * capacity-planning curve behind every vocabulary-sized structure in
    * this engine (BPE/unigram vocab, BM25 postings, embedding tables):
    * extrapolating V(T) ≈ K·T^β from the curve's tail says how big those
    * get at 100 TB before anyone scans 100 TB. Output per doc:
    * `(idCol, n_tokens, n_new_types, cum_tokens, cum_types, ttr)` with
    * ttr = cum_types/cum_tokens (6 dp).
    *
    * Shape: one corpus tokenize; "new type" is the t49 first-occurrence
    * argmin (ONE map-side-combined `min(id)` per word — no sort); both
    * cumulative columns ride ONE [[graft.operators.Packing.globalRunningSums]]
    * pass (range exchange + bounded per-slice windows + broadcast offsets
    * — never a single-task global window). Docs with no tokens contribute
    * zeros and stay on the curve. */
  def heapsGrowth(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df
      .select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("_w"))
      .where(length(col("_w")) > 0)
    val first = words.groupBy("_w").agg(min(col("_id")).as("_fd"))
    val perDoc = words.join(first, Seq("_w"))
      .groupBy("_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count_distinct(when(col("_fd") === col("_id"), col("_w")))
          .as("n_new_types"))
    val base = df.select(col(idCol).as("_id"))
      .join(perDoc, Seq("_id"), "left")
      .select(
        col("_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
    graft.operators.Packing.globalRunningSums(
        base, Seq(col("_id").asc),
        Seq("n_tokens" -> "cum_tokens", "n_new_types" -> "cum_types"))
      .select(
        col("_id").as(idCol), col("n_tokens"), col("n_new_types"),
        col("cum_tokens"), col("cum_types"),
        stableRound(
          col("cum_types").cast("double") / col("cum_tokens"), 6).as("ttr"))
  }

  // ---- Unigram-LM (SentencePiece-style) tokenizer induction ---------------

  /** Micro-log-probability: `round(ln(p)·1e6)` as BIGINT — the 6 dp stage
    * boundary as an INTEGER, so Viterbi scores are exact BIGINT sums and
    * every argmax branch replays across engines (the t45 cents discipline
    * applied to log space). HALF_UP away from zero = Catalyst `round` =
    * DuckDB `ROUND` on doubles. */
  private[graft] def microLogp(p: Double): Long =
    java.math.BigDecimal.valueOf(math.log(p) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** Viterbi segmentation of `w` under integer piece scores: maximize the
    * summed micro-logp over segmentations; backward reconstruction prefers
    * the LONGEST piece whose score equation holds (deterministic — the
    * exact rule the generated oracle's CASE chain replays). Every single
    * character of the corpus is always in the vocabulary, so a best path
    * always exists. */
  private[graft] def unigramViterbi(
      w: String, vocab: Map[String, Long], maxLen: Int): Seq[String] = {
    val L = w.length
    val s = Array.fill(L + 1)(Long.MinValue / 4)
    s(0) = 0L
    var i = 1
    while (i <= L) {
      var l = 1
      while (l <= math.min(maxLen, i)) {
        vocab.get(w.substring(i - l, i)).foreach { lp =>
          if (s(i - l) != Long.MinValue / 4 && s(i - l) + lp > s(i))
            s(i) = s(i - l) + lp
        }
        l += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = L
    while (pos > 0) {
      var chosen = 1
      var l = math.min(maxLen, pos)
      var found = false
      while (l >= 1 && !found) {
        vocab.get(w.substring(pos - l, pos)) match {
          case Some(lp)
              if s(pos - l) != Long.MinValue / 4 && s(pos - l) + lp == s(pos) =>
            chosen = l; found = true
          case _ => ()
        }
        l -= 1
      }
      out.prepend(w.substring(pos - chosen, pos))
      pos -= chosen
    }
    out.toList
  }

  /** The EM fit over the word-frequency frame: seed vocabulary = top
    * `seedMulti` multi-character substrings (length 2..maxLen, count desc /
    * piece asc) + ALL single characters; each round is a hard-EM step —
    * E: Viterbi-segment every word TYPE under current micro-logps (the
    * corpus is touched once, in [[wordFreq]]; rounds run on the
    * vocabulary-sized frame), M: piece count = Σ word-freq over best paths,
    * single characters get +1 smoothing (coverage can never be lost),
    * zero-count multi-char pieces drop out, probabilities renormalize.
    * Returns `(piece, cnt, microLogp)` sorted by piece. The vocabulary is
    * MODEL state (≤ seedMulti + alphabet rows) — collected per round the
    * way t36's BPE learner fetches its per-round argmax. */
  private def unigramFit(
      wf: DataFrame, seedMulti: Int, emRounds: Int, maxLen: Int)
      : Seq[(String, Long, Long)] = {
    val spark = wf.sparkSession
    import spark.implicits._
    val subs = wf
      .withColumn("_i", explode(sequence(lit(1), length(col("_w")))))
      .withColumn("_l", explode(sequence(lit(1), lit(maxLen))))
      .where(col("_i") + col("_l") - lit(1) <= length(col("_w")))
      .select(expr("substring(_w, _i, _l)").as("piece"), col("_n"))
      .groupBy("piece").agg(sum(col("_n")).as("cnt"))
      .persist()
    subs.count()
    val multi = subs.where(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedMulti)
    val chars = subs.where(length(col("piece")) === 1)
    val seed = multi.unionByName(chars)
      .select(col("piece"), col("cnt")).as[(String, Long)].collect().toSeq
    subs.unpersist(blocking = false)
    def withLogp(v: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
      val total = v.map(_._2).sum.toDouble
      v.map { case (p, c) => (p, c, microLogp(c.toDouble / total)) }
    }
    var vocab = withLogp(seed)
    for (_ <- 1 to emRounds) {
      val vmap = vocab.map(t => t._1 -> t._3).toMap
      val ml = maxLen
      val vit = udf((w: String) => unigramViterbi(w, vmap, ml))
      val counts = wf
        .select(col("_n"), explode(vit(col("_w"))).as("piece"))
        .groupBy("piece").agg(sum(col("_n")).as("cnt"))
        .as[(String, Long)].collect().toMap
      val charPieces = vocab.collect { case (p, _, _) if p.length == 1 => p }
      val pieces = (counts.keySet ++ charPieces).toSeq
      vocab = withLogp(pieces.map { p =>
        (p, counts.getOrElse(p, 0L) + (if (p.length == 1) 1L else 0L))
      }.filter(_._2 > 0))
    }
    vocab.sortBy(_._1)
  }

  /** T47 — unigram-LM tokenizer induction (Kudo 2018, the SentencePiece
    * objective), the probabilistic sibling of BPE t35-t37: learn a piece
    * vocabulary by hard-EM over the SAME Zipf-bounded word-frequency frame
    * (one corpus pass; E/M rounds are vocabulary-sized). Deviations from
    * SentencePiece, both for engine replayability: hard-EM (Viterbi-best
    * path, not lattice forward-backward) and count-prune instead of
    * likelihood-loss prune. All scores are integer micro-logps — the 6 dp
    * stage boundary — so the full trajectory (seed, every segmentation,
    * every count, every renormalization) replays through a generated
    * recursive-CTE oracle. Output: `(piece, piece_len, cnt, logp_micro)`. */
  def unigramLmLearn(
      df: DataFrame, textCol: String, seedMulti: Int, emRounds: Int,
      maxLen: Int = 4): DataFrame = {
    require(seedMulti >= 1 && emRounds >= 1 && maxLen >= 2)
    val spark = df.sparkSession
    import spark.implicits._
    val wf = wordFreq(df, textCol).persist()
    wf.count()
    val vocab =
      try unigramFit(wf, seedMulti, emRounds, maxLen)
      finally wf.unpersist(blocking = false)
    vocab.toDF("piece", "cnt", "logp_micro")
      .select(col("piece"), length(col("piece")).as("piece_len"),
        col("cnt"), col("logp_micro"))
  }

  /** T47's fixed-vocab ENCODE twin: learn the vocabulary (same fit), then
    * segment each document with it — per doc `(n_words, n_pieces,
    * pieces_per_word, logp_micro_sum)`. The Viterbi kernel runs once per
    * DISTINCT word (the vocabulary frame, the t37 trick); per-doc numbers
    * are an equi-join of doc words against those stats plus a sum —
    * `logp_micro_sum` is an exact BIGINT fold of the document's best-path
    * score. Docs with no tokens keep zeros via the id join-back. */
  def unigramLmEncode(
      df: DataFrame, idCol: String, textCol: String, seedMulti: Int,
      emRounds: Int, maxLen: Int = 4): DataFrame = {
    require(seedMulti >= 1 && emRounds >= 1 && maxLen >= 2)
    val wf = wordFreq(df, textCol).persist()
    wf.count()
    try {
      val v = unigramFit(wf, seedMulti, emRounds, maxLen)
      unigramEncodeCore(df, idCol, textCol, wf,
        v.map(t => t._1 -> t._3).toMap, maxLen)
    } finally wf.unpersist(blocking = false)
  }

  /** [[unigramLmEncode]] against a FIXED vocabulary frame (round-15
    * verdict task 4): segment with a vocabulary learned earlier —
    * typically [[loadUnigramVocab]] output — instead of re-fitting.
    * Build once, encode many: the fit's `seedMulti × emRounds` EM cost is
    * paid exactly once per model, and every later corpus pays only the
    * per-distinct-word Viterbi pass. Persisted-vs-direct encode parity is
    * BpeSpec/UnigramLmSpec's pin. */
  def unigramLmEncodeWith(
      df: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      maxLen: Int = 4): DataFrame = {
    require(maxLen >= 2)
    val vmap = vocab.select(col("piece"), col("logp_micro").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(vmap.nonEmpty, "unigramLmEncodeWith: empty vocabulary")
    val wf = wordFreq(df, textCol).persist()
    wf.count()
    try unigramEncodeCore(df, idCol, textCol, wf, vmap, maxLen)
    finally wf.unpersist(blocking = false)
  }

  /** The shared encode tail: per-distinct-word Viterbi stats (pinned —
    * the only UDF pass), then the (doc, word) equi-join and id join-back
    * that keep token-less documents at zeros. */
  private def unigramEncodeCore(
      df: DataFrame, idCol: String, textCol: String, wf: DataFrame,
      vmap: Map[String, Long], maxLen: Int): DataFrame = {
    val ml = maxLen
    val st = udf((w: String) => {
      val ps = unigramViterbi(w, vmap, ml)
      (ps.size.toLong, ps.map(vmap).sum)
    })
    val stats = wf.select(col("_w"), st(col("_w")).as("_st"))
      .select(col("_w"), col("_st._1").as("_k"), col("_st._2").as("_s"))
      .localCheckpoint(true)
    val words = df
      .select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("_w"))
      .where(length(col("_w")) > 0)
    val perDoc = words.join(stats, Seq("_w"))
      .groupBy("_id")
      .agg(count(lit(1)).as("n_words"), sum(col("_k")).as("n_pieces"),
        sum(col("_s")).as("logp_micro_sum"))
    df.select(col(idCol).as("_id"))
      .join(perDoc, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        stableRound(col("n_pieces").cast("double") / col("n_words"), 6)
          .as("pieces_per_word"),
        coalesce(col("logp_micro_sum"), lit(0L)).as("logp_micro_sum"))
  }

  /** Tokenizer model persistence (round-15 verdict task 4) — BPE merge
    * tables and unigram-LM vocabularies are MODEL state, like the NB/
    * logistic coefficient frames and the BM25/ANN indexes, and get the
    * same save/load + parity-pin discipline. Both artifacts are KB-sized
    * frames consumed WHOLE at encode time (collected into a broadcast/
    * driver map, never probed by key), so they persist as plain tables —
    * bucketing is the postings-specific half of the saveBm25Index recipe
    * and would only scramble the rank order a merge table is defined by. */
  def saveBpeMerges(merges: DataFrame, name: String): Unit = {
    require(Seq("rank", "sym_l", "sym_r").forall(merges.columns.contains),
      "saveBpeMerges: not a learnBpeMerges frame")
    merges.write.mode("overwrite").saveAsTable(s"${name}_merges")
  }

  /** Load a merge table in rank order — directly consumable by
    * [[encodeBpeTokenCount]]. */
  def loadBpeMerges(
      spark: org.apache.spark.sql.SparkSession,
      name: String): Seq[(String, String)] =
    spark.table(s"${name}_merges").orderBy(col("rank").asc)
      .select("sym_l", "sym_r").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Persist / load a [[unigramLmLearn]] vocabulary (see
    * [[saveBpeMerges]] for the discipline). */
  def saveUnigramVocab(vocab: DataFrame, name: String): Unit = {
    require(Seq("piece", "cnt", "logp_micro").forall(vocab.columns.contains),
      "saveUnigramVocab: not a unigramLmLearn frame")
    vocab.write.mode("overwrite").saveAsTable(s"${name}_vocab")
  }

  def loadUnigramVocab(
      spark: org.apache.spark.sql.SparkSession, name: String): DataFrame = {
    val v = spark.table(s"${name}_vocab")
    require(Seq("piece", "logp_micro").forall(v.columns.contains),
      s"loadUnigramVocab: ${name}_vocab is not a saved unigram vocabulary")
    v
  }

  /** Within-document topic mixture over caller-supplied tag lexicons — the
    * CONTENT side of the data-mixing family: t15/t23 weight SOURCES by a
    * declared mixture, this measures what each document actually contains
    * (domain tagging for mixture audits, code-vs-prose splits, contamination
    * triage). Each lexicon word maps to a tag; per document the
    * token-weighted tag distribution yields the dominant tag, its share,
    * the Shannon entropy over tags (the code-switching/mixture signal:
    * 0 = single-topic, ln k = uniform over k), and the tagged-token
    * fraction.
    *
    * Shape: per-(doc, word) counts map-side combine, ONE broadcast join
    * against the lexicon (lexicons are KBs — never a shuffle), tag-frame
    * aggregates, a per-doc keyed argmax window. Corpus tokens are touched
    * once; everything after is (docs × tags)-sized. Untagged tokens count
    * toward `n_tokens` but not the distribution; a document with no tagged
    * token reports tag "none" with null share/entropy.
    *
    * Output: `(idCol, n_tokens, n_tagged, n_tags, dominant_tag,
    * dominant_share, tag_entropy)`, doubles 6 dp. */
  def lexiconMixture(
      df: DataFrame, idCol: String, textCol: String,
      lexicon: Seq[(String, String)]): DataFrame = {
    require(lexicon.nonEmpty, "lexicon must be non-empty")
    require(lexicon.map(_._1).distinct.size == lexicon.size,
      "lexicon words must be unique (one tag per word)")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val lex = broadcast(lexicon.toDF("_w", "_tag"))
    val words = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("_w"))
      .groupBy("_id", "_w").agg(count(lit(1)).as("_wc"))
    val tot = words.groupBy("_id").agg(sum(col("_wc")).as("n_tokens"))
    val perTag = words.join(lex, Seq("_w"))
      .groupBy("_id", "_tag").agg(sum(col("_wc")).as("_n"))
    val tagged = perTag.groupBy("_id")
      .agg(sum(col("_n")).as("n_tagged"), count(lit(1)).as("n_tags"))
    val byDoc = Window.partitionBy("_id")
      .orderBy(col("_n").desc, col("_tag").asc)
    val dom = perTag.withColumn("_rk", row_number().over(byDoc))
      .filter(col("_rk") === 1)
      .select(col("_id"), col("_tag").as("dominant_tag"), col("_n").as("_dn"))
    val ent = perTag.join(tagged, Seq("_id"))
      .groupBy("_id")
      .agg((-sum((col("_n") / col("n_tagged")) *
        log(col("_n") / col("n_tagged")))).as("_h"))
    df.select(col(idCol)).distinct()
      .join(tot.withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .join(tagged.join(dom, Seq("_id")).join(ent, Seq("_id"))
        .withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_tagged"), lit(0L)).as("n_tagged"),
        coalesce(col("n_tags"), lit(0L)).as("n_tags"),
        coalesce(col("dominant_tag"), lit("none")).as("dominant_tag"),
        stableRound(col("_dn").cast("double") / col("n_tagged"), 6)
          .as("dominant_share"),
        stableRound(col("_h"), 6).as("tag_entropy"))
  }

  /** BLEU-style clipped n-gram overlap between a candidate and a reference
    * text column — the standard generated-text eval (Papineni et al. 2002)
    * run as a DATASET metric: per pair, modified n-gram precisions
    * `p_n = Σ_g min(count_cand(g), count_ref(g)) / (c_len − n + 1)` for
    * n = 1..maxN, the brevity penalty
    * `bp = min(1, exp(1 − r_len/c_len))`, and
    * `bleu = bp · (Π p_n)^(1/maxN)` (0 whenever any p_n is 0 — the product
    * form needs no log-of-zero guard). Self-BLEU against a neighbor pair
    * frame is the usual corpus-diversity readout; eval-vs-reference pairs
    * give the generation-quality one. Pairing is the CALLER's: this takes
    * any frame with (pair id, candidate, reference) and never windows.
    *
    * Shape — the scalable relational form, not a per-row quadratic fold:
    * ONE pass over the pair frame posexplodes all maxN gram levels
    * (rows ∝ tokens × maxN), per-(pair, n, gram) counts map-side combine,
    * candidate and reference counts meet in ONE equi-join on
    * (pair, n, gram), and the clipped sum + precision pivot back to a row
    * per pair. Works unchanged when documents are books: no per-row
    * O(len²) lambda, every stage partitions by the compound key.
    *
    * Pairs whose candidate has fewer than `maxN` tokens have no maxN-gram
    * (denominator 0) and are EXCLUDED — an eval harness filters empties
    * rather than inventing a convention for them. Output:
    * `(pairIdCol, c_len, r_len, p1..p<maxN>, bp, bleu)`, all 6 dp. */
  def ngramOverlapEval(
      pairs: DataFrame, pairIdCol: String, candCol: String, refCol: String,
      maxN: Int = 2): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    // grams with multiplicity, empty when the text is too short for n
    // (tokenNgramsAll would emit one truncated gram there)
    def grams(c: Column, n: Int): Column =
      let(split(Dedup.normalizeText(c), " ")) { toks =>
        when(size(toks) >= n,
          transform(sequence(lit(1), size(toks) - n + 1),
            i => concat_ws(" ", slice(toks, i, lit(n)))))
          .otherwise(array().cast("array<string>"))
      }
    val base = pairs
      .filter(col(candCol).isNotNull && col(refCol).isNotNull)
      .select(col(pairIdCol).as("_ng_id"),
        size(split(Dedup.normalizeText(col(candCol)), " ")).as("c_len"),
        size(split(Dedup.normalizeText(col(refCol)), " ")).as("r_len"),
        array((1 to maxN).map(n => grams(col(candCol), n)): _*).as("_cgs"),
        array((1 to maxN).map(n => grams(col(refCol), n)): _*).as("_rgs"))
      .localCheckpoint() // both gram subtrees read one materialized pass
    def counts(gsCol: String, cnt: String): DataFrame = base
      .select(col("_ng_id"), posexplode(col(gsCol)).as(Seq("_n0", "_gs")))
      .select(col("_ng_id"), (col("_n0") + 1).as("_n"), explode(col("_gs")).as("_g"))
      .groupBy("_ng_id", "_n", "_g").agg(count(lit(1)).as(cnt))
    val cg = counts("_cgs", "_cc")
    val rg = counts("_rgs", "_rc")
    val clip = cg.join(rg, Seq("_ng_id", "_n", "_g"))
      .groupBy("_ng_id", "_n")
      .agg(sum(least(col("_cc"), col("_rc"))).as("_m"))
    val tot = cg.groupBy("_ng_id", "_n").agg(sum(col("_cc")).as("_t"))
    val prec = tot.join(clip, Seq("_ng_id", "_n"), "left")
      .select(col("_ng_id"), col("_n"),
        (coalesce(col("_m"), lit(0L)).cast("double") / col("_t")).as("_p"))
      .groupBy("_ng_id")
      .pivot("_n", (1 to maxN).map(Integer.valueOf))
      .agg(first(col("_p")))
    val pCols = (1 to maxN).map(n => col(n.toString))
    base.select("_ng_id", "c_len", "r_len")
      .join(prec, Seq("_ng_id"))
      .filter(pCols.map(_.isNotNull).reduce(_ && _)) // candidate >= maxN tokens
      .select(col("_ng_id").as(pairIdCol) +: col("c_len") +: col("r_len") +:
        (1 to maxN).map(n => stableRound(col(n.toString), 6).as(s"p$n")) :+
        stableRound(
          least(lit(1.0), exp(lit(1.0) -
            col("r_len").cast("double") / col("c_len"))), 6).as("bp") :+
        stableRound(
          least(lit(1.0), exp(lit(1.0) -
            col("r_len").cast("double") / col("c_len"))) *
            pow(pCols.reduce(_ * _), 1.0 / maxN), 6).as("bleu"): _*)
  }
}
