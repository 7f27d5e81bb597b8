package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{stableRound, TextAnalysis}

/** Ingest-time text hygiene — the c08 composition re-expressed as PURE
  * PER-ROW transforms so it applies directly to a STREAMING frame (no
  * aggregation, no state, no foreachBatch): NFC-normalize, drop blocklisted
  * docs, cut on char entropy and type-token ratio. Because every stage is a
  * map, the gate composes into any downstream streaming query (before a
  * dedup/similarity attach, typically) and costs one codegen pass per
  * trigger — the 100 TB ideal.
  *
  * Batch parity (spec-pinned): on a batch frame the kept id set equals the
  * c08 batch composition's — per-row `distinct/total` TTR is value-identical
  * to [[TextAnalysis.lexicalDiversity]]'s aggregate form, and entropy/
  * blocklist reuse the exact batch kernels. (Hapax ratio is the one c08
  * stat with no O(tokens) per-row form — the gate doesn't cut on it, and
  * c08 doesn't either.)
  *
  * Output: kept rows only, `(idCol, <textCol> normalized, entropy_bits,
  * ttr)`. Null/empty/token-less texts never pass (no evidence → no keep —
  * the [[graft.operators.Classifier.scoreNaiveBayes]] absence convention).
  */
object StreamingHygiene {

  def gate(
      docs: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String], minEntropyBits: Double, minTtr: Double,
      maxDupCoverage: Double = 1.0, dupN: Int = 2): DataFrame = {
    require(blocklist.nonEmpty, "gate: empty blocklist")
    require(maxDupCoverage >= 0.0 && maxDupCoverage <= 1.0,
      s"maxDupCoverage in [0,1], got $maxDupCoverage")
    val normed = graft.functions.ArrayKernels
      .unicodeNormalize(col(textCol), "NFC")
    // two selects: tokens must see the NORMALIZED text (a same-select
    // reference would resolve against the input column)
    val base = docs.select(col(idCol), normed.as(textCol))
      .select(col(idCol), col(textCol),
        TextAnalysis.tokens(col(textCol)).as("_t"))
    val toks = filter(col("_t"), t => length(t) > 0)
    val blocked = size(array_intersect(
      array_distinct(toks),
      array(blocklist.map(_.toLowerCase).distinct.map(lit): _*))) > 0
    val ttr: Column = when(size(toks) > 0,
      stableRound(
        size(array_distinct(toks)).cast("double") / size(toks), 6))
    base
      .withColumn("entropy_bits", stableRound(
        graft.functions.ArrayKernels.charStats(col(textCol))
          .getField("entropy_bits"), 6))
      .withColumn("ttr", ttr)
      // repetition cut (t42's axis, per-row form — [[TextAnalysis
      // .dupCoverageRatio]] is value-identical to the batch aggregate):
      // OFF at the default 1.0 (coverage ≤ 1 always), so the c08 parity
      // contract above is unchanged unless a caller opts in
      .withColumn("dup_coverage", stableRound(
        TextAnalysis.dupCoverageRatio(col(textCol), dupN), 6))
      .where(!coalesce(blocked, lit(false)) &&
        col("entropy_bits") >= minEntropyBits && col("ttr") >= minTtr &&
        // cut on the emitted 6dp column (one kernel evaluation per row,
        // and the threshold compares what the consumer sees)
        col("dup_coverage") <= maxDupCoverage)
      .drop("_t")
  }
}
