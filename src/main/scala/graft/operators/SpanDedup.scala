package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window exact-substring duplication — the faithful (overlapping)
  * form of Lee et al. 2021 "Deduplicating Training Data Makes Language
  * Models Better", §4.1: a span duplicated ANYWHERE in the corpus is
  * detected at every token offset, not only on fixed chunk boundaries
  * ([[Dedup.chunkDedup]] is the cheaper non-overlapping stand-in — it
  * misses a duplicate that straddles a chunk cut; this operator cannot).
  *
  * The unit is the `k`-token window: every `k` consecutive tokens of the
  * whitespace-normalized text, hashed with md5 (cross-engine, and it keeps
  * the shuffle rows narrow — 32 hex chars instead of k tokens). A window
  * is DUPLICATED when the same window text occurs at more than one
  * `(doc, offset)` in the corpus.
  *
  * Scale shape (the reason this beats a suffix array on Spark): the window
  * frame has one row per corpus token — ~N rows for an N-token corpus,
  * exactly linear — and everything downstream is hash aggregation and
  * hash joins on the window hash. A corpus-hot window (boilerplate) is a
  * hot GROUP key, absorbed by partial aggregation; the per-doc rollup is
  * keyed by doc id and cannot be hotter than the longest doc. No sort,
  * no all-pairs, no driver state. Both consumers of the window frame
  * (the global count and the join back) shuffle it on the same hash key
  * from an identical subplan, so the exchange plans once and is reused.
  */
object SpanDedup {

  /** `(_id, _pos, _h)` — md5 of each k-token window; `_pos` is the 0-based
    * token offset of the window start. Docs with fewer than `k` tokens
    * (or null text) contribute no rows. */
  private def windowHashes(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(
        col(idCol).as("_id"),
        split(Dedup.normalizeText(col(textCol)), " ").as("_t"))
      .select(
        col("_id"),
        posexplode(
          when(
            size(col("_t")) >= k,
            transform(
              sequence(lit(1), size(col("_t")) - k + 1),
              i => md5(concat_ws(" ", slice(col("_t"), i, lit(k))))))
            .otherwise(array().cast("array<string>"))))
      .withColumnsRenamed(Map("pos" -> "_pos", "col" -> "_h"))

  /** Per-document duplicated-span coverage: of the doc's `n_windows`
    * k-token windows, how many (`dup_windows`) occur elsewhere in the
    * corpus too, and the ratio (`dup_frac`, 6 dp) — the triage metric that
    * decides whether a source needs [[stripDuplicateSpans]] at all.
    * Every input doc emits a row; docs shorter than `k` tokens report
    * `(0, 0, 0.0)`.
    *
    * `n_windows` needs no window frame at all — it is `tokens − k + 1`
    * straight off the doc row — so the only joined payload is the
    * DUPLICATED hash set (typically a small fraction of the window
    * vocabulary, vs every distinct window had we joined the full count
    * table): a semi-join the optimizer broadcasts while it fits, and a
    * hash (never sort-merge — the hint pins it) join of the window frame
    * beyond that. */
  def duplicateSpanCoverage(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"window width k must be >= 2, got $k")
    val w = windowHashes(df, idCol, textCol, k)
    val dup = w.groupBy("_h").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).select("_h")
      .hint("shuffle_hash")
    val dupPerDoc = w.join(dup, Seq("_h"), "left_semi")
      .groupBy("_id").agg(count(lit(1)).as("_dw"))
    df.select(
        col(idCol).as("_id"),
        let(split(Dedup.normalizeText(col(textCol)), " ")) { t =>
          when(size(t) >= k, (size(t) - k + 1).cast("long")).otherwise(0L)
        }.as("_nw"))
      .join(dupPerDoc, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        col("_nw").as("n_windows"),
        coalesce(col("_dw"), lit(0L)).as("dup_windows"),
        when(col("_nw") > 0,
          stableRound(coalesce(col("_dw"), lit(0L)).cast("double") / col("_nw"), 6))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Remove duplicated spans, keeping ONE occurrence: for each duplicated
    * window the keeper is the smallest `(doc, offset)` occurrence; a token
    * is dropped iff some NON-keeper duplicated window covers it. Documents
    * are rebuilt from the surviving tokens in order. Output:
    * `(idCol, clean_text, n_kept)`, one row per input doc (a fully-dropped
    * or sub-`k`-token doc keeps all its tokens / emits `''` for null text).
    *
    * The covered-offset expansion multiplies the dropped-window frame by
    * `k` — bounded by k × duplicated-window count, not corpus size — and
    * dedupes `(doc, offset)` before the anti-join so overlapping dropped
    * windows don't double-count. The rebuild is a per-doc
    * `array_sort(collect_list(struct(offset, token)))` fold: state ∝ doc
    * length, the same bound as holding one document's text. */
  def stripDuplicateSpans(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"window width k must be >= 2, got $k")
    val w = windowHashes(df, idCol, textCol, k)
    // keeper info only for DUPLICATED hashes — the joined payload is the
    // duplicated-window vocabulary, not every distinct window; broadcast
    // while it fits, pinned hash (never sort-merge) join beyond
    val dupKeep = w.groupBy("_h")
      .agg(
        count(lit(1)).as("_n"),
        min(struct(col("_id"), col("_pos"))).as("_keep"))
      .filter(col("_n") > 1)
      .select(col("_h"), col("_keep"))
      .hint("shuffle_hash")
    val dropped = w.join(dupKeep, Seq("_h"))
      .filter(
        !(col("_keep._id") === col("_id") && col("_keep._pos") === col("_pos")))
      .select(
        col("_id"),
        explode(sequence(col("_pos"), col("_pos") + k - 1)).as("_i"))
      .distinct()
      .hint("shuffle_hash")
    val toks = df.select(
        col(idCol).as("_id"),
        split(Dedup.normalizeText(col(textCol)), " ").as("_t"))
      .select(col("_id"), posexplode(col("_t")))
      .withColumnsRenamed(Map("pos" -> "_i", "col" -> "_tok"))
    val kept = toks.join(dropped, Seq("_id", "_i"), "left_anti")
      .groupBy("_id")
      .agg(
        concat_ws(
          " ",
          transform(
            array_sort(collect_list(struct(col("_i"), col("_tok")))),
            s => s.getField("_tok"))).as("_clean"),
        count(lit(1)).as("_nk"))
    df.select(col(idCol).as("_id"))
      .join(kept, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("_clean"), lit("")).as("clean_text"),
        coalesce(col("_nk"), lit(0L)).as("n_kept"))
  }
}
