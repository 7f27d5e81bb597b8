package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming heavy hitters — the incrementally-maintained form of
  * [[graft.operators.TextAnalysis.topTerms]] (t08): Spark's native
  * streaming aggregation keeps one count per DISTINCT token (state is
  * vocabulary-sized — Zipf-bounded, the same bound the batch operator's
  * shuffle relies on; a corpus-hot token is a hot state KEY, updated by
  * map-side-combined partials, never a straggler), and each trigger emits
  * the current global top-`k` in complete mode.
  *
  * The complete-mode `orderBy … limit k` re-ranks the vocabulary table
  * per trigger — ∝ vocabulary, NOT ∝ stream history, and the sort plans
  * as `TakeOrderedAndProject` over the state store scan (per-partition
  * top-k + merge, no global sort). Exactly equal to the batch operator
  * over everything seen (spec-pinned parity), which per-batch "top-k then
  * merge tops" approximations are not: a globally-heavy-but-never-
  * locally-top term cannot be missed here.
  *
  * For memory-bounded approximate alternatives at hostile vocabularies
  * (adversarial unique-token floods), route through
  * [[graft.functions.Sketches]] count-min instead; this operator is the
  * exact path. */
object StreamingTopTerms {

  /** `docs` must be a streaming DataFrame with `textCol`. The memory/table
    * sink receives `(token, cnt)` rows, ranked desc with the batch
    * operator's lexicographic tie-break. */
  def updates(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
  }

  /** Convenience attach: complete-mode query writing the current top-k to
    * an in-memory table named `queryName` each trigger. */
  def attach(
      docs: DataFrame, textCol: String, k: Int,
      queryName: String, checkpoint: String): StreamingQuery =
    updates(docs, textCol, k)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .start()
}
