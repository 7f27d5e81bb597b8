package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming n-gram novelty — t49 as an ingest monitor: every micro-batch's
  * documents are scored against the ACCUMULATED gram store of all earlier
  * triggers (plus first-within-batch order, the same rule the batch
  * operator applies within a corpus), so the sink sees per-doc
  * `(id, n_grams, n_novel, novelty)` the moment a feed turns into
  * recombined boilerplate — novelty collapsing across triggers is the
  * sub-document duplication signal d17's weights act on, caught at ingest
  * instead of at the next full-corpus pass.
  *
  * State = the d13/BM25 delta-staging shape: each trigger stages ONLY the
  * grams it introduced (batch grams anti-joined against the union of
  * earlier deltas), so staged bytes ∝ NEW grams — Zipf-flattening over the
  * stream's life — and the store is the one multi-path parquet read of all
  * deltas, never a rewritten base. Replay/incarnation discipline: a
  * replayed batch id first purges stagings at/above itself, and both the
  * scored novelty and the staged delta are pure functions of
  * (earlier deltas, batch) — stream == batch parity over the concatenated
  * corpus is pinned per trigger in StreamingNoveltySpec (docs must arrive
  * in id order across triggers for the "first occurrence" to mean the
  * same thing in both worlds, the monitor's documented contract). */
object StreamingNovelty {

  /** The accumulated gram store (one `_g` column; None before the first
    * trigger) — audit/bootstrap view. */
  def currentGrams(
      spark: org.apache.spark.sql.SparkSession,
      statePath: String): Option[DataFrame] =
    DeltaStaging.allDeltas(spark, statePath)

  def attach(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own delta below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val prior = DeltaStaging.deltasBelow(spark, statePath, id)
        val grams = TextAnalysis.docGrams(batch, idCol, textCol, n)
        val delta = prior match {
          case Some(p) =>
            grams.select("_g").distinct()
              .join(p, Seq("_g"), "left_anti")
          case None => grams.select("_g").distinct()
        }
        DeltaStaging.stage(delta, statePath, id)
        sink(
          TextAnalysis.ngramNoveltyAgainst(batch, idCol, textCol, n, prior),
          id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
