package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming Heaps-law vocabulary growth — t50 at trigger granularity: one
  * row per micro-batch `(batch_id, n_tokens, n_new_types, cum_tokens,
  * cum_types, ttr)`, the live capacity-planning curve for every
  * vocabulary-sized structure the engine maintains (BPE/unigram vocab,
  * BM25 postings, embedding tables). A feed whose `n_new_types` stops
  * decaying has changed character — new language, new tokenization, or
  * garbage — and this monitor sees it at ingest, before any
  * vocabulary-bound job OOMs on the consequence.
  *
  * Two stores under one root, the [[StreamingBm25]] multi-store shape:
  * `words/` stages ONLY each trigger's new word types (delta-staging —
  * staged bytes ∝ new vocabulary, Zipf-flattening over the stream), and
  * `totals/` stages the one-row cumulative frame per trigger (only the
  * latest is ever read — the [[StreamingKll]] full-frame discipline at
  * one row). Replay purges at/above its own id first; both stores are
  * pure functions of (earlier state, batch), so the streamed curve equals
  * the batch [[TextAnalysis.heapsGrowth]] cumulative totals over the
  * concatenated corpus — parity pinned per trigger in the spec. */
object StreamingHeaps {

  private def wordsPath(statePath: String) = s"$statePath/words"
  private def totalsPath(statePath: String) = s"$statePath/totals"

  /** The latest committed cumulative row (None before the first trigger). */
  def currentTotals(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, totalsPath(statePath)).maxOption
      .map(b => DeltaStaging.read(spark, totalsPath(statePath), b))

  def attach(
      df: DataFrame, idCol: String, textCol: String,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        DeltaStaging.purgeAtOrAbove(spark, wordsPath(statePath), id)
        DeltaStaging.purgeAtOrAbove(spark, totalsPath(statePath), id)
        val words = batch
          .select(explode(TextAnalysis.tokens(col(textCol))).as("_w"))
          .where(length(col("_w")) > 0)
        val newTypes = DeltaStaging
          .deltasBelow(spark, wordsPath(statePath), id) match {
          case Some(p) => words.select("_w").distinct()
            .join(p, Seq("_w"), "left_anti")
          case None => words.select("_w").distinct()
        }
        DeltaStaging.stage(newTypes, wordsPath(statePath), id)
        val prev = DeltaStaging.stagedIds(spark, totalsPath(statePath))
          .filter(_ < id).maxOption
          .map(b => DeltaStaging.read(spark, totalsPath(statePath), b)
            .select(col("cum_tokens").as("_pt"), col("cum_types").as("_py")))
          .getOrElse(spark.sql(
            "SELECT CAST(0 AS BIGINT) AS _pt, CAST(0 AS BIGINT) AS _py"))
        val stats = words.agg(count(lit(1)).as("n_tokens"))
          .crossJoin(
            DeltaStaging.read(spark, wordsPath(statePath), id)
              .agg(count(lit(1)).as("n_new_types")))
          .crossJoin(prev)
          .select(
            lit(id).as("batch_id"),
            col("n_tokens"), col("n_new_types"),
            (col("_pt") + col("n_tokens")).as("cum_tokens"),
            (col("_py") + col("n_new_types")).as("cum_types"))
          .withColumn("ttr", graft.operators.stableRound(
            col("cum_types").cast("double") / col("cum_tokens"), 6))
        DeltaStaging.stage(stats, totalsPath(statePath), id)
        // totals: only id and id-1 can ever be read again (words deltas
        // all stay — the union IS the store)
        DeltaStaging.purgeBelow(spark, totalsPath(statePath), id - 1)
        sink(DeltaStaging.read(spark, totalsPath(statePath), id), id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
