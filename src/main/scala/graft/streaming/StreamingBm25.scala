package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming maintenance of the lexical (BM25) inverted index — the
  * retrieval-side complement of the self-extending near-dup/ANN attaches
  * ([[StreamingDedup]], [[StreamingSimilarity]]): an ingest stream of
  * documents folds into [[TextAnalysis.Bm25Index]] state per micro-batch,
  * so a document ingested in trigger N is retrievable by any probe issued
  * after trigger N — no restart, no corpus re-read.
  *
  * Unlike the dedup/ANN attaches, the stream rows are NOT also queries
  * (BM25 queries are ad-hoc term lists from callers), so the attach is
  * pure index maintenance: each trigger builds the BATCH's postings /
  * lengths / one-row stats ([[TextAnalysis.buildBm25Index]] over the batch
  * alone — the [[TextAnalysis.extendBm25Index]] increment discipline) and
  * stages them under three [[DeltaStaging]] stores. Serving probes read
  * [[currentBm25Index]]: postings and lengths are plain delta unions, and
  * the corpus stats FOLD exactly from the per-batch one-row frames
  * (`n = Σnᵢ`, `avgdl = Σ(avgdlᵢ·nlᵢ)/Σnlᵢ` — the same merge
  * `extendBm25Index` does pairwise, associative because every term is a
  * sum). Replay/incarnation safety is [[DeltaStaging]]'s: a replayed batch
  * rewrites its own three stagings deterministically; a fresh incarnation
  * purges ids at-or-above its own.
  *
  * Torn-read protection across the THREE stores: the stats store is the
  * COMMIT GATE — it is purged FIRST and staged LAST each trigger, and
  * [[currentBm25Index]] reads only batch ids the stats store has
  * committed. With [[DeltaStaging]]'s `_SUCCESS` visibility rule, a stats
  * staging exists for id ⟹ postings and doclens for id are fully written
  * (staged before it) — so a serving read taken mid-trigger sees batch N
  * completely or not at all, never postings without lengths (which would
  * silently drop the batch's docs from scoring via the doc-length join).
  *
  * Per-trigger cost ∝ batch (one tokenize/explode pass over the batch,
  * three small parquet writes); probe cost ∝ postings of the query's terms
  * across base + deltas — the term filter prunes every delta the same way
  * it prunes the base. Compact between restarts with
  * [[compactBm25Index]] to restore the bucketed-postings probe path. */
object StreamingBm25 {

  private def stores(statePath: String): Seq[String] =
    Seq(s"$statePath/postings", s"$statePath/doclens", s"$statePath/stats")

  /** Attach the index maintainer to a document stream. `onBatch` fires
    * after each trigger's delta is staged (batch id) — the hook for
    * downstream cache invalidation of a serving layer. */
  def attachBm25Ingest(
      docs: DataFrame, index: TextAnalysis.Bm25Index, textCol: String,
      statePath: String, checkpoint: String)(
      onBatch: Long => Unit = _ => ()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        // gate discipline: stats purged FIRST (its absence makes id
        // invisible to readers while the others rewrite), staged LAST
        stores(statePath).reverse.foreach(DeltaStaging.purgeAtOrAbove(spark, _, id))
        val fresh = TextAnalysis.buildBm25Index(batch, index.idCol, textCol)
        DeltaStaging.stage(fresh.postings, s"$statePath/postings", id)
        DeltaStaging.stage(fresh.docLens, s"$statePath/doclens", id)
        DeltaStaging.stage(fresh.stats, s"$statePath/stats", id)
        onBatch(id)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The serving-side view: base plus every committed delta, stats folded
    * exactly. Hand it to [[TextAnalysis.probeBm25]]. */
  def currentBm25Index(
      spark: SparkSession, index: TextAnalysis.Bm25Index,
      statePath: String): TextAnalysis.Bm25Index = {
    // ONE listing of the gate store bounds what every store contributes —
    // ids the gate has committed are fully written in all three
    val committed = DeltaStaging.stagedIds(spark, s"$statePath/stats")
    val postings = DeltaStaging.deltasFor(spark, s"$statePath/postings", committed)
      .fold(index.postings)(index.postings.unionByName(_))
    val docLens = DeltaStaging.deltasFor(spark, s"$statePath/doclens", committed)
      .fold(index.docLens)(index.docLens.unionByName(_))
    val stats = DeltaStaging.deltasFor(spark, s"$statePath/stats", committed)
      .fold(index.stats)(d =>
        index.stats.unionByName(d).agg(
          sum("_n").as("_n"),
          (sum(coalesce(col("_avgdl"), lit(0.0)) * col("_nl")) /
            when(sum("_nl") > 0, sum("_nl"))).as("_avgdl"),
          sum("_nl").as("_nl")))
    TextAnalysis.Bm25Index(postings, docLens, stats, index.idCol)
  }

  /** BETWEEN-RESTART compaction (the [[StreamingDedup.compactNearDupIndex]]
    * lifecycle): persist base ∪ deltas as bucketed tables under `name`
    * ([[TextAnalysis.saveBm25Index]] — postings bucketed on `term`, so
    * probes prune buckets again), clear the stagings, return the reloaded
    * index. Run ONLY with the ingesting query stopped. */
  def compactBm25Index(
      spark: SparkSession, index: TextAnalysis.Bm25Index,
      statePath: String, name: String, numBuckets: Int): TextAnalysis.Bm25Index = {
    TextAnalysis.saveBm25Index(
      currentBm25Index(spark, index, statePath), name, numBuckets)
    stores(statePath).foreach(DeltaStaging.clear(spark, _))
    TextAnalysis.loadBm25Index(spark, name, index.idCol)
  }
}
