package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

import graft.operators.{Dedup, TextAnalysis}

/** Ingestion-time decontamination against a FROZEN benchmark set — the
  * missing member of the stateless frozen-reference streaming family
  * ([[StreamingClassify]], [[StreamingDsir]]): a training-data ingest
  * should reject benchmark leakage at the door, not in a later batch
  * sweep. Both attaches are stateless per trigger (the benchmark is the
  * frozen reference; batches don't contaminate each other).
  *
  * The frozen artifact is derived ONCE at attach time and pinned in
  * executor storage — the benchmark's distinct gram set
  * ([[TextAnalysis.benchmarkGramSet]]) / collapsed vector row
  * ([[Dedup.collectBenchVectors]]) — so per-trigger cost is the BATCH's
  * kernels plus a cached-artifact join, never a re-shuffle of the
  * benchmark (merely persisting the raw benchmark frame would only cache
  * its scan: the explode+distinct / collect stage would still rebuild per
  * trigger). Call the query's `stop()` and then `unpersistArtifacts` —
  * returned from each attach — when the query is done.
  *
  * Two modalities, same contracts as their batch forms:
  *  - [[attachNgram]] — literal n-gram overlap: `sink` receives
  *    `(idCol, n_shared_grams)` for the batch's FLAGGED docs
  *    ([[TextAnalysis.contaminatedDocs]]' exact schema — ids only; join
  *    back on `idCol` for payloads);
  *  - [[attachSemantic]] — embedding-space paraphrase leakage: `sink`
  *    receives `(idCol, max_bench_sim)` for the batch's CLEAN rows
  *    ([[Dedup.semanticDecontaminate]]'s exact schema).
  * Exactly-once sink semantics when `sink` is idempotent by batch id. */
object StreamingDecontam {

  final case class Attached(query: StreamingQuery, artifact: DataFrame) {
    def unpersistArtifacts(): Unit = { artifact.unpersist(); () }
  }

  def attachNgram(
      docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, checkpoint: String,
      n: Int = 13, minShared: Int = 1)(
      sink: (DataFrame, Long) => Unit): Attached = {
    val grams = TextAnalysis.benchmarkGramSet(benchmark, textCol, n)
      .persist(StorageLevel.MEMORY_AND_DISK)
    grams.count()
    Attached(
      docs.writeStream
        .foreachBatch((batch: DataFrame, id: Long) =>
          sink(TextAnalysis.contaminatedDocsAgainst(
            batch, grams, idCol, textCol, n, minShared), id))
        .option("checkpointLocation", checkpoint)
        .start(),
      grams)
  }

  def attachSemantic(
      vectors: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, benchVecCol: String,
      threshold: Double, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): Attached = {
    val bv = Dedup.collectBenchVectors(bench, benchVecCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    bv.count()
    Attached(
      vectors.writeStream
        .foreachBatch((batch: DataFrame, id: Long) =>
          sink(Dedup.semanticDecontaminateAgainst(
            batch, idCol, vecCol, bv, threshold), id))
        .option("checkpointLocation", checkpoint)
        .start(),
      bv)
  }
}
