package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, TextAnalysis}

/** Ingestion-time decontamination against a FROZEN benchmark set — the
  * missing member of the stateless frozen-reference streaming family
  * ([[StreamingClassify]], [[StreamingDsir]]): a training-data ingest
  * should reject benchmark leakage at the door, not in a later batch
  * sweep. Both attaches are stateless per trigger (the benchmark is the
  * frozen reference; batches don't contaminate each other), so per-trigger
  * cost ∝ batch + the benchmark's gram/vector side — persist the benchmark
  * frame before attaching so its explode/fold reads cached columnar blocks
  * every trigger instead of re-shuffling.
  *
  * Two modalities, same contracts as their batch forms:
  *  - [[attachNgram]] — literal n-gram overlap
  *    ([[TextAnalysis.contaminatedDocs]]): `sink` receives the batch rows
  *    flagged contaminated (shared 13-gram evidence attached);
  *  - [[attachSemantic]] — embedding-space paraphrase leakage
  *    ([[Dedup.semanticDecontaminate]]): `sink` receives the batch's CLEAN
  *    rows with their max-benchmark-cosine audit column.
  * Exactly-once sink semantics when `sink` is idempotent by batch id. */
object StreamingDecontam {

  def attachNgram(
      docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, checkpoint: String,
      n: Int = 13, minShared: Int = 1)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        sink(TextAnalysis.contaminatedDocs(
          batch, benchmark, idCol, textCol, n, minShared), id))
      .option("checkpointLocation", checkpoint)
      .start()

  def attachSemantic(
      vectors: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, benchVecCol: String,
      threshold: Double, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    vectors.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        sink(Dedup.semanticDecontaminate(
          batch, idCol, vecCol, bench, benchVecCol, threshold), id))
      .option("checkpointLocation", checkpoint)
      .start()
}
