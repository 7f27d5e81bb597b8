package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming DSIR scoring against a PREBUILT model — ingestion-time
  * importance weighting, completing the build-once/probe-many streaming
  * family ([[StreamingSimilarity]], [[StreamingDedup]],
  * [[StreamingClassify]]): the two unigram LMs were trained once
  * ([[graft.operators.TextAnalysis.trainDsir]], one vocabulary-sized
  * frame + an OOV scalar); each micro-batch is scored via the broadcast
  * vocabulary join ([[graft.operators.TextAnalysis.scoreDsir]]), so
  * per-trigger cost is proportional to the batch, never to the training
  * corpus — the production shape where the crawl firehose is weighted
  * against a frozen curated-target model as it lands.
  *
  * `sink` receives `(idCol, n_tokens, log_weight)` and the batch id;
  * exactly-once sink semantics when `sink` is idempotent by batch id.
  * Persist the model (`model.persisted()`) before attaching so repeated
  * triggers read cached columnar blocks rather than re-running the
  * training aggregate. */
object StreamingDsir {

  def attach(
      docs: DataFrame, model: TextAnalysis.DsirModel,
      idCol: String, textCol: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        sink(TextAnalysis.scoreDsir(model, batch, idCol, textCol), id))
      .option("checkpointLocation", checkpoint)
      .start()
}
