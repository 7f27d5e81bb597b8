package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Online retrieval-quality monitor — the streaming twin of s30's
  * [[graft.operators.Similarity.rankingMetrics]], under the frozen-model
  * discipline of [[StreamingDrift]]/[[StreamingSeasonal]]/[[StreamingClassify]]:
  * graded relevance judgments are fixed ONCE (the evaluation set a search
  * team curates) and every micro-batch of retrieval logs `(query, doc,
  * rank)` is scored against them, so an alarm means "THIS trigger's
  * rankings degraded against the same judgments" — the live dashboard
  * behind a retriever/index deploy, where recall@k alone can't see an
  * ordering regression (s30's motivation, continuously).
  *
  * Stateless beyond the frozen frame: per-trigger cost is
  * (batch-queries × k)-sized — the rank filter caps every downstream frame
  * and the closed-form IDCG never sorts anything corpus-sized. No state
  * store, no watermark: each trigger is scored independently (windowed
  * trend-smoothing composes downstream via [[graft.operators.Profiling]]
  * if wanted). */
object StreamingEval {

  /** Attach the monitor to a streaming DataFrame of retrieval-log rows.
    * `judgments` must be the `(qCol, idCol, relCol)` graded frame
    * (materialized — it is read every trigger; grades > 0 only, absent =
    * irrelevant). `sink` receives the per-query
    * `(qCol, n_rel, ndcg_at_k, mrr_at_k, ap_at_k)` frame and the batch id
    * each trigger. */
  def attach(
      df: DataFrame, judgments: DataFrame, qCol: String, idCol: String,
      rankCol: String, relCol: String, k: Int, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        sink(
          Similarity.rankingMetrics(
            batch, judgments, qCol, idCol, rankCol, relCol, k),
          id))
      .option("checkpointLocation", checkpoint)
      .start()
}
