package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Profiling

/** Ingest-time distribution-drift monitor — the streaming form of
  * [[graft.operators.Profiling.jsDivergence]]: every micro-batch's
  * categorical distribution (language, source, predicted label, …) is
  * scored against a FROZEN reference frame, and the sink receives one row
  * per trigger `(batch_id, n_rows, n_categories, jsd_bits)` — the number a
  * crawl monitor alerts on ("batch 4017: language mix 0.4 bits off the
  * accepted corpus — hold the feed") *before* a shifted source pollutes a
  * training table. [[StreamingExpectations]] gates row-level CONTRACTS;
  * this gates the SHAPE of the batch, which no per-row predicate can see.
  *
  * The reference is a plain DataFrame captured once from the accepted
  * corpus (pass the corpus itself or a persisted sample) — the same
  * frozen-model discipline as [[StreamingClassify]]/[[StreamingDsir]];
  * refresh it between restarts, not per trigger. The sink row is the
  * batch operator's own output `(n_a, n_b, n_categories, jsd_bits)` with
  * the BATCH on the `a` side.
  *
  * Per-trigger cost ∝ batch: one batch-keyed count aggregate, a
  * category-sized full-outer join against the reference counts, one-row
  * fold — exactly the batch operator's plan, so stream == batch parity is
  * definitional and spec-pinned. At 100 TB/day the reference counts frame
  * is category-sized (KBs); nothing corpus-sized moves per trigger. */
object StreamingDrift {

  def attachJsd(
      stream: DataFrame, reference: DataFrame, catCol: String,
      checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Profiling.jsDivergence(batch, reference, catCol), id)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The TOKEN-level shift tripwire next to [[attachJsd]]'s categorical
    * one: per-doc OOV rates of each micro-batch against a FROZEN
    * [[graft.operators.TextAnalysis.vocabulary]] frame. A feed whose OOV
    * rates climb is drifting away from the text the tokenizer/vocab was
    * built on — the signal a tokenizer-bound ingest pipeline alerts on
    * before perplexity or downstream loss ever sees the batch. Sink rows
    * are the batch operator's own `(idCol, n_tokens, n_oov, oov_rate)`
    * (stream == batch parity definitional); per-trigger cost ∝ batch plus
    * the broadcast vocabulary join. */
  def attachOov(
      stream: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(graft.operators.TextAnalysis.oovRate(batch, idCol, textCol, vocab), id)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
