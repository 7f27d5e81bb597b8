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
}
