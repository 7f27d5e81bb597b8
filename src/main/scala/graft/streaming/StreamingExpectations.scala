package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Expectations

/** Streaming data-quality gate — the ingest-time form of
  * [[graft.operators.Expectations.check]]: each micro-batch is evaluated
  * against the same declarative constraint suite, and the sink receives the
  * per-batch result table `(expectation, total, violations, pass)` plus the
  * batch id — the shape a monitor alerts on ("batch 812: 3% null doc_ids,
  * HOLD the partition") before bad data reaches a training table.
  *
  * Per-trigger cost ∝ batch (the whole point of the batch operator's plan —
  * one row-level aggregate pass, per-batch unique/referential probes — so it
  * inherits the streaming family's cost contract). Totals/violations are
  * BATCH-scoped by design: a cross-batch unique check is a stateful dedup
  * problem ([[StreamingDedup]]'s territory), not a gate. Semantics are
  * spec-pinned equal to running [[graft.operators.Expectations.check]] on
  * the same rows as a batch. */
object StreamingExpectations {

  def attach(
      docs: DataFrame, expectations: Seq[Expectations.Expectation],
      checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        sink(Expectations.check(batch, expectations), id))
      .option("checkpointLocation", checkpoint)
      .start()
}
