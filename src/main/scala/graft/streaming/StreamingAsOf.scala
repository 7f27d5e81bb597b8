package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming-NATIVE temporal (as-of) enrichment: each event picks up the
  * dimension version in effect at its EVENT time, computed entirely inside a
  * `flatMapGroupsWithState` per-key version store — no per-batch join against
  * an accumulated history frame.
  *
  * Why this exists: the foreachBatch form
  * ([[Pipeline.operationalQueryTemporal]] over [[DimensionHistory.asOfEnrich]])
  * unions each micro-batch with the WHOLE history and re-exchanges it, so the
  * per-batch floor grows with history size — the round-6 verdict's scale
  * finding. Here the history lives IN the state store, partitioned by key
  * across the cluster (RocksDB-capable via
  * [[graft.GraftSession.useRocksDbStateStore]]); per batch, only the batch's
  * rows shuffle (to their key groups), and state I/O is per-touched-key. Cost
  * per micro-batch is ∝ batch, flat while history grows — pinned by
  * StreamingAsOfSpec's shuffle/state metrics over a growing run.
  *
  * EXACT out-of-order semantics, both sides: an event is enriched and emitted
  * only once the watermark passes its event time — at that point no
  * admissible CDC version with `time <= event time` can still arrive, so the
  * chosen version is final (the same seal rule as the exact sessionizer,
  * [[Pipeline.sessionizeStateful]]; the batch analog q22 is what parity is
  * pinned against). Until sealed, events park in state. Versions the
  * watermark has outrun are pruned automatically: per key, everything below
  * the horizon except the newest-below — exactly
  * [[DimensionHistory.pruneBefore]]'s bound, applied continuously with zero
  * configuration. Emission latency is one watermark delay — inherent to
  * exact streaming as-of (emitting immediately would answer wrongly for an
  * event whose admissible predecessor version is still in flight).
  *
  * Ties: versions sharing (key, time) resolve by `Ordering[V]` when one is
  * supplied (mirror the batch payload-struct tie-break by ordering on the
  * payload fields); otherwise arrival order decides. Event times are epoch
  * MICROS longs (the engine convention; cast timestamps first).
  */
object StreamingAsOf {

  /** Per-key store: dimension versions (time-sorted) + not-yet-sealed events.
    * Kryo-encoded — the state never leaves the state store, so it needs no
    * columnar form. Public only because kryo encoders require it; not API. */
  final case class Buf[E, V](
      versions: List[(Long, V)], pending: List[(Long, E)])

  /** Enrich `events` against `cdc` as-of event time. Returns (event, version)
    * pairs — `null` version when no at-or-before version exists (Spark's own
    * typed left-join convention). Append mode; events emit in event-time
    * order per key once sealed by the watermark.
    *
    * @param eventTime / cdcTime extract epoch-micros event time
    * @param delay     watermark delay on the merged stream (both sides share
    *                  it — a CDC version later than `delay` behind realtime
    *                  is dropped exactly like a late event)
    * @param inclusive `true`: a version at exactly the event time matches
    */
  def enrich[K, E, V](
      events: Dataset[E], cdc: Dataset[V],
      eventKey: E => K, eventTime: E => Long,
      cdcKey: V => K, cdcTime: V => Long,
      delay: String = "10 minutes",
      inclusive: Boolean = true,
      tieBreak: Ordering[V] = null)(implicit
      kEnc: Encoder[K],
      envEnc: Encoder[(Int, K, Long, V, E)],
      wmEnc: Encoder[(Int, K, Long, V, E, java.sql.Timestamp)],
      outEnc: Encoder[(E, V)]): Dataset[(E, V)] = {

    val tagged = cdc
      .map(v => (0, cdcKey(v), cdcTime(v), v, null.asInstanceOf[E]))(envEnc)
      .unionByName(events
        .map(e => (1, eventKey(e), eventTime(e), null.asInstanceOf[V], e))(envEnc))

    // one shared watermark over the merged stream: the seal rule below needs
    // "no admissible row on EITHER side has time <= wm". The watermarked
    // TIMESTAMP column rides along as _6 — the event-time-timeout checker
    // requires it in the stateful operator's input.
    val withWm = tagged.toDF()
      .withColumn("_6", timestamp_micros(col("_3")))
      .withWatermark("_6", delay)
      .as[(Int, K, Long, V, E, java.sql.Timestamp)](wmEnc)

    implicit val bufEnc: Encoder[Buf[E, V]] = Encoders.kryo[Buf[E, V]]

    withWm.groupByKey(_._2)(kEnc)
      .flatMapGroupsWithState[Buf[E, V], (E, V)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, rows: Iterator[(Int, K, Long, V, E, java.sql.Timestamp)],
            state: org.apache.spark.sql.streaming.GroupState[Buf[E, V]]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val buf = state.getOption.getOrElse(Buf[E, V](Nil, Nil))
          val (vRows, eRows) = rows.toList.partition(_._1 == 0)
          // versions: time-sorted (stable, so arrival order breaks ties
          // unless an Ordering[V] pins them like the batch struct tie-break)
          val versions0 = (buf.versions ++ vRows.map(r => (r._3, r._4)))
          val versions =
            if (tieBreak == null) versions0.sortBy(_._1)
            else versions0.sortBy(identity)(Ordering.Tuple2(Ordering.Long, tieBreak))
          val pending = buf.pending ++ eRows.map(r => (r._3, r._5))
          // seal: watermark passed the event time -> its version is final
          val (ripe, parked) = pending.partition(_._1 <= wmUs)
          val out = ripe.sortBy(_._1).map { case (t, e) =>
            val at = versions.iterator
              .takeWhile(v => if (inclusive) v._1 <= t else v._1 < t)
              .foldLeft(null.asInstanceOf[V])((_, v) => v._2)
            (e, at)
          }
          // prune: below-horizon versions are unreachable except the newest
          // (still selectable by a parked/future event just past the horizon)
          val (below, above) = versions.partition(_._1 <= wmUs)
          val kept = (if (below.isEmpty) Nil else List(below.last)) ::: above
          if (kept.isEmpty && parked.isEmpty) state.remove()
          else {
            state.update(Buf(kept, parked))
            if (parked.nonEmpty) {
              // wake when the earliest parked event seals (ms, strictly past
              // the current watermark or Spark rejects the timestamp)
              state.setTimeoutTimestamp(
                math.max(parked.map(_._1).min / 1000L + 1L,
                  state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.iterator
      }
  }
}
