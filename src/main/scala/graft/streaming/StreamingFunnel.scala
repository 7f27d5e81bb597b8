package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incrementally-maintained conversion funnel — the streaming form of
  * [[graft.operators.Sequence.funnelTimes]], exploiting the same exact
  * collapse: per entity the whole funnel is k scalars
  * (`t_k = min ts of a step-k event with ts > t_{k-1}`), so state is k
  * longs per entity and each micro-batch folds its events into them in
  * event-time order. Cost per trigger ∝ batch; state ∝ entities × steps,
  * never events.
  *
  * Exactness contract: equal to the batch funnel over everything seen
  * when each entity's events arrive in non-decreasing event-time order
  * ACROSS batches (within a batch any order is fine — the fold sorts).
  * A late event can still tighten step k directly, but step-(k+1) events
  * that were rejected before it arrived are not replayed (state keeps no
  * event history — that is the point). Feed genuinely late sources
  * through [[LateDataBuffer]] first, the same contract as the rest of
  * the streaming surface.
  *
  * State growth: without a TTL, one `Seq[Long]` per entity FOREVER —
  * small (k longs) but entity-proportional, so a month of fact traffic
  * accumulates every entity ever seen with no eviction path. Pass
  * `inactivity` to bound it: entities whose LAST reached step-time is
  * older than the event-time watermark minus the horizon are evicted
  * (their funnel is complete or abandoned at that point). An evicted
  * entity that produces new events restarts from an empty funnel — the
  * deliberate semantics of an inactivity horizon, not a bug. */
object StreamingFunnel {

  private val Unreached = Long.MinValue

  /** The batch recurrence over one trigger's events: ts-ascending fold into
    * the per-entity step-time array; equal-ts order is irrelevant under
    * strict-after chaining. Mutates and returns `t`. */
  private def fold(
      t: Array[Long], it: Iterator[(String, String, Long)],
      stepIdx: Map[String, Int]): Array[Long] = {
    it.toSeq.sortBy(_._3).foreach { case (_, typ, ts) =>
      val k = stepIdx(typ)
      val qualified =
        k == 0 || (t(k - 1) != Unreached && ts > t(k - 1))
      if (qualified && (t(k) == Unreached || ts < t(k))) t(k) = ts
    }
    t
  }

  /** Per-trigger updates as `(entity, t_step1, …, t_stepK)` rows
    * (`Long.MinValue` = step not reached yet — a sign-based sentinel
    * would mis-handle legitimate pre-1970 negative epochs, which the
    * batch operators support; an event AT `Long.MinValue` micros is not a
    * representable instant, so the sentinel cannot collide); only
    * entities whose funnel CHANGED in the trigger emit. `events` must be
    * a streaming Dataset of `(entity, eventType, ts)` with `ts` in epoch
    * MICROSECONDS (the unit every batch operator here uses).
    *
    * @param inactivity when set, per-entity state is evicted once the
    *        event-time watermark (max seen `ts`, zero allowed lateness —
    *        late sources route through [[LateDataBuffer]] per the class
    *        contract) passes the entity's last reached step-time plus
    *        this horizon. `None` (default) keeps the unbounded
    *        `NoTimeout` behavior and its checkpoint compatibility. */
  def updates(
      events: Dataset[(String, String, Long)],
      steps: Seq[String],
      inactivity: Option[java.time.Duration] = None): Dataset[(String, Seq[Long])] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val stepEvents = events.filter(e => stepIdx.contains(e._2))

    inactivity match {
      case None =>
        stepEvents
          .groupByKey(_._1)
          .flatMapGroupsWithState[Seq[Long], (String, Seq[Long])](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (entity: String, it: Iterator[(String, String, Long)],
             state: GroupState[Seq[Long]]) =>
              val t = state.getOption
                .map(_.toArray)
                .getOrElse(Array.fill(steps.size)(Unreached))
              val before = t.toSeq
              val after = fold(t, it, stepIdx).toSeq
              if (after != before) {
                state.update(after)
                Iterator.single(entity -> after)
              } else Iterator.empty
          }

      case Some(horizon) =>
        require(!horizon.isNegative, s"inactivity must be >= 0, got $horizon")
        val horizonMs = horizon.toMillis
        // The watermark needs a TimestampType event-time column, derived
        // from ts (micros). It must stay in the operator's INPUT —
        // Spark's streaming checker looks for the watermark-tagged
        // attribute in the child's output, so it rides along as _4 and
        // the fold ignores it (ts stays raw micros). Delay 0: the
        // in-order-across-triggers contract means anything older than
        // the max seen ts is LateDataBuffer's job, not the watermark's.
        val withWm = stepEvents
          .toDF("_e", "_t", "_ts")
          .withColumn("_et", timestamp_micros(col("_ts")))
          .withWatermark("_et", "0 seconds")
          .as[(String, String, Long, java.sql.Timestamp)]
        withWm
          .groupByKey(_._1)
          .flatMapGroupsWithState[Seq[Long], (String, Seq[Long])](
            OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
            (entity: String, it4: Iterator[(String, String, Long, java.sql.Timestamp)],
             state: GroupState[Seq[Long]]) =>
              val it = it4.map(e => (e._1, e._2, e._3))
              if (state.hasTimedOut) {
                // complete-or-abandoned: last step-time aged past the
                // horizon. Drop state, emit nothing — downstream already
                // holds the entity's final funnel row.
                state.remove()
                Iterator.empty
              } else {
                val t = state.getOption
                  .map(_.toArray)
                  .getOrElse(Array.fill(steps.size)(Unreached))
                val before = t.toSeq
                val after = fold(t, it, stepIdx).toSeq
                val changed = after != before
                if (changed) state.update(after)
                if (state.exists) {
                  // re-arm off the LAST reached step-time (floor to ms,
                  // the GroupState timeout unit), clamped one past the
                  // current watermark — Spark rejects a timeout at or
                  // before it, and a late-but-buffered event can
                  // legitimately arm behind it.
                  val lastMs = java.lang.Math.floorDiv(
                    after.filter(_ != Unreached).max, 1000L)
                  state.setTimeoutTimestamp(math.max(
                    lastMs + horizonMs, state.getCurrentWatermarkMs + 1))
                }
                if (changed) Iterator.single(entity -> after)
                else Iterator.empty
              }
          }
    }
  }

  /** Drive [[updates]] into a `foreachBatch` sink (same attach shape as
    * [[StreamingDedup]]/[[StreamingClassify]]): `sink` gets a DataFrame of
    * `(entity, t_<step>… )` columns and the batch id. */
  def attach(
      df: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], checkpoint: String,
      inactivity: Option[java.time.Duration] = None)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(
      col(entityCol).cast("string"),
      col(typeCol).cast("string"),
      col(tsCol).cast("long")).as[(String, String, Long)]
    updates(typed, steps, inactivity).writeStream
      .outputMode("append")
      .foreachBatch((batch: Dataset[(String, Seq[Long])], id: Long) =>
        sink(
          batch.select(
            col("_1").as(entityCol) +:
              steps.zipWithIndex.map { case (s, i) =>
                when(element_at(col("_2"), i + 1) =!= Long.MinValue,
                  element_at(col("_2"), i + 1)).as(s"t_$s")
              }: _*),
          id))
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
