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
  * the streaming surface. */
object StreamingFunnel {

  /** Per-trigger updates as `(entity, t_step1, …, t_stepK)` rows
    * (`Long.MinValue` = step not reached yet — a sign-based sentinel
    * would mis-handle legitimate pre-1970 negative epochs, which the
    * batch operators support; an event AT `Long.MinValue` micros is not a
    * representable instant, so the sentinel cannot collide); only
    * entities whose funnel CHANGED in the trigger emit. `events` must be
    * a streaming Dataset of `(entity, eventType, ts)`. */
  def updates(
      events: Dataset[(String, String, Long)],
      steps: Seq[String]): Dataset[(String, Seq[Long])] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events
      .filter(e => stepIdx.contains(e._2))
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (String, Seq[Long])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: String, it: Iterator[(String, String, Long)],
         state: GroupState[Seq[Long]]) =>
          val Unreached = Long.MinValue
          val t = state.getOption
            .map(_.toArray)
            .getOrElse(Array.fill(steps.size)(Unreached))
          val before = t.toSeq
          // ts-ascending fold = the batch recurrence; equal-ts order is
          // irrelevant under strict-after chaining
          it.toSeq.sortBy(_._3).foreach { case (_, typ, ts) =>
            val k = stepIdx(typ)
            val qualified =
              k == 0 || (t(k - 1) != Unreached && ts > t(k - 1))
            if (qualified && (t(k) == Unreached || ts < t(k))) t(k) = ts
          }
          val after = t.toSeq
          if (after != before) {
            state.update(after)
            Iterator.single(entity -> after)
          } else Iterator.empty
      }
  }

  /** Drive [[updates]] into a `foreachBatch` sink (same attach shape as
    * [[StreamingDedup]]/[[StreamingClassify]]): `sink` gets a DataFrame of
    * `(entity, t_<step>… )` columns and the batch id. */
  def attach(
      df: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], checkpoint: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(
      col(entityCol).cast("string"),
      col(typeCol).cast("string"),
      col(tsCol).cast("long")).as[(String, String, Long)]
    updates(typed, steps).writeStream
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
