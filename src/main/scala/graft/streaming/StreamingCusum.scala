package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Page's ONLINE CUSUM — the ingest-time twin of
  * [[graft.operators.Profiling.cusumChangepoint]]: the batch operator asks
  * "WHEN did this metric shift?" retrospectively; this one raises the
  * alarm AS the shift happens. Per key, the classic one-sided pair over a
  * FROZEN per-key reference mean `μ₀`:
  *
  *   S⁺ ← max(0, S⁺ + (x − μ₀ − k))    (upward drift)
  *   S⁻ ← max(0, S⁻ + (μ₀ − x − k))    (downward drift)
  *
  * with slack `k` (per-event tolerated deviation — drifts smaller than `k`
  * never accumulate) and alarm threshold `h`; an alarm resets its side to
  * 0 (Page's restart), so a persisting shift re-alarms every ~`h/Δ`
  * events rather than once. Alarm rows:
  * `(key, ts, value, direction, statistic)`, direction `up`/`down`,
  * statistic 6dp-rounded BEFORE the `> h` compare (boundary discipline).
  *
  * The reference is a KEYS-sized driver map captured from the accepted
  * corpus (e.g. q69's bucket means, or a plain per-key `avg`) — the same
  * frozen-model discipline as [[StreamingDrift]]/[[StreamingClassify]];
  * refresh between restarts. Keys with no reference are dropped (no
  * baseline, no test).
  *
  * State per key is TWO doubles (+ the timeout clock) — the cheapest
  * state in the streaming family; idle keys are evicted once the
  * event-time watermark passes their last event plus `inactivity` (the
  * [[StreamingZscore]] TTL discipline). Events fold in (ts, value) order
  * within a trigger, so a trigger's output is deterministic under shuffle;
  * the in-order-across-triggers contract matches [[StreamingZscore]]
  * (route disordered sources through [[LateDataBuffer]]). */
object StreamingCusum {

  /** Per-trigger alarm rows `(key, ts, value, direction, statistic)`;
    * `ts` in epoch MICROSECONDS. */
  def updates(
      events: Dataset[(String, Long, Double)],
      reference: Map[String, Double], k: Double, h: Double,
      inactivity: java.time.Duration = java.time.Duration.ofDays(7),
      watermarkDelay: java.time.Duration = java.time.Duration.ZERO)
      : Dataset[(String, Long, Double, String, Double)] = {
    require(reference.nonEmpty, "StreamingCusum needs a non-empty reference")
    require(k >= 0.0, s"slack k must be >= 0, got $k")
    require(h > 0.0, s"threshold h must be positive, got $h")
    require(!inactivity.isNegative, s"inactivity must be >= 0, got $inactivity")
    require(!watermarkDelay.isNegative,
      s"watermarkDelay must be >= 0, got $watermarkDelay")
    val spark = events.sparkSession
    import spark.implicits._
    val horizonMs = inactivity.toMillis
    val ref = reference // stable closure capture
    val withWm = events
      .toDF("_k", "_ts", "_v")
      .withColumn("_et", timestamp_micros(col("_ts")))
      .withWatermark("_et", s"${watermarkDelay.toMillis} milliseconds")
      .as[(String, Long, Double, java.sql.Timestamp)]
    withWm
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Double, Long), (String, Long, Double, String, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[(String, Long, Double, java.sql.Timestamp)],
         state: GroupState[(Double, Double, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else ref.get(key) match {
            case None =>
              // no frozen baseline for this key: drain without state
              Iterator.empty
            case Some(mu0) =>
              var (sPos, sNeg, _) = state.getOption.getOrElse((0.0, 0.0, 0L))
              var lastTs = 0L
              val out = Vector.newBuilder[(String, Long, Double, String, Double)]
              def r6(x: Double): Double = BigDecimal(x + 1e-9)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              it.toSeq.map(e => (e._2, e._3)).sorted.foreach { case (ts, v) =>
                lastTs = math.max(lastTs, ts)
                sPos = math.max(0.0, sPos + (v - mu0 - k))
                sNeg = math.max(0.0, sNeg + (mu0 - v - k))
                val rp = r6(sPos)
                if (rp > h) { out += ((key, ts, v, "up", rp)); sPos = 0.0 }
                val rn = r6(sNeg)
                if (rn > h) { out += ((key, ts, v, "down", rn)); sNeg = 0.0 }
              }
              if (lastTs > 0L) {
                state.update((sPos, sNeg, lastTs))
                val lastMs = java.lang.Math.floorDiv(lastTs, 1000L)
                state.setTimeoutTimestamp(math.max(
                  lastMs + horizonMs, state.getCurrentWatermarkMs + 1))
              }
              out.result().iterator
          }
      }
  }

  /** Drive [[updates]] into a foreachBatch sink (the standard attach
    * shape): `sink` receives `(keyCol, tsCol, valueCol, direction,
    * statistic)` rows and the batch id. */
  def attach(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      reference: Map[String, Double], k: Double, h: Double,
      checkpoint: String,
      inactivity: java.time.Duration = java.time.Duration.ofDays(7),
      watermarkDelay: java.time.Duration = java.time.Duration.ZERO)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(
        col(keyCol).cast("string").as("_k"),
        col(tsCol).cast("long").as("_ts"),
        col(valueCol).cast("double").as("_v"))
      .where(col("_k").isNotNull && col("_ts").isNotNull && col("_v").isNotNull)
      .as[(String, Long, Double)]
    updates(typed, reference, k, h, inactivity, watermarkDelay)
      .writeStream
      .outputMode("append")
      .foreachBatch((batch: Dataset[(String, Long, Double, String, Double)], id: Long) =>
        sink(batch.toDF(keyCol, tsCol, valueCol, "direction", "statistic"), id))
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
