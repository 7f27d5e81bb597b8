package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score anomalies — the incremental form of
  * [[graft.operators.Profiling.rollingZscore]]: per key, each arriving
  * event is scored against the trailing `windowSize` of event time
  * (INCLUDING itself), emitting only `|z| ≥ zThreshold` rows. State per key
  * is exactly the points inside the trailing window (pruned on every
  * trigger as the key's clock advances) — bounded by window × event rate,
  * never by stream length — and idle keys are EVICTED once the event-time
  * watermark passes their last point plus the `inactivity` horizon (the
  * [[StreamingFunnel]] TTL discipline, on by default here: an anomaly
  * monitor over a keyed stream otherwise accumulates every key ever seen).
  *
  * Exactness contract: equal to the batch operator over everything seen
  * when each key's events arrive in non-decreasing event-time order ACROSS
  * triggers (within a trigger any order is fine — the fold sorts, and
  * equal-ts events are scored against the window INCLUDING each other,
  * matching the batch RANGE frame) AND cross-KEY event-time skew between
  * triggers stays within `watermarkDelay`: the eviction watermark is
  * GLOBAL, so a key whose clock lags the stream's max by more than the
  * delay has its (per-key in-order!) events dropped as late — size
  * `watermarkDelay` to the expected cross-key skew. Equal-ts events SPLIT
  * across triggers score against different windows than the batch form —
  * route genuinely late/disordered sources through [[LateDataBuffer]],
  * the standing contract of this surface. */
object StreamingZscore {

  /** Per-trigger anomaly rows `(key, ts, value, n_window, z)`; `ts` in
    * epoch MICROSECONDS. Rows with a null key/ts/value are dropped (the
    * batch operator's filter — not a query-killing deserializer error). */
  def updates(
      events: Dataset[(String, Long, Double)],
      windowSize: Long, zThreshold: Double, minCount: Int = 5,
      inactivity: java.time.Duration = java.time.Duration.ofDays(7),
      watermarkDelay: java.time.Duration = java.time.Duration.ZERO)
      : Dataset[(String, Long, Double, Long, Double)] = {
    require(windowSize > 0 && zThreshold > 0 && minCount >= 2)
    require(!inactivity.isNegative, s"inactivity must be >= 0, got $inactivity")
    require(!watermarkDelay.isNegative,
      s"watermarkDelay must be >= 0, got $watermarkDelay")
    val spark = events.sparkSession
    import spark.implicits._
    val horizonMs = inactivity.toMillis
    val withWm = events
      .toDF("_k", "_ts", "_v")
      .withColumn("_et", timestamp_micros(col("_ts")))
      .withWatermark("_et", s"${watermarkDelay.toMillis} milliseconds")
      .as[(String, Long, Double, java.sql.Timestamp)]
    withWm
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Double)], (String, Long, Double, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[(String, Long, Double, java.sql.Timestamp)],
         state: GroupState[Seq[(Long, Double)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var buf = state.getOption.getOrElse(Seq.empty).toVector
            val out = Vector.newBuilder[(String, Long, Double, Long, Double)]
            // ts-ascending; equal-ts events enter the window TOGETHER, then
            // each is scored — the batch RANGE-frame semantics
            it.toSeq.map(e => (e._2, e._3)).sortBy(_._1)
              .groupBy(_._1).toSeq.sortBy(_._1)
              .foreach { case (ts, group) =>
                buf = buf.dropWhile(_._1 < ts - windowSize) ++ group
                val n = buf.size.toLong
                if (n >= minCount) {
                  var s = 0.0; var ss = 0.0
                  buf.foreach { p => s += p._2; ss += p._2 * p._2 }
                  val variance = (ss - s * s / n) / n
                  if (variance > 0) {
                    val mean = s / n
                    val sd = math.sqrt(variance)
                    group.foreach { case (_, v) =>
                      // round BEFORE thresholding, and with the SAME
                      // rounding Spark's round() uses (BigDecimal
                      // HALF_UP) — scaled-rint is HALF_EVEN and flips
                      // keep/drop calls exactly on rounding boundaries
                      val z = BigDecimal((v - mean) / sd + 1e-9)
                        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
                        .toDouble
                      if (math.abs(z) >= zThreshold)
                        out += ((key, ts, v, n, z))
                    }
                  }
                }
              }
            if (buf.nonEmpty) {
              state.update(buf)
              val lastMs = java.lang.Math.floorDiv(buf.last._1, 1000L)
              state.setTimeoutTimestamp(math.max(
                lastMs + horizonMs, state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Drive [[updates]] into a foreachBatch sink (the standard attach shape):
    * `sink` receives `(keyCol, tsCol, valueCol, n_window, z)` rows and the
    * batch id. */
  def attach(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      windowSize: Long, zThreshold: Double, minCount: Int,
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
      // the batch operator FILTERS null ts/value; deserializing a null
      // into the primitive tuple slot would kill the query instead
      .where(col("_k").isNotNull && col("_ts").isNotNull && col("_v").isNotNull)
      .as[(String, Long, Double)]
    updates(typed, windowSize, zThreshold, minCount, inactivity, watermarkDelay)
      .writeStream
      .outputMode("append")
      .foreachBatch((batch: Dataset[(String, Long, Double, Long, Double)], id: Long) =>
        sink(batch.toDF(keyCol, tsCol, valueCol, "n_window", "z"), id))
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
