package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over an event stream: conversion funnels
  * ("did A, then B strictly after it, then C…") and cohort retention —
  * the classic product/ops questions an events table exists to answer.
  *
  * Scale shape: both operators shuffle ONCE on the entity key. The funnel
  * resolves every step in a single per-key sort — step k's "earliest
  * qualified time" is a running `min` window over step k−1's, and stacked
  * windows with the same spec share one sort — so cost is
  * O(events log events-per-key) with no self-joins (the naive k-way
  * "events JOIN events" funnel is quadratic in the hot key and k-fold in
  * shuffle volume). A pathologically hot key serializes its partition
  * like any keyed window — the q24 (key, time-bucket) split applies if
  * one entity dominates. Cohort retention collapses to distinct
  * (entity, bucket) pairs before counting, so shuffle after the first
  * aggregate is ∝ entities × active buckets, never events.
  */
object Sequence {

  /** Earliest completion time of each funnel step, per entity. A step
    * qualifies only STRICTLY after the previous step's earliest qualified
    * time (same-instant events do not chain). Output: one row per entity
    * of `df` — including entities with no step events at all — with
    * `t_<step>` epoch columns (null = never reached; once a step is null
    * all later steps are null by construction).
    *
    * NO window, NO sort: with strict-after chaining, "earliest qualified
    * step-k event" collapses to the scalar recurrence
    * `t_k = min(ts of step-k events with ts > t_{k-1})` — any step-k
    * event later than `t_{k-1}` necessarily has that completion before it
    * in time order, so the per-row running-min window the textbook
    * formulation uses is equivalent and unnecessary. Each step is one
    * map-side-combined conditional aggregate plus an entity-keyed join of
    * the step events against the (entities-sized) previous-step frame, so
    * a hot entity is absorbed by partial aggregation instead of
    * serializing a per-entity sort (measured: 90%-hot entity at 4M rows
    * ran 8.6 s / max-med 51× as a window, 2.7 s balanced as aggregates —
    * SCALE.md). Shuffle honesty: while the previous-step frame broadcasts
    * (AQE, entities-sized — MBs up to tens of millions of entities), NO
    * event row enters any exchange; past the broadcast threshold the
    * per-step joins fall back to shuffling the step events by entity,
    * which re-concentrates a hot entity's rows per join — cheaper than
    * the sort (probe + partial-agg work per row, no ordering) but no
    * longer skew-free. In that regime pre-aggregate per (entity, type)
    * first if types repeat heavily, or salt the join
    * ([[SkewJoin.saltedJoin]]). */
  def funnelTimes(
      df: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    // non-step events influence nothing; drop them before any shuffle
    val stepEvents = df
      .filter(col(typeCol).isin(steps: _*))
      .select(col(entityCol), col(typeCol), col(tsCol))
    val first = stepEvents
      .groupBy(col(entityCol))
      .agg(min(when(col(typeCol) === steps.head, col(tsCol)))
        .as(s"t_${steps.head}"))
    // joins below are NULL-SAFE on the entity key: a null entity is a
    // legitimate group (the oracle's GROUP BY keeps it, with real step
    // times) — a plain equi-join would silently drop its chain
    val chained = steps.zipWithIndex.tail.foldLeft(first) {
      case (prev, (step, i)) =>
        val prevT = s"t_${steps(i - 1)}"
        val carried = steps.take(i).map(s => max(col(s"t_$s")).as(s"t_$s"))
        val prevR = prev.withColumnRenamed(entityCol, "_graft_prev_e")
        stepEvents
          .join(prevR, col(entityCol) <=> col("_graft_prev_e"))
          .groupBy(col(entityCol))
          .agg(
            carried.head,
            carried.tail :+
              min(when(
                col(typeCol) === step && col(tsCol) > col(prevT),
                col(tsCol))).as(s"t_$step"): _*)
    }
    // restore entities whose events were all non-step (all-null funnel row)
    val chainedR = chained.withColumnRenamed(entityCol, "_graft_chain_e")
    df.select(col(entityCol)).distinct()
      .join(chainedR, col(entityCol) <=> col("_graft_chain_e"), "left")
      .drop("_graft_chain_e")
  }

  /** Cohort retention: bucket every entity by its FIRST activity
    * (epoch-anchored `bucketUs`-wide buckets of `tsCol`), then count how
    * many entities of each cohort were active in each later bucket.
    * Output: `(cohort_bucket, active_bucket, n_entities)` — exact longs.
    * One exchange on the entity (whole-partition min window, no sort),
    * one distinct collapse, one count. */
  // exact integer floor-div for epochs of any magnitude: subtracting the
  // non-negative pmod makes the numerator an exact multiple (pure long
  // arithmetic), and the division runs in DECIMAL, not double — a double
  // quotient of a long ≥ 2^53 can land one ulp below the true integer and
  // truncate to the wrong bucket (epoch-NANOS inputs are in that range).
  // AsOfJoin expresses the same invariant as SQL `... DIV w` — that form
  // needs a NAMED column inside expr(); this helper takes arbitrary
  // Column expressions (window results, casts), hence the decimal route.
  // Semantics pin: this is FLOOR division (pmod is non-negative, so
  // -25/10 buckets to -3, not -2) and the DuckDB oracles replay it with
  // `//`, which is floor division too — an oracle rewritten with `/` +
  // CAST (truncation) would diverge on pre-1970 negative epochs.
  // Covered by SequenceSpec's negative-epoch bucket tests.
  private def bucketOf(c: Column, widthUs: Long): Column = {
    val exactMultiple = c.cast("long") - pmod(c.cast("long"), lit(widthUs))
    (exactMultiple.cast("decimal(38,0)") / lit(widthUs)).cast("long")
  }

  def cohortRetention(
      df: DataFrame, entityCol: String, tsCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val wAll = Window.partitionBy(col(entityCol))
    val bucket = (c: Column) => bucketOf(c, bucketUs)
    df
      .select(
        col(entityCol),
        bucket(min(col(tsCol)).over(wAll)).as("cohort_bucket"),
        bucket(col(tsCol)).as("active_bucket"))
      .distinct()
      .groupBy(col("cohort_bucket"), col("active_bucket"))
      .agg(count(lit(1)).as("n_entities"))
  }

  /** First-order transition matrix over each entity's event sequence
    * (process mining: which step follows which, how often): consecutive
    * event-type pairs under (time, `orderCol`) order, counted and
    * row-normalized. Output: `(from_type, to_type, n_transitions, p)`
    * with `p` the per-from transition probability (rounded 6 dp).
    *
    * One exchange + one per-entity sort produces every adjacent pair via
    * `lead`; the count collapse leaves a types²-sized frame, and the
    * row-normalizing totals join is over a types-sized frame — broadcast
    * by construction. Nothing after the first window is event-count
    * proportional.
    *
    * Hot-entity control: adjacency genuinely needs order (no funnel-style
    * aggregate collapse exists), so a 90%-hot entity serializes the flat
    * window's sort. Pass `bucketUs > 0` to route through
    * [[transitionPairsBucketed]] — within-(entity, time-bucket) windows
    * plus boundary stitching over a buckets-sized frame — bounding any
    * task by rows-per-bucket at the cost of one extra tiny window. Output
    * is identical (property-pinned). */
  def transitionCounts(
      df: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      orderCol: String, bucketUs: Long = 0L): DataFrame = {
    require(bucketUs >= 0, s"bucketUs must be >= 0, got $bucketUs")
    val pairs =
      if (bucketUs == 0L) {
        val w = Window.partitionBy(col(entityCol))
          .orderBy(col(tsCol), col(orderCol))
        df.withColumn("_next", lead(col(typeCol), 1).over(w))
          .filter(col("_next").isNotNull)
          .select(col(typeCol).as("_from"), col("_next").as("_to"))
      } else transitionPairsBucketed(df, entityCol, typeCol, tsCol,
        orderCol, bucketUs)
    val counts = pairs
      .groupBy(col("_from").as("from_type"), col("_to").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).as("_ft"))
    counts
      .join(broadcast(totals), "from_type")
      .withColumn(
        "p",
        graft.operators.stableRound(
          col("n_transitions").cast("double") / col("_ft"), 6))
      .drop("_ft")
  }

  /** The q24 discipline applied to `lead`: adjacent pairs WITHIN each
    * (entity, `bucketUs`-wide time bucket) via a bucketed window — task
    * input bounded by rows-per-bucket, not rows-per-entity — plus the
    * bucket-boundary pairs, stitched from a buckets-sized frame (one
    * first/last aggregate per non-empty bucket, then `lead` over buckets;
    * empty buckets are simply absent, so adjacency skips them exactly as
    * the flat order does). Identical output to the flat window —
    * property-pinned in SequenceSpec. */
  private def transitionPairsBucketed(
      df: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      orderCol: String, bucketUs: Long): DataFrame = {
    val withB = df.withColumn("_bkt", bucketOf(col(tsCol), bucketUs))
    val wIn = Window.partitionBy(col(entityCol), col("_bkt"))
      .orderBy(col(tsCol), col(orderCol))
    val inner = withB
      .withColumn("_next", lead(col(typeCol), 1).over(wIn))
      .filter(col("_next").isNotNull)
      .select(col(typeCol).as("_from"), col("_next").as("_to"))
    val ends = withB
      .groupBy(col(entityCol), col("_bkt"))
      .agg(
        min_by(col(typeCol), struct(col(tsCol), col(orderCol))).as("_first"),
        max_by(col(typeCol), struct(col(tsCol), col(orderCol))).as("_last"))
    val wB = Window.partitionBy(col(entityCol)).orderBy(col("_bkt"))
    val boundary = ends
      .withColumn("_nextFirst", lead(col("_first"), 1).over(wB))
      .filter(col("_nextFirst").isNotNull)
      .select(col("_last").as("_from"), col("_nextFirst").as("_to"))
    inner.unionByName(boundary)
  }

  /** Resample each entity's observations onto a regular `stepUs`-wide
    * epoch-anchored grid spanning that entity's own observed range,
    * forward-filling `valueCol` from the latest observation at-or-before
    * each grid instant (null before the first observation — forward fill
    * never invents a value). Output: `(entityCol, grid_ts, valueCol)`.
    *
    * Same-instant observations collapse to their max BEFORE the as-of
    * attach, so the fill is deterministic regardless of physical order.
    * The grid explode is per-entity-range: rows ∝ Σ entity ranges / step —
    * pick `stepUs` so that stays sane (a 10-year range at 1 ms steps is
    * 3×10¹¹ grid rows; that is a caller bug, not an engine strategy).
    * The attach is [[AsOfJoin.asOf]] — one union exchange + per-key
    * window, hot-key auto-routing included. */
  def resampleFfill(
      df: DataFrame, entityCol: String, tsCol: String, valueCol: String,
      stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    val obs = df
      .groupBy(col(entityCol), col(tsCol))
      .agg(max(col(valueCol)).as(valueCol))
    val ranges = obs
      .groupBy(col(entityCol))
      .agg(
        min(bucketOf(col(tsCol), stepUs)).as("_b0"),
        max(bucketOf(col(tsCol), stepUs)).as("_b1"))
    val grid = ranges
      .select(
        col(entityCol),
        explode(sequence(col("_b0"), col("_b1"))).as("_b"))
      .select(col(entityCol), (col("_b") * lit(stepUs)).as("grid_ts"))
    AsOfJoin.asOf(
      grid, obs, Seq(entityCol), Seq(entityCol), "grid_ts", tsCol,
      Seq(valueCol), inclusive = true)
  }
}
