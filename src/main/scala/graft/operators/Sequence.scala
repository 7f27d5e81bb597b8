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
    * time (same-instant events do not chain; supply `orderCol` as the
    * deterministic tie-break within a timestamp). Output: one row per
    * entity, `t_<step>` epoch columns (null = never reached — and once a
    * step is null all later steps are null by construction). */
  def funnelTimes(
      df: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      orderCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // _q_i = this row's time if it is a qualified step-i event; running
    // min(_q_i) = earliest step-i completion visible so far, which is what
    // qualifies step i+1 rows later in the same sort.
    val qualified = steps.zipWithIndex.foldLeft(df) { case (acc, (step, i)) =>
      val isStep = col(typeCol) === lit(step)
      val q =
        if (i == 0) when(isStep, col(tsCol))
        else {
          val prevReached = min(col(s"_q_${i - 1}")).over(w)
          when(isStep && col(tsCol) > prevReached, col(tsCol))
        }
      acc.withColumn(s"_q_$i", q)
    }
    qualified
      .groupBy(col(entityCol))
      .agg(
        min(col("_q_0")).as(s"t_${steps.head}"),
        steps.indices.tail.map(i =>
          min(col(s"_q_$i")).as(s"t_${steps(i)}")): _*)
  }

  /** Cohort retention: bucket every entity by its FIRST activity
    * (epoch-anchored `bucketUs`-wide buckets of `tsCol`), then count how
    * many entities of each cohort were active in each later bucket.
    * Output: `(cohort_bucket, active_bucket, n_entities)` — exact longs.
    * One exchange on the entity (whole-partition min window, no sort),
    * one distinct collapse, one count. */
  def cohortRetention(
      df: DataFrame, entityCol: String, tsCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val wAll = Window.partitionBy(col(entityCol))
    // exact integer floor-div for non-negative epochs: subtract the pmod
    // remainder first so the double division is of an exact multiple
    // (plain `c / bucketUs` rounds in double space near bucket boundaries)
    val bucket = (c: Column) =>
      ((c - pmod(c, lit(bucketUs))) / lit(bucketUs)).cast("long")
    df
      .select(
        col(entityCol),
        bucket(min(col(tsCol)).over(wAll)).as("cohort_bucket"),
        bucket(col(tsCol)).as("active_bucket"))
      .distinct()
      .groupBy(col("cohort_bucket"), col("active_bucket"))
      .agg(count(lit(1)).as("n_entities"))
  }
}
