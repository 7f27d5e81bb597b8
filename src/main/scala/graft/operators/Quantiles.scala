package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT grouped quantiles by distributed rank selection — the scale-safe
  * replacement for `percentile()`, whose ObjectHashAggregate buffers every
  * group's values in one aggregation buffer (a by-design executor OOM once a
  * group outgrows a heap: 100 TB of lineitem has three `l_returnflag` groups).
  *
  * Count-then-select over the DISTINCT-value frame, no per-group value
  * buffer anywhere and — deliberately — no sampled range exchange:
  *
  *  1. ONE map-side-combined aggregate to the (group, value) → count frame.
  *    Duplicates compress before anything sorts: a value duplicated
  *    billions of times is ONE row here (the hot-key straggler shape other
  *    designs salt around simply doesn't exist).
  *  2. each distinct value is assigned a SLICE by a pure row function:
  *    `slice = #{b ∈ B : b ≤ v}` against a one-row broadcast frame `B` of
  *    `percentile_approx` cut points over the distinct values (accuracy
  *    only affects balance, never correctness). Cumulative counts within
  *    (group, slice) — a window over a bounded slice of DISTINCT values,
  *    never a whole group — plus per-slice totals give every distinct
  *    value its exact global rank range `(cum − c, cum]` and every group
  *    its `n`; the floor/ceil target ranks `r = 1 + p·(n−1)` select two
  *    rows per quantile, and a tiny aggregate interpolates
  *    `v_lo + (r − lo)·(v_hi − v_lo)` — the same linear interpolation as
  *    `percentile` and DuckDB's `quantile_cont`, so results hash-match.
  *
  * Why no `repartitionByRange`: its `RangePartitioner` samples boundaries
  * with an `rdd.id`-seeded RNG, so correctness required the count subtree
  * and the rank subtree to read the SAME physical exchange (ReusedExchange).
  * Feeding the operator a CACHED frame broke that reuse and the two passes
  * silently disagreed on slice membership — wrong quantiles, found by the
  * c09 conformal composition in round 11. Every slicing input here (the
  * aggregate, the `percentile_approx` cut points, the `#{b ≤ v}` bucket
  * function) is a deterministic pure function of content, so ANY number of
  * independent evaluations agree — cache-safe, AQE-safe, retry-safe, and
  * the within-slice window orders DISTINCT values (no ties, total order).
  *
  * Cost: one combined exchange of the distinct frame (≤ the old full-row
  * range exchange; far less under duplication) + the (group, slice) window
  * exchange of the same frame + two broadcast-joined tiny frames. The
  * largest single sort is one slice of distinct values (~distinct/slices),
  * independent of group sizes. Nulls are excluded, matching `percentile`.
  */
object Quantiles {

  /** One row per group; `quantiles` = (output column name, p ∈ [0,1]).
    * Values are cast to double; output columns are double. */
  def exactGrouped(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      quantiles: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(quantiles.nonEmpty, "quantiles must be non-empty")
    quantiles.foreach { case (n, p) =>
      require(p >= 0.0 && p <= 1.0, s"quantile $n=$p outside [0,1]")
    }
    val gCols = groupCols.map(col)
    val numSlices = df.sparkSession.sessionState.conf.numShufflePartitions

    // pass 1: duplicates compress into the (group, value) → count frame
    val vc = df.filter(col(valueCol).isNotNull)
      .groupBy(gCols :+ col(valueCol).cast("double").as("_v"): _*)
      .agg(count(lit(1)).as("_c"))

    // slice = #{cut point ≤ v}: pure function of the row against a one-row
    // broadcast of approximate GLOBAL cut points over the distinct values
    // (they only balance the window; any cuts — even none — stay exact)
    val sliced =
      if (numSlices < 2) vc.withColumn("_slice", lit(0))
      else {
        val cuts = vc.agg(percentile_approx(
          col("_v"),
          array((1 until numSlices).map(i =>
            lit(i.toDouble / numSlices)): _*),
          lit(1000)).as("_b"))
        vc.crossJoin(broadcast(cuts))
          .withColumn("_slice",
            coalesce(
              aggregate(col("_b"), lit(0), (acc, b) =>
                acc + when(b <= col("_v"), 1).otherwise(0)),
              lit(0)))
          .drop("_b")
      }

    // cumulative counts within (group, slice) — a window over a bounded
    // slice of DISTINCT values (total order: no ties by construction)
    val wCum = Window.partitionBy(gCols :+ col("_slice"): _*)
      .orderBy(col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = sliced.withColumn("_lcum", sum(col("_c")).over(wCum))

    // tiny frames: per-slice totals → slice offsets + group totals
    val sliceTotals = sliced
      .groupBy(gCols :+ col("_slice"): _*)
      .agg(sum(col("_c")).as("_sc"))
    val wOff = Window.partitionBy(gCols: _*).orderBy(col("_slice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliceTotals
      .withColumn("_off", coalesce(sum(col("_sc")).over(wOff), lit(0L)))
      .select(gCols ++ Seq(col("_slice"), col("_off")): _*)
    val totals = sliceTotals.groupBy(gCols: _*).agg(sum(col("_sc")).as("_n"))
    // per-group target ranks, 1-indexed: r = 1 + p·(n-1)
    val targets = quantiles.foldLeft(totals) { case (acc, (name, p)) =>
      acc.withColumn(s"_r_$name",
          lit(1.0) + lit(p) * (col("_n") - 1).cast("double"))
        .withColumn(s"_lo_$name", floor(col(s"_r_$name")).cast("long"))
        .withColumn(s"_hi_$name", ceil(col(s"_r_$name")).cast("long"))
    }.drop("_n")

    // pass 2: a distinct value covers global ranks (off+lcum−c, off+lcum];
    // keep the rows covering a floor/ceil target. Both joins are NULL-SAFE
    // on the group keys (the zscoreOutliers / funnelTimes convention: a
    // null group key is a real group and gets quantiles like any other)
    val offsetsR = offsets.select(
      groupCols.map(k => col(k).as(s"_qo_$k")) ++
        Seq(col("_slice").as("_qo_slice"), col("_off")): _*)
    val targetsR = targets.select(
      targets.columns.toSeq.map(c =>
        if (groupCols.contains(c)) col(c).as(s"_qt_$c") else col(c)): _*)
    val picked = ranked
      .join(broadcast(offsetsR),
        (groupCols.map(k => col(k) <=> col(s"_qo_$k")) :+
          (col("_slice") === col("_qo_slice"))).reduce(_ && _))
      .drop(groupCols.map(k => s"_qo_$k") :+ "_qo_slice": _*)
      .withColumn("_gcum", col("_off") + col("_lcum"))
      .join(broadcast(targetsR),
        groupCols.map(k => col(k) <=> col(s"_qt_$k")).reduce(_ && _))
      .drop(groupCols.map(k => s"_qt_$k"): _*)
      .filter(quantiles.map { case (name, _) =>
        (col(s"_lo_$name") > col("_gcum") - col("_c") &&
          col(s"_lo_$name") <= col("_gcum")) ||
          (col(s"_hi_$name") > col("_gcum") - col("_c") &&
            col(s"_hi_$name") <= col("_gcum"))
      }.reduce(_ || _))

    val aggs = quantiles.flatMap { case (name, _) =>
      Seq(
        max(when(col(s"_lo_$name") > col("_gcum") - col("_c") &&
          col(s"_lo_$name") <= col("_gcum"), col("_v"))).as(s"_vlo_$name"),
        max(when(col(s"_hi_$name") > col("_gcum") - col("_c") &&
          col(s"_hi_$name") <= col("_gcum"), col("_v"))).as(s"_vhi_$name"),
        max(col(s"_r_$name")).as(s"_rr_$name"),
        max(col(s"_lo_$name")).as(s"_flo_$name"))
    }
    val agg = picked.groupBy(gCols: _*).agg(aggs.head, aggs.tail: _*)
    quantiles.foldLeft(agg) { case (acc, (name, _)) =>
      acc.withColumn(name,
        col(s"_vlo_$name") +
          (col(s"_rr_$name") - col(s"_flo_$name")) *
          (col(s"_vhi_$name") - col(s"_vlo_$name")))
    }.select(gCols ++ quantiles.map { case (name, _) => col(name) }: _*)
  }

  /** [[exactGrouped]] for SEVERAL value columns in ONE two-pass job: the
    * columns are melted (`stack`) into (group, column-tag, value) rows and
    * the same range-slice rank selection runs with the tag as an extra group
    * key — n columns cost the SAME two balanced exchanges (of n× the rows)
    * instead of n independent two-pass jobs. One scan feeds every column,
    * and the fixed per-stage costs (exchange setup, AQE re-planning) are
    * paid once; at any scale the shuffled volume is identical to the n
    * separate jobs.
    *
    * `perCol` = (value column → its (output name, p) quantiles). Every
    * distinct p is computed for every column internally (target-rank rows
    * only — a handful per group); unrequested combinations are dropped in
    * the final pivot. Nulls are excluded per column like [[exactGrouped]],
    * with ONE deliberate edge-case difference: a group whose values are ALL
    * null in one column still appears (that quantile column null, the
    * others computed), whereas composing per-column [[exactGrouped]] calls
    * with inner joins would drop the group entirely — the partial row is
    * the more useful answer and the group's presence does not depend on
    * which columns were requested. Output: one row per group carrying every
    * requested quantile column. */
  def exactGroupedMulti(
      df: DataFrame, groupCols: Seq[String],
      perCol: Seq[(String, Seq[(String, Double)])]): DataFrame = {
    require(perCol.nonEmpty, "perCol must be non-empty")
    require(perCol.map(_._1).distinct.length == perCol.length,
      s"duplicate value columns in $perCol")
    val stackExpr = perCol
      .map { case (c, _) => s"'$c', cast(`$c` as double)" }
      .mkString(s"stack(${perCol.length}, ", ", ", ") as (_qcol, _qv)")
    val melted = df.select(groupCols.map(col) :+ expr(stackExpr): _*)
    val allQs = perCol.flatMap(_._2).map(_._2).distinct.zipWithIndex
      .map { case (p, i) => s"_q$i" -> p }
    val wide = exactGrouped(melted, groupCols :+ "_qcol", "_qv", allQs)
    val aggs = perCol.flatMap { case (c, qs) =>
      qs.map { case (name, p) =>
        val src = allQs.find(_._2 == p).get._1
        max(when(col("_qcol") === c, col(src))).as(name)
      }
    }
    wide.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group quantile BUCKETING — curriculum / quality binning: each row
    * gets `bucketCol` ∈ [1, nBuckets] from its value's position among its
    * group's `1/n … (n-1)/n` quantile cut points (bucket = 1 + number of cut
    * points strictly below the value; cut points are computed by
    * [[exactGrouped]] and stable-rounded to 6 dp before the compare so the
    * boundary is reproducible across engines).
    *
    * Scale shape: the cut-point frame is one row per group (broadcast), the
    * bucket assignment is a map-side expression — no shuffle beyond
    * [[exactGrouped]]'s two balanced passes, and no per-group window (the
    * `ntile` formulation sorts each whole group in one task; this never
    * does). */
  def withQuantileBucket(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      nBuckets: Int, bucketCol: String = "bucket"): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val cutNames = (1 until nBuckets).map(i => s"_qb_c$i")
    val cuts = exactGrouped(
      df, groupCols, valueCol,
      cutNames.zipWithIndex.map { case (n, i) =>
        n -> (i + 1).toDouble / nBuckets
      })
    val b = cutNames
      .map(n => when(col(valueCol).cast("double") > stableRound(col(n), 6), 1)
        .otherwise(0))
      .reduce(_ + _)
    df.join(broadcast(cuts), groupCols)
      .withColumn(bucketCol, (lit(1) + b).cast("long"))
      .drop(cutNames: _*)
  }

  /** Per-group midrank percentile (CDF) normalization — the cross-source
    * score calibration step: a raw quality score is only comparable
    * WITHIN its source (each classifier/heuristic has its own scale), so
    * a global cut keeps "the top 30% of each source" only after mapping
    * every score to its within-group percentile. Midrank convention:
    * `pct = (count_below + count_equal/2) / n` — ties share one
    * percentile, the estimator is symmetric (mean pct = 0.5 exactly).
    *
    * Scale shape: aggregate-then-window, never a per-row group sort. The
    * running sum ranks the per-(group, DISTINCT value) table — bounded by
    * distinct score values per group, which for any real score (rounded
    * floats, integer lengths) is orders of magnitude below row count —
    * and the percentile joins back on (group, value), AQE-sized. A
    * `percent_rank()` window over the raw rows would instead sort every
    * group's full row set in one task each — the unpartitioned-window
    * trap one level down. Null values cannot be ranked and emit
    * `pct = NULL` (rows kept, the explicit-absence contract); null GROUP
    * keys are real groups (null-safe join back, the funnelTimes
    * convention).
    *
    * Output: the input rows + `pctCol`, 6 dp. */
  def percentileNormalize(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      pctCol: String = "pct"): DataFrame = {
    require(groupCols.nonEmpty, "percentileNormalize needs a group column")
    val v = col(valueCol).cast("double")
    val vc = df
      .filter(v.isNotNull)
      .groupBy(groupCols.map(col) :+ v.as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val ranked = vc
      .withColumn("_cb",
        sum("_c").over(byGroup.orderBy(col("_v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
          col("_c"))
      .withColumn("_n", sum("_c").over(byGroup))
      .select(
        groupCols.map(k => col(k).as(s"_graft_pn_$k")) ++ Seq(
          col("_v"),
          stableRound(
            (col("_cb") + lit(0.5) * col("_c")) / col("_n"), 6).as(pctCol)): _*)
    df.join(ranked,
        groupCols.map(k => col(k) <=> col(s"_graft_pn_$k"))
          .reduce(_ && _) && (v === col("_v")),
        "left")
      .drop(groupCols.map(k => s"_graft_pn_$k") :+ "_v": _*)
  }
}
