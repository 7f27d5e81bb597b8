package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the ingest-time diagnostic a pipeline runs
  * before trusting a new source drop: null counts, exact distinct
  * cardinality, range, and mean per numeric column, in ONE corpus pass.
  *
  * Plan shape: a single aggregate computes every column's statistics side
  * by side (multi-column count-distinct plans one Expand — rows × cols
  * intermediate, the standard multi-distinct trade; for approximate
  * profiling at extreme widths use the mergeable HLL sketches in
  * [[graft.functions.Sketches]] instead), then a `stack` unpivot of the ONE
  * result row into a row per column — no per-column corpus passes, no
  * driver-side loop.
  */
object Profiling {

  /** Profile `cols` (numeric or numeric-castable) of `df`. Output: one row
    * per column — `(col_name, n_nulls, n_distinct, vmin, vmax, mean)`,
    * min/max/mean as doubles, mean boundary-stable rounded to 6 dp
    * (mirror as `ROUND(AVG(c) + 1e-9, 6)`). Distinct counts ignore nulls
    * (both engines' `COUNT(DISTINCT ...)` semantics). */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        stableRound(avg(col(c)), 6).as(s"${c}__mean"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`, `${c}__mean`")
      .mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) as (col_name, n_nulls, n_distinct, vmin, vmax, mean)"))
  }

  /** ROC threshold sweep for a keep/drop curation score: confusion counts
    * and rates at every candidate cutoff, under the rule "predict positive
    * when score ≥ threshold". Output, one row per DISTINCT score value:
    * `(threshold, tp, fp, fn, tn, tpr, fpr)` — counts exact longs, rates
    * boundary-stable rounded to 6 dp. This is how a pipeline picks the
    * quality-classifier cutoff (e.g. from [[Classifier.scoreNaiveBayes]]):
    * sweep once, read the tradeoff, pin the threshold.
    *
    * Plan shape: ONE corpus aggregate collapses the data to a row per
    * distinct score (shuffle ∝ distinct scores, map-side combined), then
    * the cumulative confusion counts come from a DISTRIBUTED prefix sum
    * over that collapsed frame ([[Packing.globalRunningSums]] — range
    * exchange + bounded per-slice window + broadcast offsets; no
    * unpartitioned window anywhere, so a high-cardinality score column
    * cannot serialize one task). For continuous scores at 100 TB,
    * quantile-bucket first ([[Quantiles.withQuantileBucket]] / t16) so
    * the OUTPUT stays thousands of rows regardless of corpus size. */
  def rocSweep(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    sweepCounts(df, scoreCol, labelCol)
      .select(
        col("threshold"),
        col("tp"), col("fp"),
        (col("_p") - col("tp")).as("fn"),
        (col("_n") - col("fp")).as("tn"),
        // a corpus missing a class has no defined rate (and ANSI division
        // would throw): null, not a crash
        stableRound(when(col("_p") > 0,
          col("tp").cast("double") / col("_p")), 6).as("tpr"),
        stableRound(when(col("_n") > 0,
          col("fp").cast("double") / col("_n")), 6).as("fpr"))

  /** Area under the ROC curve for score/label columns of `df`: trapezoid
    * rule over the [[rocSweep]] operating points with the implicit (0,0)
    * origin. One row out (`auc`, rounded 6 dp). No ordering window at
    * all: each threshold row already knows its own cumulative (tp, fp)
    * AND its per-threshold increments, so its trapezoid slice
    * `Δfpr · (tpr + tpr_prev)/2` is computable per row and the area is a
    * plain order-free aggregate. */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    sweepCounts(df, scoreCol, labelCol)
      // missing class -> no defined curve -> null terms -> null auc
      .filter(col("_p") > 0 && col("_n") > 0)
      .select(
        ((col("fp") - col("_neg")).cast("double") / col("_n")).as("_pf"),
        (col("fp").cast("double") / col("_n")).as("_f"),
        ((col("tp") - col("_pos")).cast("double") / col("_p")).as("_pt"),
        (col("tp").cast("double") / col("_p")).as("_t"))
      .agg(stableRound(
        sum((col("_f") - col("_pf")) * (col("_t") + col("_pt")) / 2), 6)
        .as("auc"))

  /** Pairwise Pearson correlation matrix over `cols` — the other half of
    * the ingest diagnostic ([[numericProfile]] characterizes columns,
    * this characterizes their relationships): one row per unordered pair,
    * `(col_a, col_b, n_pairs, corr)`, corr rounded 6 dp, null when either
    * side has zero variance or fewer than 2 complete pairs.
    *
    * ONE corpus pass: every pair's closed-form sums (6 per pair,
    * COMPLETE-CASE — each conditioned on BOTH sides non-null, so a null
    * in one column cannot skew another pair's statistics) computed side
    * by side in a single aggregate, then a `stack` unpivot of the one
    * result row. The oracle must replay THIS formula — an engine's
    * `corr()` uses a different accumulation and float-diverges. Pairs
    * grow k²/2: meant for profiling-sized column lists, not hundreds. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    // the pair sums are addressed through generated SQL (`stack` needs a
    // literal argument list) with `__`-joined aliases: a name carrying a
    // backtick/quote would break the parse, and one containing `__` could
    // collide two different pairs' aliases — reject both up front
    cols.foreach { c =>
      require(!c.contains("`") && !c.contains("'") && !c.contains("__"),
        s"correlationMatrix column name '$c' may not contain backticks, " +
          "quotes, or '__' (used as the internal alias separator) — " +
          "alias the column first")
    }
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.flatMap { case (a, b) =>
      val x = col(a).cast("double")
      val y = col(b).cast("double")
      val both = x.isNotNull && y.isNotNull
      def s(e: Column, suffix: String) =
        sum(when(both, e).otherwise(lit(null))).as(s"${a}__${b}__$suffix")
      Seq(
        sum(when(both, 1L).otherwise(0L)).as(s"${a}__${b}__n"),
        s(x, "sx"), s(y, "sy"), s(x * x, "sxx"), s(y * y, "syy"),
        s(x * y, "sxy"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      val p = s"`${a}__${b}"
      val (n, sx, sy, sxx, syy, sxy) =
        (s"${p}__n`", s"${p}__sx`", s"${p}__sy`", s"${p}__sxx`",
          s"${p}__syy`", s"${p}__sxy`")
      val dx = s"($n * $sxx - $sx * $sx)"
      val dy = s"($n * $syy - $sy * $sy)"
      s"""'$a', '$b', $n,
          round(CASE WHEN $n >= 2 AND $dx > 0 AND $dy > 0
                THEN ($n * $sxy - $sx * $sy) / sqrt($dx * $dy) END + 1e-9, 6)"""
    }.mkString(", ")
    one.select(expr(
      s"stack(${pairs.size}, $stacked) as (col_a, col_b, n_pairs, corr)"))
  }

  /** Pairwise Spearman rank correlation over `cols`: monotonic association,
    * robust to the outliers and non-linearity that sink [[correlationMatrix]]
    * on heavy-tailed pipeline measures (doc lengths, scores, prices). One
    * row per unordered pair, `(col_a, col_b, n_pairs, rho)`.
    *
    * Rank transform: each column's non-null values get their AVERAGE rank
    * (standard tie handling), carried as `2·rank` so every rank is an exact
    * INTEGER — `2·avgrank = 2·(count below) + (count equal) + 1` — and the
    * cross-engine rank values match bit-for-bit; Pearson on ranks is
    * invariant to the 2× scaling. Ranks are per-column over that column's
    * non-null rows; pairs then use COMPLETE cases only (with no nulls this
    * is textbook Spearman; with nulls it is the documented
    * rank-then-pairwise-delete variant — the oracle replays it exactly).
    *
    * Scale shape: per column, one hash aggregate to the DISTINCT-VALUE
    * frame, a DISTRIBUTED prefix sum over it ([[Packing.globalRunningSums]]
    * — range exchange + bounded per-slice windows, never a single-task
    * global window), and one shuffle join of the rank frame back to the
    * rows; then the same single-pass stacked pair aggregate as
    * [[correlationMatrix]]. Global ranking cannot avoid per-column
    * exchanges — this is the minimal set, and each is keyed/ranged, never
    * driver-side. */
  def spearmanMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "spearmanMatrix needs at least two columns")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    cols.foreach { c =>
      require(!c.contains("`") && !c.contains("'") && !c.contains("__"),
        s"spearmanMatrix column name '$c' may not contain backticks, " +
          "quotes, or '__' (used as the internal alias separator) — " +
          "alias the column first")
    }
    val ranked = cols.foldLeft(df.select(cols.map(col): _*)) { (acc, c) =>
      val freq = df.filter(col(c).isNotNull).groupBy(col(c))
        .agg(count(lit(1)).as("_sp_cnt"))
      val cum = Packing.globalRunningSum(
        freq, Seq(col(c)), "_sp_cnt", "_sp_cum")
      val rank2 = cum.select(
        col(c),
        (lit(2L) * col("_sp_cum") - col("_sp_cnt") + lit(1L))
          .cast("double").as(s"_sp_rk_$c"))
      acc.join(rank2, Seq(c), "left")
    }
    val ranksAsCols = ranked.select(
      cols.map(c => col(s"_sp_rk_$c").as(c)): _*)
    correlationMatrix(ranksAsCols, cols).withColumnRenamed("corr", "rho")
  }

  /** Per-group ordinary-least-squares trend of `yCol` against `xCol`:
    * `(keys…, n_points, slope, intercept)` from the closed-form sums —
    * ONE map-side-combined aggregate per group, no iteration, no join.
    * Degenerate groups (single point, or zero x-variance) get null
    * slope/intercept rather than a division blowup.
    *
    * Numeric-conditioning contract: CENTER `xCol` before calling (e.g.
    * epoch micros → days since the data's own min). The closed form
    * subtracts `(Σx)²`-scale terms; with raw epoch-micros x the
    * subtraction cancels ~16 significant digits and the result is noise —
    * with x in the hundreds it is exact to well past the 6 dp this
    * rounds to. The oracle must replay THIS formula (not its engine's
    * regr_slope, which uses a different accumulation). */
  def groupTrend(
      df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "groupTrend needs at least one key column")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    // rows missing either coordinate are excluded from ALL sums: a count
    // over raw rows while the sums null-skip would take the closed form
    // over inconsistent row sets and produce a silently wrong fit
    val agg = df
      .filter(x.isNotNull && y.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_points"),
        sum(x).as("_sx"), sum(y).as("_sy"),
        sum(x * y).as("_sxy"), sum(x * x).as("_sxx"))
    val n = col("n_points").cast("double")
    val denom = n * col("_sxx") - col("_sx") * col("_sx")
    val slope = (n * col("_sxy") - col("_sx") * col("_sy")) / denom
    agg.select(
      keyCols.map(col) ++ Seq(
        col("n_points"),
        stableRound(when(denom =!= 0.0, slope), 6).as("slope"),
        stableRound(
          when(denom =!= 0.0, (col("_sy") - slope * col("_sx")) / n), 6)
          .as("intercept")): _*)
  }

  /** Per-group z-score outliers: rows of `df` whose `valueCol` deviates
    * from their group mean by more than `zThreshold` sample standard
    * deviations. Output: all input columns + `z` (rounded 6 dp; the
    * threshold compares the ROUNDED z so borderline membership is decided
    * on identical numbers in any engine). Groups with fewer than 2 rows or
    * zero variance emit nothing. Plan: one map-side-combined aggregate to
    * a groups-sized stats frame, joined back on the group key — a
    * NULL-SAFE equi-join (same convention as
    * [[Sequence.funnelTimes]]: a null group key is a real group, and its
    * rows get z-scores like any other), AQE-sized (broadcast while the
    * stats frame fits, shuffle join beyond). */
  def zscoreOutliers(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      zThreshold: Double): DataFrame = {
    require(keyCols.nonEmpty, "zscoreOutliers needs at least one key column")
    require(zThreshold > 0, s"zThreshold must be positive, got $zThreshold")
    val v = col(valueCol).cast("double")
    // null values must not inflate _n while the sums skip them — that
    // would corrupt mu/sigma and even let a single-real-value group past
    // the degenerate gate; they also cannot be outliers themselves
    val stats = df
      .filter(v.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("_n"),
        sum(v).as("_sv"), sum(v * v).as("_svv"))
      .filter(col("_n") > 1)
      .select(
        keyCols.map(col) ++ Seq(
          (col("_sv") / col("_n")).as("_mu"),
          sqrt(
            (col("_svv") - col("_sv") * col("_sv") / col("_n")) /
              (col("_n") - 1)).as("_sigma")): _*)
      .filter(col("_sigma") > 0.0)
    val statsR = stats.select(
      keyCols.map(k => col(k).as(s"_graft_zs_$k")) ++
        Seq(col("_mu"), col("_sigma")): _*)
    df.join(statsR,
        keyCols.map(k => col(k) <=> col(s"_graft_zs_$k")).reduce(_ && _))
      .withColumn("z", stableRound((v - col("_mu")) / col("_sigma"), 6))
      .filter(abs(col("z")) > zThreshold)
      .drop(keyCols.map(k => s"_graft_zs_$k") ++ Seq("_mu", "_sigma"): _*)
  }

  /** Shared sweep core: one row per distinct score with per-threshold
    * positive/negative increments (`_pos`/`_neg`), inclusive cumulative
    * confusion counts (`tp`/`fp`) by descending threshold, and broadcast
    * class totals (`_p`/`_n`). */
  private def sweepCounts(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    // NULL labels count toward NEITHER class — the FILTER-style semantics
    // the oracles use — but their score values still contribute threshold
    // rows (a GROUP BY keeps a group whose labels are all null; dropping
    // the rows up front would lose that threshold and diverge)
    val perScore = df
      .groupBy(col(scoreCol).cast("double").as("threshold"))
      .agg(
        sum(when(col(labelCol) === true, 1L).otherwise(0L)).as("_pos"),
        sum(when(col(labelCol) === false, 1L).otherwise(0L)).as("_neg"))
      .persist()
    // class totals fold the already-collapsed per-score frame — the corpus
    // is scanned ONCE (the persist pins perScore across the two consumers;
    // the standard one-shot listener releases it right after the caller's
    // first materializing action, so sessions cannot accumulate caches)
    val totals = perScore.agg(
      sum(col("_pos")).as("_p"), sum(col("_neg")).as("_n"))
    val joined = Packing
      .globalRunningSums(
        perScore, Seq(col("threshold").desc),
        Seq("_pos" -> "tp", "_neg" -> "fp"))
      .crossJoin(broadcast(totals))
    ManagedPairs(joined, Seq(perScore)).releaseOnFirstUse()
  }

  /** Winsorized robust statistics per group: values clamped to the group's
    * `[lo, hi]` exact quantiles (the heavy-tail-resistant mean the plain
    * average is not — a feature-normalization staple). Output per group:
    * `n` (non-null values), `n_lo`/`n_hi` (clamped below/above), `w_mean`,
    * `w_sd` (sample, from explicit sums — not `stddev`, whose engine
    * algorithms differ), both 6 dp; `w_sd` NULL when `n < 2`.
    *
    * Shape: cut points are [[Quantiles.exactGroupedMulti]]'s two balanced
    * passes (never a per-group sort); the cuts frame is one row per group,
    * joined back NULL-SAFELY (the [[zscoreOutliers]] convention — a null
    * group key is a real group) and AQE-sized; the winsorized aggregate is
    * one map-side-combined pass. Rows whose value is null are excluded
    * (they have no place on the clamped scale), mirrored by the oracle —
    * and therefore a group whose values are ALL null emits no row at all
    * (it has no quantiles to clamp to); a keep/reroute pipeline keyed on
    * these stats must treat absence as its own outcome, the
    * [[Classifier.scoreNaiveBayes]] convention. */
  def winsorizedStats(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(groupCols.nonEmpty, "winsorizedStats needs at least one group column")
    require(0.0 <= lo && lo < hi && hi <= 1.0,
      s"need 0 <= lo < hi <= 1, got lo=$lo hi=$hi")
    val v = col(valueCol).cast("double")
    val cuts = Quantiles
      .exactGroupedMulti(
        df.filter(v.isNotNull), groupCols,
        Seq(valueCol -> Seq("_lo" -> lo, "_hi" -> hi)))
      .select(
        groupCols.map(k => col(k).as(s"_graft_ws_$k")) ++ Seq(
          // cuts rounded to 6 dp BEFORE clamping: boundary membership is
          // then decided against an identical 6-dp decimal on any engine,
          // instead of the last ulp of two interpolation arithmetics
          stableRound(col("_lo"), 6).as("_lo"),
          stableRound(col("_hi"), 6).as("_hi")): _*)
    val wv = least(greatest(v, col("_lo")), col("_hi"))
    df.filter(v.isNotNull)
      .join(cuts,
        groupCols.map(k => col(k) <=> col(s"_graft_ws_$k")).reduce(_ && _))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(v < col("_lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(v > col("_hi"), 1L).otherwise(0L)).as("n_hi"),
        sum(wv).as("_sw"), sum(wv * wv).as("_sww"))
      .select(
        groupCols.map(col) ++ Seq(
          col("n"), col("n_lo"), col("n_hi"),
          stableRound(col("_sw") / col("n"), 6).as("w_mean"),
          when(col("n") > 1,
            stableRound(
              sqrt(
                (col("_sww") - col("_sw") * col("_sw") / col("n")) /
                  (col("n") - 1)), 6)).as("w_sd")): _*)
  }

  /** Calibration / reliability table for a scored binary label — the
    * companion diagnostic to [[rocSweep]]: ROC ranks (is the score
    * ORDERED right?), this bins (is the score's MAGNITUDE honest?).
    * Scores are cut into `nBins` equal-width bins over the observed
    * [min, max]; per bin the empirical positive rate sits next to the
    * mean score, so a quality-classifier whose 0.9-bin is only 60%
    * positive shows up as the gap between the two columns (the ECE is a
    * weighted fold over exactly this table).
    *
    * Shape: one pass for the one-row (min, max) broadcast, one pass for
    * the binned aggregate — bin count is the GROUP key, map-side
    * combined; output ∝ nBins. No window, no sort. NULL scores cannot be
    * binned and are excluded; NULL labels count toward the bin's `n` and
    * `mean_score` but neither class (the [[rocSweep]] FILTER semantics),
    * so `pos_rate` is NULL for a bin with no labeled rows, never 0/0.
    *
    * Output: `(bin, bin_lo, bin_hi, n, mean_score, pos_rate)`, 6 dp. */
  def calibrationBins(
      df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val s = col(scoreCol).cast("double")
    val scored = df.filter(s.isNotNull)
    val bounds = scored.agg(min(s).as("_mn"), max(s).as("_mx"))
    // width computed identically on the oracle side ((mx-mn)/nBins, IEEE
    // double both engines); a degenerate single-value score range (or a
    // single row) collapses to bin 0 instead of dividing by zero
    val width = (col("_mx") - col("_mn")) / lit(nBins.toDouble)
    val bin = when(col("_mx") === col("_mn"), 0)
      .otherwise(least(
        floor((s - col("_mn")) / width), lit(nBins - 1)))
      .cast("int")
    scored
      .crossJoin(broadcast(bounds))
      .groupBy(bin.as("bin"), col("_mn"), col("_mx"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(labelCol) === true, 1L).otherwise(0L)).as("_pos"),
        sum(when(col(labelCol) === false, 1L).otherwise(0L)).as("_neg"),
        avg(s).as("_ms"))
      .select(
        col("bin"),
        stableRound(col("_mn") + col("bin") * width, 6).as("bin_lo"),
        stableRound(col("_mn") + (col("bin") + 1) * width, 6).as("bin_hi"),
        col("n"),
        stableRound(col("_ms"), 6).as("mean_score"),
        when(col("_pos") + col("_neg") > 0,
          stableRound(
            col("_pos").cast("double") / (col("_pos") + col("_neg")), 6))
          .as("pos_rate"))
  }

  /** Mutual information between two categorical columns — the dependence
    * diagnostic [[correlationMatrix]] cannot give for non-numeric pairs
    * (label leakage checks: "does `source` already determine `label`?"):
    * `MI = Σ_{x,y} p(x,y) · ln( p(x,y) / (p(x) p(y)) )` in nats, over the
    * observed joint distribution. NULL is a category like any other (both
    * engines' GROUP BY semantics). Output: one row,
    * `(n, n_pairs, mi)` — row count, distinct observed (x, y) pairs, MI
    * rounded 6 dp (0 for a single-category column; MI ≥ 0 up to float
    * noise).
    *
    * Plan: THE one corpus pass is the joint (x, y) count aggregate
    * (map-side combined, shuffle ∝ distinct pairs). Marginals and the total
    * re-aggregate the PAIR table, not the corpus; both join back onto it
    * (pair-table-sized, broadcast the one-row total) and the MI sum is a
    * final one-row fold. */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    val joint = df.groupBy(col(colA).as("_x"), col(colB).as("_y"))
      .agg(count(lit(1)).as("_nxy"))
    // null-safe joins: NULL is a category, and a plain equi-join would
    // silently drop its group (the Sequence.funnelTimes discipline)
    val margA = joint.groupBy("_x").agg(sum("_nxy").as("_nx"))
      .select(col("_x").as("_xm"), col("_nx"))
    val margB = joint.groupBy("_y").agg(sum("_nxy").as("_ny"))
      .select(col("_y").as("_ym"), col("_ny"))
    val total = broadcast(joint.agg(sum("_nxy").as("_n")))
    joint
      .join(margA, col("_x") <=> col("_xm"))
      .join(margB, col("_y") <=> col("_ym"))
      .crossJoin(total)
      .select(
        col("_n"), col("_nxy"),
        (col("_nxy").cast("double") / col("_n") *
          log(col("_nxy").cast("double") * col("_n") /
            (col("_nx").cast("double") * col("_ny")))).as("_term"))
      .agg(
        first(col("_n")).as("n"),
        count(lit(1)).as("n_pairs"),
        stableRound(sum(col("_term")), 6).as("mi"))
  }

  /** Join-key skew report — the diagnostic to run BEFORE a big keyed join
    * or aggregation ships: the `k` heaviest key values with their row share,
    * so the decision between plain shuffle, [[SkewJoin]] salting, and a
    * broadcast is made from measurement, not incident reports. Output:
    * `(key, cnt, share)` for the top `k` (key stringified with `§`-joined
    * parts for composite keys; ties → lexicographically first), share 6 dp.
    *
    * Plan: one keyed count (map-side combined — the hot key is one
    * combiner-absorbed group here even though it would be a hot PARTITION
    * in the join under diagnosis), a one-row broadcast total, and
    * `TakeOrderedAndProject` for the top-k — no global sort, no global
    * window, nothing driver-sized beyond k rows. */
  def keySkew(df: DataFrame, keyCols: Seq[String], k: Int): DataFrame = {
    require(keyCols.nonEmpty, "keySkew needs at least one key column")
    require(k >= 1, s"k must be >= 1, got $k")
    // separator discipline: a literal '§' inside a key part doubles, so
    // distinct composites can never merge (('x§y','z') vs ('x','y§z'));
    // nulls become the single-§ token '§null§', which no escaped part can
    // produce — nulls stay visible and unambiguous (concat_ws would
    // silently drop them, merging NULL with empty string)
    val keyStr = concat_ws("§",
      keyCols.map(c => coalesce(
        regexp_replace(col(c).cast("string"), "§", "§§"), lit("§null§"))): _*)
    val counts = df.groupBy(keyStr.as("key")).agg(count(lit(1)).as("cnt"))
    val total = broadcast(counts.agg(sum("cnt").as("_total")))
    counts.crossJoin(total)
      .select(col("key"), col("cnt"),
        stableRound(col("cnt").cast("double") / col("_total"), 6).as("share"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(k)
  }

  /** Best binary split of a score against a boolean label — the decision-
    * stump / information-gain cut a pipeline uses to TURN a continuous
    * quality score into a keep/drop rule with one defensible number
    * attached (rather than eyeballing the [[rocSweep]] curve): over every
    * candidate threshold `t` (rule: positive-predicted when `score ≥ t`),
    * the information gain of the two-way split, maximized. Output: ONE row
    * `(threshold, gain, n_left, n_right)` — gain in nats rounded 6 dp
    * BEFORE the argmax (so tie-breaking at 6 dp → lowest threshold is
    * engine-portable), `n_right` = rows at or above the cut.
    * A corpus with NO labeled rows (every label null) has no split to rank
    * and returns an EMPTY frame — mirror with `WHERE p + n > 0` oracle-side.
    *
    * Plan: the same collapsed frame as [[rocSweep]] (one corpus aggregate
    * to a row per distinct score + the distributed prefix sum), a per-row
    * entropy arithmetic, then `TakeOrdered(1)` — nothing beyond the sweep's
    * own cost. */
  def bestSplit(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    def h(p: Column): Column =
      when(p <= 0.0 || p >= 1.0, 0.0)
        .otherwise(-(p * log(p) + (lit(1.0) - p) * log(lit(1.0) - p)))
    sweepCounts(df, scoreCol, labelCol)
      .filter(col("_p") + col("_n") > 0)
      .select(
        col("threshold"),
        (col("_p") + col("_n")).as("_all"),
        (col("tp") + col("fp")).as("n_right"),
        (col("_p") + col("_n") - col("tp") - col("fp")).as("n_left"),
        col("tp"), col("_p"))
      .select(
        col("threshold"), col("n_left"), col("n_right"),
        stableRound(
          h(col("_p").cast("double") / col("_all")) -
            (col("n_right").cast("double") / col("_all")) *
              h(col("tp").cast("double") / col("n_right")) -
            when(col("n_left") > 0,
              (col("n_left").cast("double") / col("_all")) *
                h((col("_p") - col("tp")).cast("double") / col("n_left")))
              .otherwise(0.0), 6).as("gain"))
      .orderBy(col("gain").desc, col("threshold").asc)
      .limit(1)
      .select(col("threshold"), col("gain"), col("n_left"), col("n_right"))
  }

  /** Rolling (trailing-window) z-score anomaly detection — the time-aware
    * form of [[zscoreOutliers]] (that scores against the group's ALL-TIME
    * stats; this scores each point against its own trailing `windowSize`
    * in event time, so a regime change doesn't permanently poison the
    * baseline). Output: the anomalous rows only —
    * `(keyCols…, ts, value, n_window, z)` where `|z| ≥ zThreshold` and the
    * trailing window (INCLUDING the current row) holds ≥ `minCount` points;
    * z rounded 6 dp from explicit window sums
    * (`var = (Σv² − (Σv)²/n)/n` — the engine-portable formula, not the
    * engine's own stddev accumulation).
    *
    * Plan: one keyed value-RANGE window (q31's frame kind) — per-key sort +
    * two-pointer frames, no per-row rescan, no unpartitioned window. A
    * pathologically hot key serializes its partition like any keyed window;
    * [[Quantiles]]-style (key, time-bucket) splitting applies if one key
    * dominates. */
  def rollingZscore(
      df: DataFrame, keyCols: Seq[String], tsCol: String, valueCol: String,
      windowSize: Long, zThreshold: Double, minCount: Int = 5): DataFrame = {
    require(keyCols.nonEmpty, "rollingZscore needs at least one key column")
    require(windowSize > 0 && zThreshold > 0 && minCount >= 2)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).cast("long"))
      .rangeBetween(-windowSize, 0)
    val v = col(valueCol).cast("double")
    val stats = df
      .where(v.isNotNull && col(tsCol).isNotNull)
      .select(keyCols.map(col) ++ Seq(
        col(tsCol).cast("long").as(tsCol), v.as(valueCol),
        count(lit(1)).over(w).as("_n"),
        sum(v).over(w).as("_s"),
        sum(v * v).over(w).as("_ss")): _*)
    stats
      .withColumn("_var",
        (col("_ss") - col("_s") * col("_s") / col("_n")) / col("_n"))
      .withColumn("z",
        when(col("_n") >= minCount && col("_var") > 0.0,
          stableRound(
            (col(valueCol) - col("_s") / col("_n")) / sqrt(col("_var")), 6)))
      .where(abs(col("z")) >= zThreshold)
      .select(keyCols.map(col) ++ Seq(
        col(tsCol), col(valueCol), col("_n").as("n_window"), col("z")): _*)
  }

  /** Population stability index between two score distributions — the
    * drift monitor a pipeline runs between yesterday's and today's quality/
    * classifier scores (industry convention: PSI < 0.1 stable, > 0.25
    * shifted): equal-width bins from the BEFORE snapshot's [min, max]
    * (out-of-range AFTER values clamp into the edge bins), proportions
    * floored at `eps` so an empty bin contributes a large-but-finite term,
    * `PSI = Σ (p_a − p_b) · ln(p_a / p_b)`. Output: one row,
    * `(n_before, n_after, psi)` (6 dp; null when either side is empty or
    * the BEFORE range is degenerate).
    *
    * Two corpus aggregates (one per snapshot, keyed by bin, map-side
    * combined) + a bins-sized join and fold — the same broadcast-bounds
    * shape as [[calibrationBins]]. */
  def psi(
      before: DataFrame, after: DataFrame, scoreCol: String,
      nBins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(nBins >= 2, s"psi: nBins must be >= 2, got $nBins")
    val s = col(scoreCol).cast("double")
    val bounds = broadcast(before.where(s.isNotNull)
      .agg(min(s).as("_mn"), max(s).as("_mx")))
    def binned(df: DataFrame, cnt: String): DataFrame = {
      val width = (col("_mx") - col("_mn")) / lit(nBins.toDouble)
      df.where(s.isNotNull).crossJoin(bounds)
        .where(col("_mx") > col("_mn"))
        .groupBy(
          least(greatest(floor((s - col("_mn")) / width), lit(0)),
            lit(nBins - 1)).cast("int").as("bin"))
        .agg(count(lit(1)).as(cnt))
    }
    val joined = binned(before, "_nb")
      .join(binned(after, "_na"), Seq("bin"), "full_outer")
      .select(
        coalesce(col("_nb"), lit(0L)).as("_cb"),
        coalesce(col("_na"), lit(0L)).as("_ca"))
    val totals = broadcast(
      joined.agg(sum("_cb").as("_tb"), sum("_ca").as("_ta")))
    val psiRow = joined.crossJoin(totals)
      .select(
        col("_tb"), col("_ta"),
        // try_divide: an empty snapshot (total 0) must flow to the guarded
        // null psi, not an ANSI divide-by-zero
        greatest(try_divide(col("_cb").cast("double"),
          col("_tb").cast("double")), lit(eps)).as("_pb"),
        greatest(try_divide(col("_ca").cast("double"),
          col("_ta").cast("double")), lit(eps)).as("_pa"))
      .agg(
        when(first(col("_tb")) > 0 && first(col("_ta")) > 0,
          stableRound(
            sum((col("_pa") - col("_pb")) * log(col("_pa") / col("_pb"))), 6))
          .as("psi"))
    // truthful counts come from the SNAPSHOTS, not the bin table: with an
    // empty/degenerate BEFORE, binned() drops every row of BOTH sides and
    // the join-derived totals would misreport a populated AFTER as 0
    val nB = broadcast(before.where(s.isNotNull)
      .agg(count(lit(1)).as("n_before")))
    val nA = broadcast(after.where(s.isNotNull)
      .agg(count(lit(1)).as("n_after")))
    nB.crossJoin(nA).crossJoin(broadcast(psiRow))
  }

  /** Leakage-safe target encoding (out-of-fold category → target-mean): the
    * feature-engineering step that replaces a high-cardinality category with
    * the mean target of OTHER folds' rows in that category, so a row never
    * sees its own target (the leakage a naive full-table target mean
    * injects). Folds are md5-deterministic ([[Dedup.hash56]] of `idCol` mod
    * `nFolds` — stable across runs/engines, like t06's split). Output: the
    * encoding TABLE `(category, fold, n_oof, enc)` — `enc = (sum_all −
    * sum_fold)/(n_all − n_fold)` rounded 6 dp, null when the category has
    * no out-of-fold rows (single-fold category); join it back on
    * (category, fold) to encode.
    *
    * Plan: ONE corpus aggregate to the (category, fold) frame (shuffle ∝
    * categories × folds, map-side combined); category totals re-aggregate
    * THAT frame; the encoding is a broadcast-joined arithmetic row — the
    * corpus is touched once, the output is model-sized. */
  def targetEncode(
      df: DataFrame, idCol: String, categoryCol: String, targetCol: String,
      nFolds: Int): DataFrame = {
    require(nFolds >= 2, s"targetEncode: nFolds must be >= 2, got $nFolds")
    val perFold = df
      .where(col(targetCol).isNotNull)
      .groupBy(
        col(categoryCol).as("category"),
        pmod(Dedup.hash56(col(idCol).cast("string")), lit(nFolds.toLong))
          .as("fold"))
      .agg(
        count(lit(1)).as("_nf"),
        sum(col(targetCol).cast("double")).as("_sf"))
    val perCat = perFold.groupBy("category")
      .agg(sum("_nf").as("_na"), sum("_sf").as("_sa"))
      .select(col("category").as("_catA"), col("_na"), col("_sa"))
    perFold
      .join(broadcast(perCat), col("category") <=> col("_catA"))
      .select(
        col("category"), col("fold"),
        (col("_na") - col("_nf")).as("n_oof"),
        when(col("_na") - col("_nf") > 0,
          stableRound(
            (col("_sa") - col("_sf")) / (col("_na") - col("_nf")), 6))
          .as("enc"))
  }

  /** Cohen's kappa between two categorical columns — chance-corrected
    * agreement, the standard way to read "does the cheap classifier agree
    * with the gold label BEYOND what the class skew alone would produce?"
    * (raw accuracy flatters any predictor on a 95%-one-class corpus;
    * kappa doesn't): `κ = (p_o − p_e) / (1 − p_e)` with `p_o` the observed
    * agreement rate and `p_e = Σ_c p_A(c) · p_B(c)` the chance rate from
    * the marginals. Output: one row `(n, po, pe, kappa)` (6 dp; kappa null
    * when `p_e = 1` — a constant pair has no chance-corrected signal).
    * NULL is a category like any other (the [[mutualInformation]]
    * convention, same machinery).
    *
    * Plan: THE one corpus pass is the joint (a, b) count aggregate;
    * marginals, totals, and both rates re-aggregate the pair table with
    * null-safe join-back. */
  def cohensKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val joint = df.groupBy(col(colA).as("_x"), col(colB).as("_y"))
      .agg(count(lit(1)).as("_nxy"))
    val margA = joint.groupBy("_x").agg(sum("_nxy").as("_nx"))
      .select(col("_x").as("_xm"), col("_nx"))
    val margB = joint.groupBy("_y").agg(sum("_nxy").as("_ny"))
      .select(col("_y").as("_ym"), col("_ny"))
    val total = broadcast(joint.agg(sum("_nxy").as("_n")))
    val po = broadcast(joint
      .crossJoin(total)
      .agg((coalesce(sum(when(col("_x") <=> col("_y"), col("_nxy"))), lit(0L))
        .cast("double") / first(col("_n"))).as("_po")))
    val pe = broadcast(margA
      .join(margB, col("_xm") <=> col("_ym"))
      .crossJoin(total)
      .agg(coalesce(
        sum(col("_nx").cast("double") * col("_ny") /
          (col("_n").cast("double") * col("_n"))), lit(0.0)).as("_pe")))
    total.crossJoin(po).crossJoin(pe)
      .select(
        col("_n").as("n"),
        stableRound(col("_po"), 6).as("po"),
        stableRound(col("_pe"), 6).as("pe"),
        when(col("_pe") < 1.0,
          stableRound((col("_po") - col("_pe")) / (lit(1.0) - col("_pe")), 6))
          .as("kappa"))
  }

  /** K-anonymity audit over quasi-identifier columns — the governance gate a
    * pipeline runs before releasing data carrying indirect identifiers: a
    * row is re-identifiable when its quasi-identifier combination is shared
    * by fewer than `k` rows. Output: one row,
    * `(k, n_rows, n_groups, n_risky_groups, n_risky_rows, min_group_size)`
    * — `n_risky_rows = 0` ⇔ the table IS k-anonymous. NULL quasi values
    * group as values (GROUP BY semantics on both engines).
    *
    * Plan: one keyed count (map-side combined, shuffle ∝ distinct
    * quasi-combinations) then a one-row fold over the GROUP table — the
    * corpus is scanned once, and a billion-row group is one combiner-
    * absorbed key, never a hot partition. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity: no quasi-identifier columns")
    require(k >= 2, s"kAnonymity: k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .agg(
        coalesce(sum(col("_c")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("_c") < k, 1L).otherwise(0L)).as("n_risky_groups"),
        coalesce(sum(when(col("_c") < k, col("_c")).otherwise(0L)), lit(0L))
          .as("n_risky_rows"),
        min(col("_c")).as("min_group_size"))
      .select(
        lit(k).as("k"), col("n_rows"), col("n_groups"),
        coalesce(col("n_risky_groups"), lit(0L)).as("n_risky_groups"),
        col("n_risky_rows"), col("min_group_size"))
  }

  /** Q83 — l-diversity audit, the governance pair of [[kAnonymity]]:
    * k-anonymity says "each quasi-identifier class hides ≥ k people";
    * l-diversity adds the attack it misses — a class of 500 people who ALL
    * share one sensitive value discloses that value regardless of k. Per
    * class, diversity = number of distinct sensitive values; classes below
    * `l` are risky.
    *
    * NULL-CATEGORY CONTRACT (the q44/q45 discipline): a null sensitive
    * value IS a category — it falls out of the two-stage aggregate
    * naturally (groupBy keeps the null group), so "unknown" counts toward
    * diversity rather than silently vanishing the way COUNT(DISTINCT)
    * would drop it; null quasi-identifier values likewise form their own
    * class. Output is the q44 one-row fold:
    * `(l, n_rows, n_groups, n_risky_groups, n_risky_rows, min_diversity)`.
    *
    * Shape: ONE map-side-combined (quasi, sensitive) aggregate — shuffle ∝
    * distinct pairs, never rows — then a class-sized aggregate and a
    * one-row fold. */
  def lDiversity(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity: no quasi-identifier columns")
    require(l >= 2, s"lDiversity: l must be >= 2, got $l")
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_d"), sum(col("_c")).as("_rows"))
      .agg(
        coalesce(sum(col("_rows")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("_d") < l, 1L).otherwise(0L)).as("n_risky_groups"),
        coalesce(sum(when(col("_d") < l, col("_rows")).otherwise(0L)), lit(0L))
          .as("n_risky_rows"),
        min(col("_d")).as("min_diversity"))
      .select(
        lit(l).as("l"), col("n_rows"), col("n_groups"),
        coalesce(col("n_risky_groups"), lit(0L)).as("n_risky_groups"),
        col("n_risky_rows"), col("min_diversity"))
  }

  /** Kolmogorov–Smirnov statistic of score separation — `max |TPR − FPR|`
    * over the [[rocSweep]] operating points, with the threshold attaining
    * it: the single-number "how separable are the classes" readout (and
    * the classical cut-point choice) printed next to c04's full curve and
    * q51's information-gain stump. Output: one row `(ks, at_threshold)`;
    * empty when either class is missing (no defined curve). KS is
    * 6-dp-rounded BEFORE the argmax (the q51 convention) so tie-breaks
    * (lowest threshold wins) are engine-portable.
    *
    * Shape: everything rides [[sweepCounts]]'s one corpus pass; the argmax
    * is TakeOrdered(1) over the distinct-score frame. */
  def ksStatistic(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    sweepCounts(df, scoreCol, labelCol)
      .filter(col("_p") > 0 && col("_n") > 0)
      .select(
        col("threshold"),
        stableRound(abs(
          col("tp").cast("double") / col("_p") -
          col("fp").cast("double") / col("_n")), 6).as("ks"))
      .orderBy(col("ks").desc, col("threshold").asc)
      .limit(1)
      .select(col("ks"), col("threshold").as("at_threshold"))

  /** Chi-squared test of independence between two categorical columns —
    * the significance-bearing companion to [[mutualInformation]] (MI says
    * how much dependence; chi² + dof says whether it beats chance):
    * `χ² = Σ_cells (obs − exp)² / exp` over the FULL r×c grid (zero-
    * observed cells contribute their expectation — skipping them, as a
    * join over observed pairs would, understates the statistic), `dof =
    * (r−1)(c−1)`, plus Cramér's V `√(χ² / (n·min(r−1, c−1)))` as the
    * [0,1] effect size. NULL is a category like any other (the
    * [[mutualInformation]] convention). Output: one row
    * `(n, r, c, dof, chi2, cramers_v)` (6 dp; V null when dof = 0 — a
    * constant column has no independence question).
    *
    * Plan: THE one corpus pass is the joint count; the r×c grid is a
    * cross join of the two BROADCAST marginal frames (category-sized)
    * left-joined back to the joint — everything after the first
    * aggregate is distribution-sized. */
  def chiSquared(df: DataFrame, colA: String, colB: String): DataFrame = {
    val joint = df.groupBy(col(colA).as("_x"), col(colB).as("_y"))
      .agg(count(lit(1)).as("_nxy"))
    val margA = joint.groupBy("_x").agg(sum("_nxy").as("_nx"))
    val margB = joint.groupBy("_y").agg(sum("_nxy").as("_ny"))
    val total = broadcast(joint.agg(sum("_nxy").as("_n")))
    val jo = joint.select(
      col("_x").as("_jx"), col("_y").as("_jy"), col("_nxy"))
    val grid = broadcast(margA).crossJoin(broadcast(margB)).crossJoin(total)
      .join(jo,
        col("_x") <=> col("_jx") && col("_y") <=> col("_jy"), "left")
      .select(
        col("_n"),
        (col("_nx").cast("double") * col("_ny") / col("_n")).as("_e"),
        coalesce(col("_nxy"), lit(0L)).cast("double").as("_o"))
    val stats = grid.agg(
      first(col("_n")).as("_n"),
      sum(pow(col("_o") - col("_e"), 2) / col("_e")).as("_chi2"))
    val rc = broadcast(margA.agg(count(lit(1)).as("_r")))
      .crossJoin(broadcast(margB.agg(count(lit(1)).as("_c"))))
    stats.crossJoin(rc)
      .select(
        coalesce(col("_n"), lit(0L)).as("n"),
        col("_r").as("r"), col("_c").as("c"),
        // greatest(·, 0): empty input (r = c = 0) must report dof 0, not
        // (−1)·(−1) = 1
        (greatest(col("_r") - 1, lit(0L)) * greatest(col("_c") - 1, lit(0L)))
          .as("dof"),
        stableRound(col("_chi2"), 6).as("chi2"),
        when(col("_r") > 1 && col("_c") > 1 && col("_n") > 0,
          stableRound(sqrt(col("_chi2") /
            (col("_n") * least(col("_r") - 1, col("_c") - 1))), 6))
          .as("cramers_v"))
  }

  /** Jensen–Shannon divergence between two CATEGORICAL distributions — the
    * symmetric, bounded ([0, 1] in bits) complement to [[psi]]'s binned
    * numeric drift: PSI needs an epsilon floor and explodes on support
    * mismatch, JSD handles zero-probability categories exactly
    * (`0·log 0 = 0`), which is what you want when comparing e.g. the
    * language mix of two sources where one is missing a language entirely.
    * `JSD = ½ KL(p ‖ m) + ½ KL(q ‖ m)`, `m = (p + q)/2`, log base 2.
    * NULL is a category like any other (the [[cohensKappa]] convention).
    * Output: one row `(n_a, n_b, n_categories, jsd_bits)` (6 dp; null when
    * either side is empty — divergence from nothing is undefined).
    *
    * Plan: one keyed count aggregate PER SIDE (map-side combined, shuffle ∝
    * distinct categories), a category-sized full-outer join, broadcast
    * totals, one-row fold — the corpora are each scanned once and
    * everything downstream is distribution-sized. */
  def jsDivergence(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    def counts(df: DataFrame, key: String, cnt: String): DataFrame =
      df.groupBy(col(catCol).as(key)).agg(count(lit(1)).as(cnt))
    // null-safe join key: NULL is a category, so it must match itself
    // (the [[cohensKappa]] marginal-join convention)
    val joined = counts(a, "_cata", "_ca")
      .join(counts(b, "_catb", "_cb"), col("_cata") <=> col("_catb"),
        "full_outer")
      .select(
        coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
    val totals = broadcast(joined.agg(
      sum("_ca").as("_ta"), sum("_cb").as("_tb"),
      count(lit(1)).as("_ncat")))
    // try_divide: an empty side (total 0) must flow to the guarded null
    // jsd, not an ANSI divide-by-zero
    joined.crossJoin(totals)
      .select(
        col("_ta"), col("_tb"), col("_ncat"),
        try_divide(col("_ca").cast("double"), col("_ta").cast("double"))
          .as("_p"),
        try_divide(col("_cb").cast("double"), col("_tb").cast("double"))
          .as("_q"))
      .select(col("_ta"), col("_tb"), col("_ncat"),
        ((col("_p") + col("_q")) / lit(2.0)).as("_m"), col("_p"), col("_q"))
      .agg(
        coalesce(first(col("_ta")), lit(0L)).as("n_a"),
        coalesce(first(col("_tb")), lit(0L)).as("n_b"),
        coalesce(first(col("_ncat")), lit(0L)).as("n_categories"),
        when(first(col("_ta")) > 0 && first(col("_tb")) > 0,
          stableRound(
            sum(
              when(col("_p") > 0, col("_p") * log2(col("_p") / col("_m")))
                .otherwise(0.0) * 0.5 +
              when(col("_q") > 0, col("_q") * log2(col("_q") / col("_m")))
                .otherwise(0.0) * 0.5), 6))
          .as("jsd_bits"))
  }

  /** CUSUM change-point detection per key — the offline "WHEN did this
    * metric shift?" companion to [[rollingZscore]]'s online "is this point
    * anomalous?": bucket the series (integer-DIV time buckets), take each
    * bucket's 6dp-rounded mean, and report the bucket maximizing the
    * absolute cumulative deviation `|S_t| = |Σ_{u ≤ t} (x_u − x̄)|` — the
    * classic CUSUM estimator (Page 1954; Taylor's change-point variant):
    * a level shift at time τ makes S_t a tent peaking at τ, while white
    * noise random-walks near 0. Output: one row per key —
    * `(keys…, n_buckets, cp_bucket, cusum, cusum_abs)`, signed `cusum` > 0
    * meaning the series ran ABOVE its mean before the shift (a drop), ties
    * to the EARLIEST bucket.
    *
    * Shape: one corpus pass to the (key, bucket) mean frame (map-side
    * combined; everything after is bucket-grid-sized), a per-key mean
    * join-back, one KEYED cumulative window over the grid, and a struct-max
    * argmax fold. Stage-boundary 6dp rounding on bucket means and S_t makes
    * the argmax engine-replayable. */
  def cusumChangepoint(
      df: DataFrame, keyCols: Seq[String], tsCol: String, valueCol: String,
      bucketUs: Long): DataFrame = {
    require(keyCols.nonEmpty, "cusumChangepoint needs at least one key column")
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val us = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => col(tsCol)
      case _ => unix_micros(col(tsCol).cast("timestamp"))
    }
    val keys = keyCols.map(col)
    val v = col(valueCol).cast("double")
    val buckets = df.where(v.isNotNull && col(tsCol).isNotNull)
      .withColumn("_cu_us", us)
      .withColumn("_cu_b", expr(s"_cu_us div ${bucketUs}L"))
      .groupBy(keys :+ col("_cu_b"): _*)
      .agg(stableRound(avg(v), 6).as("_cu_x"))
    val means = buckets.groupBy(keys: _*)
      .agg(avg(col("_cu_x")).as("_cu_xbar"),
        count(lit(1)).as("n_buckets"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("_cu_b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val s = buckets.join(means, keyCols)
      .withColumn("_cu_s",
        stableRound(sum(col("_cu_x") - col("_cu_xbar")).over(w), 6))
      .withColumn("_cu_a", stableRound(abs(col("_cu_s")), 6))
    s.groupBy(keys :+ col("n_buckets"): _*)
      .agg(max(struct(col("_cu_a"), (-col("_cu_b")).as("_cu_nb"),
        col("_cu_s"))).as("_m"))
      .select(
        keys ++ Seq(
          col("n_buckets"),
          (-col("_m._cu_nb")).as("cp_bucket"),
          col("_m._cu_s").as("cusum"),
          col("_m._cu_a").as("cusum_abs")): _*)
  }

  /** Per-group Gini concentration — the inequality/governance readout
    * ("is one domain dominating this corpus slice?") next to q52's key
    * skew and q54's source caps: 0 = every unit contributes equally,
    * →1 = one unit owns everything. Computed from the rank form over
    * units sorted by contribution ascending,
    * `G = (2·Σ rᵢxᵢ − (n+1)·Σx) / (n·Σx)` — tie order is irrelevant
    * (equal x across a tied block contribute `x·Σr` for any permutation),
    * so `row_number` is deterministic here without a tie-break column.
    * Output: `(keys…, n_units, total, gini)`, total/gini 6dp; null gini
    * for an all-zero group or any negative contribution (Gini is
    * undefined below zero — a negative "contribution" means the caller
    * aggregated the wrong thing).
    *
    * INPUT CONTRACT (the scale story): `df` is a UNIT-contribution frame —
    * one row per (group, unit), i.e. the OUTPUT of a corpus aggregate
    * (docs per domain, tokens per source, spend per customer), which is
    * what bounds the keyed sort window: units per group are operationally
    * bounded (domains, feeds, accounts), never corpus-row-sized. Feeding
    * raw corpus rows through this window would be the unpartitioned-sort
    * mistake the rest of this file avoids — aggregate first. */
  def giniConcentration(
      df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "giniConcentration needs at least one key column")
    val v = col(valueCol).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(v.asc)
    df.where(v.isNotNull)
      .withColumn("_gc_r", row_number().over(w).cast("double"))
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_units"),
        sum(v).as("_t"),
        sum(col("_gc_r") * v).as("_s"),
        min(v).as("_min"))
      .select(
        keyCols.map(col) ++ Seq(
          col("n_units"),
          stableRound(col("_t"), 6).as("total"),
          stableRound(
            when(col("_min") >= 0.0 && col("_t") > 0.0,
              (lit(2.0) * col("_s") - (col("n_units") + 1) * col("_t")) /
                (col("n_units") * col("_t"))), 6).as("gini")): _*)
  }

  /** Cofactor expansion of an n×n matrix of Columns along the first row —
    * generates the closed-form determinant EXPRESSION (whole-stage-codegen
    * scalar math, no driver solve), used by [[linearFit]]'s Cramer solve.
    * Factorial term count caps practical n at 4 (= 3 features +
    * intercept), which [[linearFit]] enforces. */
  private def detExpr(m: Vector[Vector[Column]]): Column =
    if (m.size == 1) m(0)(0)
    else m.head.indices.map { j =>
      val minor = m.tail.map(row => row.patch(j, Nil, 1))
      val term = m(0)(j) * detExpr(minor)
      if (j % 2 == 0) term else -term
    }.reduce(_ + _)

  /** Per-group MULTI-feature least squares — [[groupTrend]] generalized
    * from one regressor to up to three (plus the intercept), with an
    * optional ridge penalty and R²: the "which features explain this
    * metric, per segment?" profiling question answered in ONE
    * map-side-combined corpus pass. Output: `(keys…, n_points, intercept,
    * beta_<x> per feature, r2)`, fit columns 6dp-rounded; groups that
    * cannot support the fit (fewer rows than coefficients, or a singular
    * normal matrix) emit null coefficients rather than a division blowup.
    *
    * Method: the normal equations `A β = b` with
    * `A = Σ [1,x][1,x]ᵀ (+ λ on feature diagonals)`, `b = Σ y·[1,x]`,
    * solved IN THE PLAN by Cramer's rule over generated cofactor
    * expansions ([[detExpr]]) — every group's solve is scalar codegen
    * math on its one aggregate row; nothing is collected (contrast
    * [[Pca]], which collects the ONE global Gram for a driver eigensolve —
    * per-group frames can't afford that at 100 TB group counts, and the
    * ≤4×4 closed form doesn't need it). `R² = 1 − SSE/SST` comes from the
    * same sums: `SSE = Σy² − 2βᵀb₀ + βᵀA₀β` with the UNRIDGED moments, so
    * it is the true residual even when λ > 0.
    *
    * Numeric-conditioning contract (same as [[groupTrend]]): CENTER/scale
    * features to modest magnitudes before calling — the closed form
    * cancels `(Σx)²`-scale terms — and do not pass collinear features
    * (an analytically singular A is FP-tiny, not exactly zero, and
    * Cramer amplifies it; the null gate catches exact zeros and
    * undersized groups only). */
  def linearFit(
      df: DataFrame, keyCols: Seq[String], xCols: Seq[String], yCol: String,
      ridge: Double = 0.0): DataFrame = {
    require(keyCols.nonEmpty, "linearFit needs at least one key column")
    require(xCols.nonEmpty && xCols.size <= 3,
      s"linearFit solves 1..3 features closed-form (Cramer), got ${xCols.size}")
    require(ridge >= 0.0, s"ridge must be non-negative, got $ridge")
    val d = xCols.size
    val xs = xCols.map(c => col(c).cast("double"))
    val y = col(yCol).cast("double")
    // rows missing ANY coordinate leave every sum (a count over raw rows
    // while the sums null-skip would mix inconsistent row sets)
    val complete = xs.foldLeft(y.isNotNull)((p, x) => p && x.isNotNull)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("_n"), sum(y).as("_sy"), sum(y * y).as("_syy")) ++
        xs.indices.map(i => sum(xs(i)).as(s"_s$i")) ++
        xs.indices.map(i => sum(xs(i) * y).as(s"_sy$i")) ++
        (for { i <- xs.indices; j <- i until d }
          yield sum(xs(i) * xs(j)).as(s"_s${i}_$j"))
    val g = df.filter(complete)
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val n = col("_n").cast("double")
    // moment matrix over [1, x…]: index 0 = intercept, 1..d = features
    def a0(i: Int, j: Int): Column = (i, j) match {
      case (0, 0) => n
      case (0, k) => col(s"_s${k - 1}")
      case (k, 0) => col(s"_s${k - 1}")
      case (i2, j2) =>
        val (lo, hi) = (math.min(i2, j2) - 1, math.max(i2, j2) - 1)
        col(s"_s${lo}_$hi")
    }
    def aR(i: Int, j: Int): Column =
      if (i == j && i > 0) a0(i, j) + lit(ridge) else a0(i, j)
    def b(i: Int): Column = if (i == 0) col("_sy") else col(s"_sy${i - 1}")
    val full = Vector.tabulate(d + 1, d + 1)(aR)
    val detA = detExpr(full)
    val betas = (0 to d).map { i =>
      detExpr(full.map(_.toVector).zipWithIndex.map { case (row, r) =>
        row.updated(i, b(r))
      }) / detA
    }
    val fit = betas.indices.foldLeft(g) { (acc, i) =>
      acc.withColumn(s"_b$i",
        when(detA =!= 0.0 && col("_n") > lit(d), betas(i)))
    }
    val bc = (0 to d).map(i => col(s"_b$i"))
    val sse = col("_syy") -
      lit(2.0) * (0 to d).map(i => bc(i) * b(i)).reduce(_ + _) +
      (for { i <- 0 to d; j <- 0 to d } yield bc(i) * bc(j) * a0(i, j))
        .reduce(_ + _)
    val sst = col("_syy") - col("_sy") * col("_sy") / n
    fit.select(
      keyCols.map(col) ++ Seq(col("_n").as("n_points"),
        stableRound(bc(0), 6).as("intercept")) ++
        xCols.zipWithIndex.map { case (c, i) =>
          stableRound(bc(i + 1), 6).as(s"beta_$c")
        } ++
        Seq(stableRound(
          when(bc(0).isNotNull && sst =!= 0.0, lit(1.0) - sse / sst), 6)
          .as("r2")): _*)
  }

  /** Per-key SEASONAL profile: day-of-week × hour-of-day buckets with
    * exact integer moment registers and residual-outlier counts — the
    * time-series readout between q49's rolling z-score (trend-relative)
    * and q69's CUSUM (single change-point): ingest monitoring needs "is
    * this deviation just Saturday?" before it pages anyone.
    *
    * Exactness discipline: values fold as CENTS (`round(v·100)` — exact
    * BIGINT sums, order-independent), and the outlier branch is the
    * all-integer form `(n·v − S)² > k²·(n·Q − S²)` (⇔ |v − mean| > k·σ
    * scaled by n²), so no cross-row FP sum ever feeds a branch and a
    * DuckDB oracle replays every flag bit-for-bit. Only the REPORTED mean
    * and sd touch doubles, 6 dp at the boundary. The branch products are
    * widened to decimal(38,0) before multiplying (the SQUARED terms, not
    * the raw n·v product, are what bind — see [[seasonalOutlierFlag]]):
    * exact to ~5e11 rows per bucket at 2-dp |values| ≤ 1e5.
    *
    * Scale shape: ONE map-side-combined aggregate to the (key, dow, hod)
    * register frame (≤ keys × 168 rows — broadcastable at any corpus
    * size), one broadcast join back for the outlier pass. Null
    * values/timestamps are excluded. */
  /** The bucketed-cents projection shared by registers and scoring:
    * `(keys*, dow, hod, _cents)`. */
  private[graft] def seasonalBuckets(
      df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String): DataFrame =
    df.where(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .select((keys.map(col) :+ dayofweek(col(tsCol)).as("dow") :+
        hour(col(tsCol)).as("hod") :+
        round(col(valueCol).cast("double") * lit(100)).cast("long")
          .as("_cents")): _*)

  /** Exact integer moment registers per (key, dow, hod) bucket:
    * `(keys*, dow, hod, n, _s, _q)` — the frame [[seasonalProfile]] reports
    * from and [[graft.streaming.StreamingSeasonal]] freezes as its
    * reference. ≤ keys × 168 rows, broadcastable at any corpus size.
    * `_s`/`_q` fold in decimal(38,0): the squared-cents sum outgrows BIGINT
    * at only ~20 rows of 1e7-magnitude values (ANSI would raise; legacy
    * mode would wrap), while decimal keeps the registers exact to ~1e38 —
    * far past any physical bucket. */
  def seasonalRegisters(
      df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String): DataFrame = {
    val wideC = col("_cents").cast("decimal(38,0)")
    seasonalBuckets(df, keys, tsCol, valueCol)
      .groupBy((keys ++ Seq("dow", "hod")).map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(wideC).cast("decimal(38,0)").as("_s"),
        sum(wideC * wideC).cast("decimal(38,0)").as("_q"))
  }

  /** The all-integer residual test: `(n·v − S)² > k²·(n·Q − S²)` ⇔
    * `|v − mean| > k·σ`, exact — no cross-row FP sum ever feeds the
    * branch. Every operand is widened to `decimal(38,0)` BEFORE any
    * multiply: the squared terms bind long before the raw `n·v` product
    * does (`(n·c)²` exceeds signed 64-bit once `n·|c|` > ~3.0e9 — a mere
    * ~3e5 rows/bucket at 2-dp values near 1e4 cents), and with ANSI off
    * Spark would wrap BIGINT silently. In decimal the test is exact up to
    * ~5e11 rows per (key,dow,hod) bucket at 2-dp |values| ≤ 1e5; past
    * that a product overflows decimal(38,0) → null → the row is simply
    * not flagged (never a wrapped wrong flag). The DuckDB oracle computes
    * the same branch in HUGEINT (int128, same ~1.7e38 headroom). */
  private[graft] def seasonalOutlierFlag(sigmaK: Int): Column = {
    val wide = "decimal(38,0)"
    val n = col("n").cast(wide)
    val c = col("_cents").cast(wide)
    val s = col("_s").cast(wide)
    val q = col("_q").cast(wide)
    val dev = n * c - s
    (dev * dev) > lit(sigmaK.toLong * sigmaK).cast(wide) * (n * q - s * s)
  }

  def seasonalProfile(
      df: DataFrame, keys: Seq[String], tsCol: String, valueCol: String,
      sigmaK: Int = 3): DataFrame = {
    require(sigmaK >= 1, s"sigmaK must be >= 1, got $sigmaK")
    val base = seasonalBuckets(df, keys, tsCol, valueCol)
    val bkeys = keys ++ Seq("dow", "hod")
    val stats = seasonalRegisters(df, keys, tsCol, valueCol)
    val flagged = base
      .join(broadcast(stats), bkeys)
      .withColumn("_isout", seasonalOutlierFlag(sigmaK))
      .groupBy(bkeys.map(col): _*)
      .agg(sum(when(col("_isout"), 1L).otherwise(0L)).as("n_outliers"))
    stats.join(flagged, bkeys)
      .select((bkeys.map(col) :+ col("n") :+
        stableRound(col("_s").cast("double") / (col("n") * lit(100.0)), 6)
          .as("mean_value") :+
        stableRound(
          sqrt((col("n") * col("_q") - col("_s") * col("_s")).cast("double") /
            (col("n") * col("n"))) / lit(100.0), 6).as("sd_value") :+
        col("n_outliers")): _*)
  }

  /** Exact per-group median of `valCol` (6 dp) by the two-middle order
    * statistics: rank by value inside the group (order-statistic VALUES
    * are deterministic even under ties), average ranks ⌈m/2⌉ and ⌈(m+1)/2⌉
    * — the `quantile_cont(0.5)` convention, replayable in plain SQL. The
    * window is partitioned by the group — bounded by the caller's
    * per-group contract, never corpus-global. */
  private def groupedMedian(
      vals: DataFrame, keys: Seq[String], valCol: String,
      out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valCol))
    vals
      .withColumn("_gm_r", row_number().over(w))
      .withColumn("_gm_m",
        count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      .filter(col("_gm_r") === expr("(_gm_m + 1) DIV 2") ||
        col("_gm_r") === expr("(_gm_m + 2) DIV 2"))
      .groupBy(keys.map(col): _*)
      .agg(stableRound(avg(col(valCol)), 6).as(out),
        max("_gm_m").as(s"${out}_n"))
  }

  /** Theil–Sen robust trend per group — the outlier-resistant companion to
    * [[groupTrend]]'s OLS (a single corrupted point moves an OLS slope
    * arbitrarily; the median-of-pairwise-slopes estimator has a 29.3%
    * breakdown point — Sen 1968): slope = median over all in-group point
    * pairs with `x1 < x2` of `(y2−y1)/(x2−x1)` (6 dp before ranking, the
    * t13 round-then-rank discipline), intercept = median of
    * `y − slope·x`. Output: `(keys*, n_points, n_pairs, ts_slope,
    * ts_intercept)`; groups with no defined pair (a single point, or all
    * points sharing one x) are omitted — there is no slope to report.
    *
    * SCALE CONTRACT: the pair frame is quadratic IN THE GROUP — callers
    * feed bounded per-group series (daily/hourly buckets: ≤ thousands of
    * points → ≤ millions of pairs per group), never raw 100 TB rows under
    * one key. The self-join is group-local (both sides hash on `keys` —
    * one co-partitioned exchange each), the ranking windows are
    * group-partitioned, and nothing is corpus-global. */
  /** Mann–Kendall trend TEST per group — the significance companion to
    * [[theilSen]]'s estimator (the classic pairing: MK answers "is there a
    * monotone trend at all?", Theil–Sen answers "how steep?"), over the
    * same group-local pair frame and the same scale contract (pair frame
    * quadratic IN THE GROUP — feed bounded time-bucket series).
    *
    * `S = Σ_{x_i<x_j} sign(y_j − y_i)` is an EXACT integer fold (never a
    * float sum), variance carries the standard y-tie correction
    * `Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18` (all-integer
    * numerator), z applies the ±1 continuity correction, and the two-sided
    * p comes from the [[Experiment.normalSf]] polynomial on the ROUNDED
    * |z| — so S and Var are hash-exact and z/p are engine-portable 6 dp.
    *
    * PRECONDITION: `xCol` is distinct within a group (timestamps /
    * bucket indices — the tie correction above covers ties in y only;
    * tied x would silently drop pairs from S while staying in n). Groups
    * with no pair are omitted; all-tied-y groups report S but null z/p
    * (zero variance). Output: `(keys*, n_points, s_stat, var_s, z,
    * p_value)`. */
  def mannKendall(
      df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((keys.map(col) :+ col(xCol).cast("double").as("_x") :+
        col(yCol).cast("double").as("_y")): _*)
    val b = pts.select((keys.map(col) :+ col("_x").as("_x2") :+
      col("_y").as("_y2")): _*)
    val s = pts.join(b, keys)
      .filter(col("_x") < col("_x2"))
      .groupBy(keys.map(col): _*)
      .agg(sum(
        when(col("_y2") > col("_y"), 1L)
          .when(col("_y2") < col("_y"), -1L)
          .otherwise(0L)).as("s_stat"))
    val tie = pts.groupBy((keys.map(col) :+ col("_y")): _*)
      .agg(count(lit(1)).as("_t"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_t") * (col("_t") - 1) * (lit(2) * col("_t") + 5))
        .as("_tt"))
    val n = pts.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_points"))
    val varS = (col("n_points") * (col("n_points") - 1) *
      (lit(2) * col("n_points") + 5) - col("_tt")).cast("double") / 18.0
    val z = when(col("var_s") > 0,
      stableRound(
        when(col("s_stat") > 0,
          (col("s_stat") - 1).cast("double") / sqrt(col("var_s")))
          .when(col("s_stat") < 0,
            (col("s_stat") + 1).cast("double") / sqrt(col("var_s")))
          .otherwise(lit(0.0)), 6))
    n.join(s, keys).join(tie, keys)
      .withColumn("var_s", varS)
      .withColumn("z", z)
      .select((keys.map(col) :+ col("n_points") :+ col("s_stat") :+
        stableRound(col("var_s"), 6).as("var_s") :+ col("z") :+
        when(col("z").isNotNull,
          stableRound(lit(2.0) * Experiment.normalSf(abs(col("z"))), 6))
          .as("p_value")): _*)
  }

  def theilSen(
      df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((keys.map(col) :+ col(xCol).cast("double").as("_x") :+
        col(yCol).cast("double").as("_y")): _*)
    val b = pts.select((keys.map(col) :+ col("_x").as("_x2") :+
      col("_y").as("_y2")): _*)
    val slopes = pts.join(b, keys)
      .filter(col("_x") < col("_x2"))
      .select((keys.map(col) :+
        stableRound(
          (col("_y2") - col("_y")) / (col("_x2") - col("_x")), 6)
          .as("_s")): _*)
    val slope = groupedMedian(slopes, keys, "_s", "ts_slope")
      .withColumnRenamed("ts_slope_n", "n_pairs")
    val resid = pts.join(slope, keys)
      .select((keys.map(col) :+
        stableRound(col("_y") - col("ts_slope") * col("_x"), 6)
          .as("_i")): _*)
    val nPoints = pts.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_points"))
    nPoints
      .join(slope, keys)
      .join(groupedMedian(resid, keys, "_i", "ts_intercept")
        .drop("ts_intercept_n"), keys)
      .select((keys.map(col) :+ col("n_points") :+ col("n_pairs") :+
        col("ts_slope") :+ col("ts_intercept")): _*)
  }

  /** Equi-depth histogram with per-bucket exact NDV — the OPTIMIZER-
    * statistics table (Postgres `pg_stats`, Spark CBO column histograms)
    * rather than t16's count-per-bucket chart: each of `nBuckets` rows
    * carries `(bucket, lo, hi, n_rows, n_distinct)`, which is exactly the
    * state an equality- or range-selectivity estimator probes
    * ([[histEqualitySelectivity]]). Completes the planner-statistics loop:
    * q85 sizes joins from CMS sketches, q86 sizes ranges from KLL
    * registers, q88 prunes files from footer stats — this is the exact
    * per-column histogram those sketches approximate.
    *
    * Bucket membership is by EXACT GLOBAL RANK over `(value, tieCols)` —
    * `bucket = (rank − 1) · B div n` — not by interpolated value cuts, so
    * ties at a boundary split deterministically by the tiebreaker and the
    * DuckDB mirror (`row_number() OVER (ORDER BY v, ties)`) replays the
    * assignment bit-for-bit (no float-interpolation boundary to disagree
    * on). The rank is [[Packing.globalRunningSum]] of 1 — a range exchange
    * + bounded per-slice windows + a broadcast offset frame, never a
    * single-task global window — and the per-bucket aggregate is one
    * map-side-combined pass (the multi-distinct Expand is rows × 1 here).
    * At 100 TB the cost is the one range exchange a clustered write pays
    * anyway; the output is `nBuckets` rows.
    *
    * `tieCols` must make the order total for the hash to replay. Nulls in
    * `valueCol` are excluded (both engines' histogram convention).
    */
  def equiDepthHistogram(
      df: DataFrame, valueCol: String, tieCols: Seq[String],
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(tieCols.nonEmpty, "tieCols must be non-empty (total order)")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("_edh_v") +:
        tieCols.map(col): _*)
    val ranked = Packing.globalRunningSum(
      vals.withColumn("_edh_one", lit(1L)),
      col("_edh_v") +: tieCols.map(col), "_edh_one", "_edh_rank")
    val n = vals.agg(count(lit(1)).as("_edh_n"))
    ranked
      .crossJoin(broadcast(n))
      // long `div`, not `/`: double division would round the product past
      // 2^53 rows × buckets — exact integer arithmetic at any scale
      .withColumn("bucket",
        expr(s"((_edh_rank - 1L) * ${nBuckets}L) div _edh_n"))
      .groupBy(col("bucket"))
      .agg(
        min(col("_edh_v")).as("lo"),
        max(col("_edh_v")).as("hi"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("_edh_v")).as("n_distinct"))
  }

  /** Equality-predicate selectivity from an [[equiDepthHistogram]]: for
    * each probe value `v`, `est_rows = Σ_{buckets with lo ≤ v ≤ hi}
    * n_rows / n_distinct` — the uniform-within-bucket NDV estimate every
    * cost-based optimizer uses, summed across buckets when a tie run
    * crosses a boundary. The histogram is `nBuckets` rows, so the range
    * join is a broadcast against the probe frame — zero corpus cost at
    * probe time, the entire point of keeping statistics. Probes that land
    * outside every bucket estimate 0 (left join + coalesce).
    *
    * One output row PER PROBE ROW, duplicates included: the cross-bucket
    * sum aggregates over a per-row identity tag, not the probe columns, so
    * two identical probe rows yield two rows of `e` — not one row of `2e`
    * (round-14 advice; the tag is positional only and never survives into
    * the output, so results stay content-deterministic). */
  def histEqualitySelectivity(
      hist: DataFrame, probes: DataFrame, probeCol: String): DataFrame = {
    val h = broadcast(hist.select(
      col("lo").as("_hes_lo"), col("hi").as("_hes_hi"),
      (col("n_rows").cast("double") / col("n_distinct").cast("double"))
        .as("_hes_e")))
    probes
      .withColumn("_hes_rid", monotonically_increasing_id())
      .join(h,
        col(probeCol).cast("double") >= col("_hes_lo") &&
          col(probeCol).cast("double") <= col("_hes_hi"), "left")
      .groupBy((probes.columns :+ "_hes_rid").map(col): _*)
      .agg(stableRound(coalesce(sum(col("_hes_e")), lit(0.0)), 6)
        .as("est_rows"))
      .drop("_hes_rid")
  }
}
