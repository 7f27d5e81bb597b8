package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment-analysis operators — the readout layer for pipeline A/B tests
  * (does the new dedup threshold / quality cutoff / mixture change a
  * downstream metric?). The assignment side already exists
  * ([[TextAnalysis.deterministicSplit]]'s md5 bucketing gives stable,
  * engine-portable variants); these are the two standard readouts over it.
  * North-star extension surface (the reference computes per-equipment OEE,
  * not experiment statistics).
  *
  * Both operators are single aggregate passes (map-side combined, shuffle =
  * a handful of variant/group rows) plus one-row folds — nothing here can
  * become the bottleneck of the pipeline being measured.
  */
object Experiment {

  /** Two-proportion z-test between exactly two variants: per variant the
    * trial/success counts and rate, plus the pooled z statistic of
    * `control → treatment` (positive z = treatment converts more):
    * `z = (p_t − p_c) / sqrt( p(1−p) (1/n_c + 1/n_t) )` with `p` the pooled
    * rate. Output: one row per variant
    * `(variant, n, successes, rate, z)` — `z` identical on both rows (it is
    * a property of the pair), null when either variant is empty or the
    * pooled variance is 0 (all-success / all-failure), rate rounded 6 dp.
    * Consumers threshold |z| (1.96 ≈ 95%); the erf-based p-value is not
    * SQL-portable, so it stays out of the contract.
    *
    * ONE corpus aggregate (variant keyed); the z fold runs on the two-row
    * frame. `successCol` must be boolean; rows with a NULL outcome (metric
    * not landed yet) are EXCLUDED from the trial count — counting an
    * unknown as a failure would bias every rate and z downward with no
    * signal. */
  def abProportionZTest(
      df: DataFrame, variantCol: String, successCol: String,
      control: String, treatment: String): DataFrame = {
    val counts = df
      .where(col(variantCol).isin(control, treatment) &&
        col(successCol).isNotNull)
      .groupBy(col(variantCol).cast("string").as("variant"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(successCol) === true, 1L).otherwise(0L)).as("successes"))
    val wide = counts.agg(
      max(when(col("variant") === control, col("n"))).as("_nc"),
      max(when(col("variant") === control, col("successes"))).as("_sc"),
      max(when(col("variant") === treatment, col("n"))).as("_nt"),
      max(when(col("variant") === treatment, col("successes"))).as("_st"))
    val z = wide.select(
      ((col("_sc") + col("_st")).cast("double") / (col("_nc") + col("_nt"))).as("_p"),
      col("_nc"), col("_nt"), col("_sc"), col("_st"))
      .select(
        when(
          col("_nc").isNotNull && col("_nt").isNotNull &&
            col("_p") > 0.0 && col("_p") < 1.0,
          stableRound(
            (col("_st").cast("double") / col("_nt") -
              col("_sc").cast("double") / col("_nc")) /
              sqrt(col("_p") * (lit(1.0) - col("_p")) *
                (lit(1.0) / col("_nc") + lit(1.0) / col("_nt"))), 6))
          .as("z"))
    counts
      .select(
        col("variant"), col("n"), col("successes"),
        stableRound(col("successes").cast("double") / col("n"), 6).as("rate"))
      .crossJoin(broadcast(z))
  }

  /** Wilson score interval per variant — the confidence band to print NEXT
    * TO [[abProportionZTest]]'s rates (a bare p̂ from 40 trials looks as
    * authoritative as one from 40 million; the Wilson interval is the
    * standard small-n-honest band, never leaving [0, 1] like the normal
    * approximation does): center `(p̂ + z²/2n) / (1 + z²/n)`, half-width
    * `z/(1 + z²/n) · √(p̂(1−p̂)/n + z²/4n²)`. Output: one row per variant,
    * `(variant, n, successes, rate, lo, hi)`, all rates 6 dp. NULL
    * outcomes are excluded from trials (the z-test's convention).
    * One variant-keyed corpus aggregate; the interval is per-row
    * arithmetic on the variant-sized frame. */
  def wilsonIntervals(
      df: DataFrame, variantCol: String, successCol: String,
      z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val counts = df
      .where(col(successCol).isNotNull)
      .groupBy(col(variantCol).cast("string").as("variant"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(successCol) === true, 1L).otherwise(0L)).as("successes"))
    val nD = col("n").cast("double")
    val p = col("successes").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = (lit(z) / denom) *
      sqrt(p * (lit(1.0) - p) / nD + z2 / (lit(4.0) * nD * nD))
    counts.select(
      col("variant"), col("n"), col("successes"),
      stableRound(p, 6).as("rate"),
      stableRound(center - half, 6).as("lo"),
      stableRound(center + half, 6).as("hi"))
  }

  /** CUPED variance reduction (Deng et al. 2013): adjust each unit's
    * post-period metric with its pre-period covariate,
    * `y' = y − θ (x − x̄)` where `θ = cov(x, y) / var(x)` over ALL units —
    * the experiment readout then compares adjusted variant means, whose
    * variance is smaller by the squared pre/post correlation. Input: one
    * row per unit `(variantCol, preCol, postCol)`; units with a NULL pre or
    * post are EXCLUDED up front — otherwise count(\*) and the null-skipping
    * sums would disagree about n and silently bias x̄, θ, and every
    * variance (complete-case, like every closed-form-sums operator here).
    * Output: one row per
    * variant `(variant, n, mean_post, mean_adjusted, theta, var_reduction)`
    * — theta/var_reduction identical across rows (global fit);
    * `var_reduction = 1 − var(y')/var(y)` ≈ corr², null when var(x) or
    * var(y) is 0. All 6 dp.
    *
    * Two aggregate passes over the UNIT table (one global for θ/x̄ from
    * closed-form sums, one variant-keyed for the adjusted means) — the unit
    * table is itself usually the output of a corpus aggregate, and both
    * passes are map-side combined. */
  def cuped(
      df: DataFrame, variantCol: String, preCol: String,
      postCol: String): DataFrame = {
    val x = col(preCol).cast("double")
    val y = col(postCol).cast("double")
    val complete = df.where(x.isNotNull && y.isNotNull)
    val g = complete.agg(
      count(lit(1)).as("_n"),
      sum(x).as("_sx"), sum(y).as("_sy"),
      sum(x * x).as("_sxx"), sum(y * y).as("_syy"), sum(x * y).as("_sxy"))
    val fit = broadcast(g.select(
      (col("_sx") / col("_n")).as("_mx"),
      when(col("_n") * col("_sxx") - col("_sx") * col("_sx") > 0.0,
        (col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("_n") * col("_sxx") - col("_sx") * col("_sx")))
        .as("_theta"),
      ((col("_syy") - col("_sy") * col("_sy") / col("_n")) / col("_n")).as("_vy"),
      (col("_sxy") / col("_n") - col("_sx") * col("_sy") / (col("_n") * col("_n"))).as("_cxy"),
      ((col("_sxx") - col("_sx") * col("_sx") / col("_n")) / col("_n")).as("_vx")))
    complete.crossJoin(fit)
      .select(
        col(variantCol).cast("string").as("variant"),
        y.as("_y"),
        // degenerate pre-covariate (var 0) -> no adjustment rather than a
        // null-poisoned metric; theta stays null in the output as the signal
        (y - coalesce(col("_theta"), lit(0.0)) * (x - col("_mx"))).as("_adj"),
        col("_theta"), col("_vx"), col("_vy"), col("_cxy"))
      .groupBy("variant")
      .agg(
        count(lit(1)).as("n"),
        stableRound(avg(col("_y")), 6).as("mean_post"),
        stableRound(avg(col("_adj")), 6).as("mean_adjusted"),
        stableRound(first(col("_theta")), 6).as("theta"),
        stableRound(
          when(first(col("_vy")) > 0.0 && first(col("_vx")) > 0.0,
            first(col("_cxy")) * first(col("_cxy")) /
              (first(col("_vx")) * first(col("_vy")))), 6)
          .as("var_reduction"))
  }

  /** Mann–Whitney U test — the NONPARAMETRIC A/B readout on a numeric
    * metric (the companion [[abProportionZTest]] is for rates, [[cuped]]
    * for means; heavy-tailed pipeline metrics — latencies, doc lengths,
    * quality scores — want the rank test that a single outlier can't move):
    * pooled midranks with the standard tie correction,
    * `U_c = R_c − n_c(n_c+1)/2`, normal approximation
    * `z = (U_c − n_c·n_t/2) / σ`,
    * `σ² = n_c·n_t/12 · ((N+1) − Σ(t³−t)/(N(N−1)))`, plus the
    * rank-biserial effect size `1 − 2U_c/(n_c·n_t)` (positive ⇒ control
    * stochastically SMALLER). Output: one row
    * `(n_control, n_treatment, u_control, z, rank_biserial)` (6 dp;
    * z null when a side is missing or every value is tied — no ordering
    * signal). NULL metric values are excluded (the z-test convention).
    *
    * Shape: ranks come from ONE pooled distinct-value aggregate run
    * through the DISTRIBUTED prefix sum ([[Packing.globalRunningSums]] —
    * never an unpartitioned window); the per-(variant, value) frame joins
    * the midranks value-wise; everything downstream is distinct-value- or
    * one-row-sized. */
  def mannWhitneyU(
      df: DataFrame, variantCol: String, valueCol: String,
      control: String, treatment: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val base = df
      .where(col(variantCol).isin(control, treatment) && v.isNotNull)
      .select(col(variantCol).cast("string").as("_g"), v.as("_v"))
    val vc = base.groupBy("_v").agg(count(lit(1)).as("_c"))
    // ascending positions cb+1..cb+c for a value with cb pooled values
    // below it and c ties -> midrank cb + (c+1)/2
    val ranked = Packing
      .globalRunningSums(vc, Seq(col("_v").asc), Seq("_c" -> "_cum"))
      .select(
        col("_v"),
        (col("_cum") - col("_c") + (col("_c") + 1) / lit(2.0)).as("_midrank"))
    val perGroup = base.groupBy("_g", "_v").agg(count(lit(1)).as("_cg"))
      .join(ranked, Seq("_v"))
      .groupBy("_g")
      .agg(sum("_cg").as("_n"), sum(col("_cg") * col("_midrank")).as("_rsum"))
    val ties = broadcast(vc.agg(
      coalesce(sum(when(col("_c") > 1,
        pow(col("_c").cast("double"), 3) - col("_c"))), lit(0.0)).as("_ties"),
      coalesce(sum("_c"), lit(0L)).as("_nn")))
    perGroup
      .agg(
        max(when(col("_g") === control, col("_n"))).as("_na"),
        max(when(col("_g") === control, col("_rsum"))).as("_ra"),
        max(when(col("_g") === treatment, col("_n"))).as("_nb"))
      .crossJoin(ties)
      .select(
        col("_na").as("n_control"), col("_nb").as("n_treatment"),
        (col("_ra") - col("_na") * (col("_na") + 1) / lit(2.0)).as("_u"),
        col("_na"), col("_nb"), col("_ties"), col("_nn"))
      .select(
        col("n_control"), col("n_treatment"),
        stableRound(col("_u"), 6).as("u_control"),
        when(
          col("_na").isNotNull && col("_nb").isNotNull && col("_nn") > 1 &&
            (col("_na") * col("_nb") / lit(12.0)) *
              ((col("_nn") + 1) -
                col("_ties") / (col("_nn") * (col("_nn") - lit(1.0)))) > 0.0,
          stableRound(
            (col("_u") - col("_na") * col("_nb") / lit(2.0)) /
              sqrt((col("_na") * col("_nb") / lit(12.0)) *
                ((col("_nn") + 1) -
                  col("_ties") / (col("_nn") * (col("_nn") - lit(1.0))))), 6))
          .as("z"),
        when(col("_na").isNotNull && col("_nb").isNotNull &&
            col("_na") * col("_nb") > 0,
          stableRound(
            lit(1.0) - lit(2.0) * col("_u") / (col("_na") * col("_nb")), 6))
          .as("rank_biserial"))
  }

  /** Welch's unequal-variance t-test — the MEANS companion between
    * [[abProportionZTest]] (rates) and [[mannWhitneyU]] (ranks): "did the
    * variant move the average?" without pretending the two arms share a
    * variance (they never do after a treatment that works). One
    * map-side-combined aggregate per side — `(n, Σx, Σx²)` — then the
    * classic closed forms on the one-row frame:
    * `t = (m_c − m_t)/√(v_c/n_c + v_t/n_t)`, Welch–Satterthwaite
    * `df = (v_c/n_c + v_t/n_t)² / ((v_c/n_c)²/(n_c−1) + (v_t/n_t)²/(n_t−1))`,
    * and a two-sided p from the 6dp-ROUNDED |t| through the portable
    * [[normalSf]] — the LARGE-SAMPLE normal approximation (exact to ~3dp
    * beyond df ≈ 30; `df` is emitted precisely so a caller near that
    * boundary can look up the exact t-distribution instead). Output: one
    * row `(n_control, n_treatment, mean_control, mean_treatment, t_stat,
    * df, p)` — t/df/p null when a side has < 2 rows or both variances are
    * zero. NULL metric values are excluded (the z-test convention).
    *
    * Conditioning note: the `Σx² − (Σx)²/n` variance form cancels when the
    * coefficient of variation is tiny — center a near-constant metric
    * before testing (the [[graft.operators.Profiling.groupTrend]]
    * contract). */
  def welchTTest(
      df: DataFrame, variantCol: String, valueCol: String,
      control: String, treatment: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val sides = df
      .where(col(variantCol).isin(control, treatment) && v.isNotNull)
      .groupBy(col(variantCol).cast("string").as("_g"))
      .agg(count(lit(1)).as("_n"), sum(v).as("_s"), sum(v * v).as("_sq"))
    def side(g: String, c: String): Column = max(when(col("_g") === g, col(c)))
    val one = sides.agg(
      side(control, "_n").as("_na"), side(control, "_s").as("_sa"),
      side(control, "_sq").as("_qa"),
      side(treatment, "_n").as("_nb"), side(treatment, "_s").as("_sb"),
      side(treatment, "_sq").as("_qb"))
    val na = col("_na").cast("double")
    val nb = col("_nb").cast("double")
    val ma = col("_sa") / na
    val mb = col("_sb") / nb
    val va = (col("_qa") - col("_sa") * col("_sa") / na) / (na - 1)
    val vb = (col("_qb") - col("_sb") * col("_sb") / nb) / (nb - 1)
    val se2 = va / na + vb / nb
    val ok = col("_na").isNotNull && col("_nb").isNotNull &&
      col("_na") > 1 && col("_nb") > 1 && se2 > 0.0
    val t = stableRound((ma - mb) / sqrt(se2), 6)
    one.select(
      col("_na").as("n_control"), col("_nb").as("n_treatment"),
      stableRound(ma, 6).as("mean_control"),
      stableRound(mb, 6).as("mean_treatment"),
      when(ok, t).as("t_stat"),
      when(ok, stableRound(
        se2 * se2 / (va * va / (na * na * (na - 1)) +
          vb * vb / (nb * nb * (nb - 1))), 6)).as("df"),
      // two-sided, from the ROUNDED |t| so both engines feed the
      // polynomial identical numbers
      when(ok, stableRound(lit(2.0) * normalSf(abs(t)), 6)).as("p"))
  }


  /** Upper-tail standard normal survival `P(Z > z)` for `z ≥ 0`, via the
    * Abramowitz–Stegun 26.2.17 polynomial (|ε| < 7.5e-8 — two orders below
    * the 6 dp this feeds). The naked `erf` builtin is not engine-portable,
    * but THIS closed form is — plain `exp`/`sqrt`/arithmetic an oracle
    * replays verbatim, making p-values hash-checkable where
    * [[abProportionZTest]] had to stop at z. */
  private[operators] def normalSf(z: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * z)
    val poly = t * (lit(0.319381530) +
      t * (lit(-0.356563782) +
        t * (lit(1.781477937) +
          t * (lit(-1.821255978) + t * lit(1.330274429)))))
    exp(-z * z / lit(2.0)) / sqrt(lit(2.0) * lit(math.Pi)) * poly
  }

  /** SQL text of [[normalSf]] over the expression `z` — the oracle-side
    * twin, kept adjacent so the two cannot drift. */
  def normalSfSql(z: String): String =
    s"""(exp(-($z) * ($z) / 2.0) / sqrt(2.0 * pi()) *
        ((1.0 / (1.0 + 0.2316419 * ($z))) * (0.319381530 +
         (1.0 / (1.0 + 0.2316419 * ($z))) * (-0.356563782 +
         (1.0 / (1.0 + 0.2316419 * ($z))) * (1.781477937 +
         (1.0 / (1.0 + 0.2316419 * ($z))) * (-1.821255978 +
         (1.0 / (1.0 + 0.2316419 * ($z))) * 1.330274429))))))"""

  /** Per-group two-sided one-sample z-test of `valueCol`'s group mean
    * against the corpus mean (population sd): the screening pass a
    * pipeline runs over every segment × metric before believing any of
    * them — and the natural input to [[bhAdjust]], because screening MANY
    * segments at α=0.05 manufactures false positives by construction.
    *
    * Output: `(group, n, mean, z, p)` — z and p 6 dp (ROUNDED AT THE STAGE
    * BOUNDARY so downstream ordering compares identical doubles in any
    * engine), p from [[normalSf]], both null for empty groups or zero
    * corpus variance. NULL values excluded. ONE group-keyed corpus
    * aggregate + a broadcast one-row corpus-moment fold. */
  def meanZTests(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val rows = df.where(v.isNotNull)
    val grp = rows.groupBy(col(groupCol).cast("string").as("group"))
      .agg(count(lit(1)).as("n"), sum(v).as("_s"))
    val glob = rows.agg(
      count(lit(1)).as("_n_all"), sum(v).as("_s_all"),
      sum(v * v).as("_ss_all"))
    val z = (col("_s") / col("n") - col("_s_all") / col("_n_all")) /
      (sqrt((col("_ss_all") - col("_s_all") * col("_s_all") / col("_n_all")) /
        col("_n_all")) / sqrt(col("n")))
    grp.crossJoin(broadcast(glob))
      .withColumn("_var_all",
        (col("_ss_all") - col("_s_all") * col("_s_all") / col("_n_all")) /
          col("_n_all"))
      .withColumn("z",
        when(col("_var_all") > 0.0, stableRound(z, 6)))
      .select(
        col("group"), col("n"),
        stableRound(col("_s") / col("n"), 6).as("mean"),
        col("z"),
        when(col("z").isNotNull,
          stableRound(lit(2.0) * normalSf(abs(col("z"))), 6)).as("p"))
  }

  /** Kaplan–Meier survival over event-stream lifetimes, with censoring —
    * the readout [[graft.QueriesExt]] q34's cohort grid cannot give:
    * retention matrices treat a user who JOINED YESTERDAY as churned at
    * week 2; KM right-censors them instead (they leave the risk set
    * without counting as an event), the standard estimator when every
    * lifetime is still in progress.
    *
    * Per user: lifetime = whole days between first and last event
    * (integer µs arithmetic end to end); a user whose last event is
    * within `horizonDays` of the CORPUS max timestamp is CENSORED (may
    * still be active), otherwise their lifetime ended (event). Output:
    * one row per distinct lifetime `t` — `(duration_days, n_at_risk,
    * n_events, n_censored, survival)` with
    * `S(t) = Π_{t' ≤ t, events} (1 − d/n)`, 6 dp; a step where every
    * at-risk user exits by event pins S to exactly 0 (no `ln(0)` — Spark
    * nulls it, DuckDB gives −inf; the CASE keeps both engines off that
    * path).
    *
    * Shape: one user-keyed aggregate (corpus-sized shuffle, map-side
    * combined), a broadcast one-row corpus max, a distinct-lifetime
    * aggregate (frame ≤ observation-window days), and the DISTRIBUTED
    * prefix sum over it for both the at-risk suffix counts and the
    * `Σ ln(1 − d/n)` product — never an unpartitioned window. The ln/exp
    * round-trip is the one FP seam; it is rounded at 6 dp with ≤
    * window-days terms of 1-ulp libm drift, orders below the boundary. */
  def kaplanMeier(
      df: DataFrame, userCol: String, tsCol: String,
      horizonDays: Int = 3): DataFrame = {
    require(horizonDays >= 0, s"horizonDays must be >= 0, got $horizonDays")
    val us = epochMicros(df, tsCol)
    val users = df.where(col(tsCol).isNotNull)
      .groupBy(col(userCol).as("_u"))
      .agg(min(us).as("_first"), max(us).as("_last"))
    val gmax = df.where(col(tsCol).isNotNull)
      .agg(max(us).as("_gmax"))
    val durs = users.crossJoin(broadcast(gmax))
      .select(
        // integer DIV, not `/` (FP division could round a day boundary
        // down across engines; both operands are non-negative µs)
        expr(s"(_last - _first) div ${dayUs}L").as("_dur"),
        when(col("_gmax") - col("_last") >= lit(horizonDays * dayUs), 1L)
          .otherwise(0L).as("_obs"))
    kaplanMeierCurve(durs, "_dur", "_obs")
  }

  private val dayUs = 86400L * 1000000L

  // accept either shape: epoch-micros long (Tables.events) or timestamp
  private def epochMicros(df: DataFrame, tsCol: String) =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => col(tsCol)
      case _ => unix_micros(col(tsCol).cast("timestamp"))
    }

  /** Time-to-first-failure subject frame for [[kaplanMeierCurve]]: per
    * `userCol`, days from the user's FIRST event to their first event with
    * `typeCol = failValue` (observed), or to the corpus max timestamp
    * (right-censored — observation simply ended) when they never fail.
    * A user whose very first event is a failure gets duration 0, observed.
    * Output: one row per user, `(userCol, duration_days, observed)` —
    * integer-µs DIV day arithmetic, engine-exact. One user-keyed corpus
    * aggregate + a broadcast one-row max. */
  def timeToFirst(
      df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, failValue: String): DataFrame = {
    val us = epochMicros(df, tsCol)
    val users = df.where(col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(
        min(us).as("_first"),
        min(when(col(typeCol) === failValue, us)).as("_fail"))
    val gmax = df.where(col(tsCol).isNotNull).agg(max(us).as("_gmax"))
    users.crossJoin(broadcast(gmax))
      .select(
        col(userCol),
        expr(s"(coalesce(_fail, _gmax) - _first) div ${dayUs}L")
          .as("duration_days"),
        col("_fail").isNotNull.as("observed"))
  }

  /** The Kaplan–Meier curve proper, over ANY one-row-per-subject
    * `(duration, observed)` frame ([[kaplanMeier]]'s lifetimes,
    * [[timeToFirst]]'s failure clocks, or caller-supplied durations):
    * one row per distinct duration `t` — `(duration_days, n_at_risk,
    * n_events, n_censored, survival)`, `S(t) = Π_{t' ≤ t} (1 − d/n)`
    * 6 dp. A step where every remaining subject exits by event pins S to
    * exactly 0 (no `ln(0)` — Spark nulls it, DuckDB gives −inf; the CASE
    * keeps both engines off that path).
    *
    * Shape: one distinct-duration aggregate (frame ≤ observation-window
    * days) + the DISTRIBUTED prefix sum over it, twice — at-risk suffix
    * counts and the `Σ ln(1 − d/n)` log-product — never an unpartitioned
    * window. The ln/exp round-trip is the one FP seam; 6 dp rounding
    * absorbs its ≤ window-days × 1-ulp libm drift. */
  def kaplanMeierCurve(
      perSubject: DataFrame, durCol: String, obsCol: String): DataFrame = {
    val n = perSubject.agg(count(lit(1)).as("_n_subj"))
    val perDur = perSubject
      .groupBy(col(durCol).cast("long").as("duration_days"))
      .agg(
        count(lit(1)).as("_n_total"),
        sum(when(col(obsCol).cast("boolean"), 1L).otherwise(0L))
          .as("n_events"))
      .crossJoin(broadcast(n))
    val atRisk = perDur
      .transform(d => Packing.globalRunningSum(
        d, Seq(col("duration_days")), "_n_total", "_cum_n"))
      .withColumn("n_at_risk",
        col("_n_subj") - (col("_cum_n") - col("_n_total")))
    val lnTerm = when(
      col("n_events") > 0 && col("n_events") < col("n_at_risk"),
      log(lit(1.0) -
        col("n_events").cast("double") / col("n_at_risk")))
      .otherwise(lit(0.0))
    Packing.globalRunningSum(
      atRisk.withColumn("_ln", lnTerm),
      Seq(col("duration_days")), "_ln", "_lnsum")
      .select(
        col("duration_days"), col("n_at_risk"), col("n_events"),
        (col("_n_total") - col("n_events")).as("n_censored"),
        when(col("n_events") === col("n_at_risk"), lit(0.0))
          .otherwise(stableRound(exp(col("_lnsum")), 6)).as("survival"))
  }

  /** Log-rank test between two survival groups — THE standard "did the
    * treatment change time-to-event?" readout over [[timeToFirst]]-shaped
    * subjects, and the honest alternative to comparing two
    * [[kaplanMeierCurve]]s by eye: at every distinct event time the
    * observed events in group B are compared against the expectation
    * under the shared-hazard null (`e = d·n_b/n`, hypergeometric variance
    * `v = d·(n_b/n)·(1−n_b/n)·(n−d)/(n−1)`), and
    * `χ² = (Σd_b − Σe_b)²/Σv` is χ²₁ under the null. Censored subjects
    * leave the risk set without contributing events — exactly what a
    * naive "mean lifetime per variant" t-test gets wrong. Output: ONE row
    * `(n_a, n_b, events_a, events_b, expected_b, chi2, p)` — p two-sided
    * via the engine-portable [[normalSf]] (`P(χ²₁ > x) = 2·(1−Φ(√x))`),
    * everything 6 dp; chi2/p null when the variance sum is 0 (no
    * comparable event times).
    *
    * Shape: one subject-keyed aggregate to the (duration × group) frame
    * (≤ observation-window days × 2 rows), per-group at-risk suffix
    * counts via a PARTITIONED cumulative window over the densified
    * duration × group grid, then one-row folds. The subject frame is
    * touched once. */
  def logRank(
      subjects: DataFrame, durCol: String, obsCol: String,
      groupCol: String, groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "logRank needs two distinct groups")
    val subj = subjects
      .where(col(groupCol).isin(groupA, groupB) && col(durCol).isNotNull)
      .select(
        col(durCol).cast("long").as("_dur"),
        when(col(obsCol).cast("boolean"), 1L).otherwise(0L).as("_obs"),
        col(groupCol).cast("string").as("_grp"))
    val per = subj.groupBy("_dur", "_grp")
      .agg(count(lit(1)).as("_n"), sum(col("_obs")).as("_d"))
    val spark = subjects.sparkSession
    import spark.implicits._
    val grid = per.select("_dur").distinct()
      .crossJoin(Seq(groupA, groupB).toDF("_grp"))
      .join(per, Seq("_dur", "_grp"), "left")
      .na.fill(0L, Seq("_n", "_d"))
    val ng = subj.groupBy("_grp").agg(count(lit(1)).as("_ng"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_grp")).orderBy(col("_dur"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val atRisk = grid.join(ng, Seq("_grp"))
      .withColumn("_cum", sum(col("_n")).over(w))
      .withColumn("_r", col("_ng") - (col("_cum") - col("_n")))
    val wide = atRisk.groupBy("_dur").agg(
      max(when(col("_grp") === groupA, col("_r"))).as("_ra"),
      max(when(col("_grp") === groupB, col("_r"))).as("_rb"),
      max(when(col("_grp") === groupA, col("_d"))).as("_da"),
      max(when(col("_grp") === groupB, col("_d"))).as("_db"))
    val terms = wide
      .withColumn("_dt", col("_da") + col("_db"))
      .withColumn("_nt", col("_ra") + col("_rb"))
      .where(col("_dt") > 0 && col("_nt") > 0)
      .withColumn("_pb", col("_rb").cast("double") / col("_nt"))
      .withColumn("_e", col("_dt") * col("_pb"))
      .withColumn("_v",
        when(col("_nt") > 1,
          col("_dt") * col("_pb") * (lit(1.0) - col("_pb")) *
            (col("_nt") - col("_dt")).cast("double") / (col("_nt") - lit(1L)))
          .otherwise(lit(0.0)))
    val folded = terms.agg(
      sum(col("_da")).as("_sda"), sum(col("_db")).as("_sdb"),
      sum(col("_e")).as("_se"), sum(col("_v")).as("_sv"))
    val counts = ng.agg(
      max(when(col("_grp") === groupA, col("_ng"))).as("n_a"),
      max(when(col("_grp") === groupB, col("_ng"))).as("n_b"))
    counts.crossJoin(broadcast(folded))
      .withColumn("chi2",
        when(col("_sv") > 0.0, stableRound(
          (col("_sdb") - col("_se")) * (col("_sdb") - col("_se")) /
            col("_sv"), 6)))
      .select(
        col("n_a"), col("n_b"),
        coalesce(col("_sda"), lit(0L)).as("events_a"),
        coalesce(col("_sdb"), lit(0L)).as("events_b"),
        stableRound(col("_se"), 6).as("expected_b"),
        col("chi2"),
        when(col("chi2").isNotNull,
          stableRound(lit(2.0) * normalSf(sqrt(col("chi2"))), 6)).as("p"))
  }

  /** Benjamini–Hochberg FDR adjustment over a hypothesis frame: adds
    * `(rank, q_bh, reject)` to `(keyCol, pCol)` rows — `q_i = min_{j≥i}
    * (p_j · m / j)` clamped to 1 (the standard step-up q-value), `reject ⇔
    * q ≤ alpha`. Rows with null p are carried through with null
    * rank/q/reject and EXCLUDED from `m` (an untestable hypothesis must
    * not dilute the correction). Ties order by (p, key) — deterministic in
    * any engine.
    *
    * Shape: the hypothesis frame is segments × metrics — small by
    * construction — so rank and the suffix-min run as TRIANGULAR
    * SELF-JOINS over it (the [[Packing]] offsets idiom: partition-safe,
    * no unpartitioned window, no driver collect), never touching the
    * corpus the p-values came from. */
  def bhAdjust(
      tests: DataFrame, keyCol: String, pCol: String,
      alpha: Double = 0.05): DataFrame = {
    val tested = tests.where(col(pCol).isNotNull)
      .select(col(keyCol).as("_bh_key"), col(pCol).as("_bh_p"))
    val m = tested.agg(count(lit(1)).as("_bh_m"))
    val other = tested.select(
      col("_bh_key").as("_bh_key_b"), col("_bh_p").as("_bh_p_b"))
    // rank i = #{(p', key') ≤lex (p, key)}; suffix-min over j ≥ i reads the
    // SAME triangular join the other way (p'·m/j' for (p', key') ≥lex us).
    // Both triangular joins broadcast their hypothesis-frame side (the
    // declared contract: hypotheses = segments × metrics, never corpus
    // rows) — a non-equi join with no hint degenerates to a SHUFFLE
    // CartesianProduct, the one plan shape that would not survive a big
    // hypothesis frame on a cluster.
    val ranked = tested
      .join(broadcast(other),
        col("_bh_p_b") < col("_bh_p") ||
          (col("_bh_p_b") === col("_bh_p") &&
            col("_bh_key_b") <= col("_bh_key")),
        "left")
      .groupBy(col("_bh_key"), col("_bh_p"))
      .agg(count(col("_bh_key_b")).as("rank"))
    val withRankB = ranked.select(
      col("_bh_key").as("_bh_key_b"), col("_bh_p").as("_bh_p_b"),
      col("rank").as("_bh_rank_b"))
    val q = ranked
      .join(broadcast(withRankB),
        col("_bh_p_b") > col("_bh_p") ||
          (col("_bh_p_b") === col("_bh_p") &&
            col("_bh_key_b") >= col("_bh_key")))
      .crossJoin(broadcast(m))
      .groupBy(col("_bh_key"), col("_bh_p"), col("rank"))
      .agg(stableRound(
        least(min(col("_bh_p_b") * col("_bh_m") / col("_bh_rank_b")),
          lit(1.0)), 6).as("q_bh"))
    tests.join(
      q.select(
        col("_bh_key"), col("rank"), col("q_bh"),
        (col("q_bh") <= lit(alpha)).as("reject")),
      col(keyCol) === col("_bh_key"), "left")
      .drop("_bh_key")
  }

  /** Kruskal–Wallis k-group rank test — the one-way "did ANY of these
    * segments shift?" screen that [[mannWhitneyU]] (its k=2 special case)
    * cannot ask: H over pooled midranks with the standard tie correction
    * `H' = H / (1 − Σ(t³−t)/(N³−N))`, df = k−1, and a TWO-stage portable
    * p: H' is 6 dp-rounded at the stage boundary, the Wilson–Hilferty
    * cube-root normalization `z = ((H'/ν)^⅓ − (1 − 2/9ν))·√(9ν/2)` maps
    * it to a normal deviate (declared approximation — good to ~1e-3 for
    * ν ≥ 2, far above the decisions it gates), and the shared
    * [[normalSf]] polynomial prices the upper tail (z < 0 → 1 − sf(−z)).
    *
    * Midranks ride [[Packing.globalRunningSums]] over the DISTINCT-value
    * frame — the sliced prefix sum, never a single-task global window —
    * exactly as [[mannWhitneyU]] does; everything after the first two
    * aggregates is group-count-sized. Output (one row): `(n_groups,
    * n_total, h_stat, df, z_wh, p_approx)`; z/p null when fewer than two
    * groups or when ALL values are tied (the tie correction divides out
    * every rank distinction). */
  def kruskalWallis(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val base = df
      .where(col(groupCol).isNotNull && v.isNotNull)
      .select(col(groupCol).cast("string").as("_g"), v.as("_v"))
    val vc = base.groupBy("_v").agg(count(lit(1)).as("_c"))
    val ranked = Packing
      .globalRunningSums(vc, Seq(col("_v").asc), Seq("_c" -> "_cum"))
      .select(
        col("_v"),
        (col("_cum") - col("_c") + (col("_c") + 1) / lit(2.0)).as("_midrank"))
    val perGroup = base.groupBy("_g", "_v").agg(count(lit(1)).as("_cg"))
      .join(ranked, Seq("_v"))
      .groupBy("_g")
      .agg(sum("_cg").as("_n"), sum(col("_cg") * col("_midrank")).as("_rsum"))
    val ties = broadcast(vc.agg(
      coalesce(sum(when(col("_c") > 1,
        pow(col("_c").cast("double"), 3) - col("_c"))), lit(0.0)).as("_ties"),
      coalesce(sum("_c"), lit(0L)).as("_nn")))
    val nnD = col("_nn").cast("double")
    val tieDenom = lit(1.0) - col("_ties") / (nnD * nnD * nnD - nnD)
    val h = (lit(12.0) / (nnD * (nnD + 1)) *
      sum(col("_rsum") * col("_rsum") / col("_n")) -
      lit(3.0) * (nnD + 1)) / tieDenom
    val agg = perGroup.crossJoin(ties)
      .groupBy("_ties", "_nn")
      .agg(
        count(lit(1)).as("n_groups"),
        sum("_n").as("n_total"),
        when(count(lit(1)) >= 2 && tieDenom > 0, stableRound(h, 6))
          .as("h_stat"))
      .withColumn("df", col("n_groups") - 1)
    val nu = col("df").cast("double")
    val z = when(col("h_stat").isNotNull,
      stableRound(
        (cbrt(col("h_stat") / nu) - (lit(1.0) - lit(2.0) / (lit(9.0) * nu))) *
          sqrt(lit(9.0) * nu / 2.0), 6))
    agg
      .withColumn("z_wh", z)
      .select(
        col("n_groups"), col("n_total"), col("h_stat"), col("df"),
        col("z_wh"),
        when(col("z_wh").isNotNull,
          stableRound(
            when(col("z_wh") >= 0, normalSf(col("z_wh")))
              .otherwise(lit(1.0) - normalSf(-col("z_wh"))), 6))
          .as("p_approx"))
  }

  /** Bradley–Terry preference strengths from pairwise trials — the
    * preference-data readout (which model/source/annotator wins?): each
    * input row is one comparison `(winnerCol, loserCol)`; output is one row
    * per item, `(item, n_wins, n_games, bt_strength)` with strengths
    * normalized to sum 1 (the model's scale is otherwise unidentifiable).
    * `iters` rounds of Hunter (2004)'s MM update
    * `p_i ← W_i / Σ_j n_ij/(p_i + p_j)` from the all-ones start —
    * deterministic, monotone in likelihood, and each round is one join +
    * one fold over the ITEM-PAIR frame, so the oracle unrolls it exactly
    * (6 dp [[stableRound]] at every iteration boundary, the s23/q71
    * rounding contract).
    *
    * Scale shape: the corpus of trials is touched ONCE (a map-side-combined
    * (winner, loser) count — shuffle ∝ item pairs, never rows); every MM
    * round then runs on broadcast item-sized frames. Nothing is collected —
    * the fit survives 100 TB trial counts because the iteration state is
    * items², not trials. Self-pairs and null items are dropped (a trial
    * needs two distinct named players); ties are the caller's decision to
    * exclude (classic BT has no tie outcome). Degenerate items are safe by
    * construction: a never-winner's strength goes to 0, and `p_i + p_j > 0`
    * on every played edge since each edge's winner keeps `W > 0`. */
  def bradleyTerry(
      pairs: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 3): DataFrame =
    bradleyTerryFromCounts(pairCounts(pairs, winnerCol, loserCol), iters)

  /** Directed win-count frame `(_i, _j, _w)` for a trial frame — the
    * SUFFICIENT STATISTIC of the Bradley–Terry model, and (like the CMS
    * registers) plain mergeable relational state: counts ADD, so
    * `pairCounts(A) ⊎ pairCounts(B)` sum-folded equals
    * `pairCounts(A ∪ B)` exactly — what makes the fit incrementally
    * maintainable over a stream. Self-pairs and null items are dropped. */
  def pairCounts(
      pairs: DataFrame, winnerCol: String, loserCol: String): DataFrame =
    pairs
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).as("_i"), col(loserCol).as("_j"))
      .agg(count(lit(1)).as("_w"))

  /** Sum-fold two [[pairCounts]] frames — exact, associative, NON-idempotent
    * (replay safety is the caller's staging discipline, as with
    * [[Cms]]). */
  def mergePairCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("_i", "_j").agg(sum("_w").as("_w"))

  /** The MM fit from a [[pairCounts]] frame (see [[bradleyTerry]]).
    *
    * The sufficient statistic is MATERIALIZED once (`localCheckpoint` —
    * items²-bounded, KBs), and so is each round's strength frame: an MM
    * round references the previous strengths TWICE (once per side of the
    * edge), so a lazily-chained fold would double the upstream subtree
    * per round — 2^iters re-executions of the corpus-side trial aggregate
    * at plan time AND run time. Checkpointing pins both to one corpus
    * pass + `iters` item-frame jobs, and keeps the plan constant-size at
    * any `iters`. */
  def bradleyTerryFromCounts(wl: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters in [1,16], got $iters")
    val wlM = wl.localCheckpoint(true)
    val n = wlM
      .unionByName(wlM.select(
        col("_j").as("_i"), col("_i").as("_j"), col("_w")))
      .groupBy("_i", "_j").agg(sum("_w").as("_n"))
      .localCheckpoint(true)
    val items = n.select("_i").distinct()
    val wins = items
      .join(wlM.groupBy("_i").agg(sum("_w").as("n_wins")), Seq("_i"), "left")
      .withColumn("n_wins", coalesce(col("n_wins"), lit(0L)))
      .localCheckpoint(true)
    val games = n.groupBy("_i").agg(sum("_n").as("n_games"))
    val pFinal = (1 to iters).foldLeft(
      items.withColumn("_p", lit(1.0)).localCheckpoint(true)) {
      (p, _) =>
        n.join(broadcast(p.select(col("_i"), col("_p").as("_pi"))), Seq("_i"))
          .join(broadcast(p.select(col("_i").as("_j"), col("_p").as("_pj"))),
            Seq("_j"))
          .groupBy("_i")
          .agg(sum(col("_n") / (col("_pi") + col("_pj"))).as("_den"))
          .join(broadcast(wins), Seq("_i"))
          .select(col("_i"),
            stableRound(col("n_wins") / col("_den"), 6).as("_p"))
          .localCheckpoint(true)
    }
    pFinal
      .crossJoin(broadcast(pFinal.agg(stableRound(sum("_p"), 6).as("_t"))))
      .join(broadcast(wins), Seq("_i"))
      .join(broadcast(games), Seq("_i"))
      .select(
        col("_i").as("item"), col("n_wins"), col("n_games"),
        stableRound(col("_p") / col("_t"), 6).as("bt_strength"))
  }

  /** Poisson(1) cumulative thresholds (P(X ≤ k), k = 0..8) as shortest-
    * round-trip decimal literals: both engines parse them to the same IEEE
    * double, so the weight `w = #{k : u ≥ c_k}` (≡ inverse-CDF sampling of
    * Poisson(1), truncated at 9 — P(X > 9) < 1.2e-6) is bit-identical. */
  private[operators] val PoissonCdf1: Seq[String] = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238462", "0.9963401531726562", "0.9994058151824182",
    "0.999916758850712", "0.9999897508033254", "0.9999988747974021")

  /** Resampling-free distributed bootstrap (the Poisson bootstrap of
    * Chamandy/Muralidharan/Najmi/Naidu, "Estimating uncertainty for massive
    * data streams", Google TR 2012): instead of drawing B resamples — a
    * shuffle of the corpus per replicate, unusable at 100 TB — every row
    * contributes an independent Poisson(1) WEIGHT to each of `replicates`
    * replicate means, computed inline from a content-derived uniform —
    * ONE md5 seed per row (`hash56(salt:id) mod 2³¹−1`), then per
    * replicate a counter-mixed Lehmer step
    * `u = 48271·(48271·((h+r) mod M) mod M) mod M / M`, `M = 2³¹−1`:
    * pure BIGINT add/mul/mod both engines execute identically (products
    * stay < 2⁴⁷ — no overflow, no wrap semantics to disagree on), so the
    * oracle replays every weight bit-for-bit at 1/R-th the hashing cost
    * (the md5-per-(row,r) form cost 114 s of single-column CPU at sf1 —
    * caught by the 10× soak). Layout/retry/AQE-independent throughout.
    * The N×R expansion never leaves
    * its map stage: explode + weight + partial aggregate fuse, so the only
    * shuffle is `groups × replicates` partial rows. Replicate means are
    * 6 dp-rounded BEFORE the quantile selection (order across engines is
    * then exact), and the CI is [[Quantiles.exactGrouped]] over the
    * replicate-mean frame — `groups × replicates` rows, never the corpus.
    *
    * Output: one row per group —
    * `(groupCols…, n, mean, ci_lo, ci_hi)` — `mean` the exact corpus mean
    * of `valueCol`, `ci_lo`/`ci_hi` the `(1±level)/2` bootstrap percentile
    * interval of the weighted replicate means, all 6 dp. Null values are
    * excluded; replicates whose total weight is 0 are dropped (probability
    * e^{−n} — a formality everywhere but empty groups). */
  /** The prepared bootstrap frame: group columns + `_pb_v` (double value) +
    * `_pb_h` (the per-row md5 seed, already reduced mod 2³¹−1). The
    * round-robin spread runs BEFORE the R-way explode: the expansion's
    * weight work runs where the input splits land, and a single-file input
    * would put all N×R evaluations on one task (caught by the 10× soak —
    * 114 s single-task straggler, median 0.02 s). One narrow exchange of
    * the corpus buys expansion parallelism independent of layout; output
    * is unaffected (weights are content-derived, folds commutative — the
    * d20 probe-spread precedent). */
  private def bootstrapBase(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCols: Seq[String], salt: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ col(valueCol).cast("double").as("_pb_v") :+
        // injective id encoding (round-14 advice): each component is
        // length-prefixed (`v<len>|<value>`, null → `n`), so id values
        // containing ':' — or null components, which concat_ws would
        // silently drop — cannot make distinct rows collide to one seed
        // and correlate their replicate weights. Mirrored in the oracle.
        concat_ws(":", lit(salt) +: idCols.map { c =>
          val s = col(c).cast("string")
          when(s.isNull, lit("n"))
            .otherwise(concat(lit("v"), length(s).cast("string"), lit("|"), s))
        }: _*)
          .as("_pb_id"): _*)
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      .withColumn("_pb_h", Dedup.hash56(col("_pb_id")) % lit(2147483647L))
      .drop("_pb_id")

  /** Per-(group, replicate) bootstrap partial sums over `df` — the
    * MERGEABLE state of the Poisson bootstrap (sums add across any data
    * split, which is what [[graft.streaming.StreamingBootstrap]] folds per
    * trigger): `(groupCols…, _pb_r, _pb_wv = Σ w·v, _pb_wn = Σ w,
    * _pb_sv = Σ v, _pb_cnt = rows)`. `_pb_sv`/`_pb_cnt` repeat the same
    * per-group totals on every replicate row (R-fold redundancy on a
    * groups×R-row frame — noise) so the point estimate folds through the
    * identical state. One pass: explode + weight + partial aggregate fuse
    * into the scan stage; shuffle = groups × replicates partial rows. */
  private[graft] def replicateSums(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCols: Seq[String], replicates: Int, salt: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(idCols.nonEmpty, "idCols must be non-empty (content identity)")
    require(replicates >= 2, s"need >= 2 replicates, got $replicates")
    val M = 2147483647L // 2^31 - 1 (Lehmer modulus; 48271·M < 2^47)
    val x0 = (col("_pb_h") + col("_pb_r")) % lit(M)
    val x1 = (lit(48271L) * x0) % lit(M)
    val x2 = (lit(48271L) * x1) % lit(M)
    val u = x2 / lit(M.toDouble)
    val w = PoissonCdf1
      .map(c => when(u >= lit(c.toDouble), 1L).otherwise(0L))
      .reduce(_ + _)
    bootstrapBase(df, groupCols, valueCol, idCols, salt)
      .withColumn("_pb_r",
        explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("_pb_w", w)
      .groupBy(groupCols.map(col) :+ col("_pb_r"): _*)
      .agg(sum(col("_pb_w") * col("_pb_v")).as("_pb_wv"),
        sum(col("_pb_w")).as("_pb_wn"),
        sum(col("_pb_v")).as("_pb_sv"),
        count(lit(1)).as("_pb_cnt"))
  }

  /** The CI readout over a [[replicateSums]]-shaped frame (batch or
    * accumulated streaming state): replicate means 6 dp-rounded, exact
    * grouped percentile interval, point mean/n from the redundant per-group
    * totals. Output: `(groupCols…, n, mean, ci_lo, ci_hi)`. */
  private[graft] def bootstrapEstimate(
      sums: DataFrame, groupCols: Seq[String], level: Double): DataFrame = {
    require(level > 0.0 && level < 1.0, s"level $level outside (0,1)")
    val gCols = groupCols.map(col)
    val pinned = sums.localCheckpoint(true) // groups × replicates rows;
    // the quantile selection + point join read it through three subtrees
    val reps = pinned
      .filter(col("_pb_wn") > 0L)
      .select(gCols :+
        stableRound(col("_pb_wv") / col("_pb_wn"), 6).as("_pb_mr"): _*)
    val alpha = (1.0 - level) / 2.0
    val ci = Quantiles.exactGrouped(reps, groupCols, "_pb_mr",
      Seq("ci_lo" -> alpha, "ci_hi" -> (1.0 - alpha)))
    val pt = pinned.filter(col("_pb_r") === 0)
      .select(gCols :+ col("_pb_cnt").as("n") :+
        stableRound(col("_pb_sv") / col("_pb_cnt"), 6).as("mean"): _*)
    pt.join(ci, groupCols)
      .select(gCols :+ col("n") :+ col("mean") :+
        stableRound(col("ci_lo"), 6).as("ci_lo") :+
        stableRound(col("ci_hi"), 6).as("ci_hi"): _*)
  }

  def poissonBootstrap(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCols: Seq[String], replicates: Int, salt: String,
      level: Double = 0.95): DataFrame =
    bootstrapEstimate(
      replicateSums(df, groupCols, valueCol, idCols, replicates, salt),
      groupCols, level)
}
