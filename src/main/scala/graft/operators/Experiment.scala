package graft.operators

import org.apache.spark.sql.DataFrame
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
}
