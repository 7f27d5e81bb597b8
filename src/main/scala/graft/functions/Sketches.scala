package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Approximate-aggregation surface for 100 TB-scale profiling: cardinality,
  * frequency, and quantile sketches.
  *
  * Why sketches and not exact aggregation: exact distinct/quantile over a
  * high-cardinality column shuffles every distinct value; a sketch is a
  * fixed-size, MERGEABLE summary — each executor folds its partition into
  * KBs of state, merges are associative, and (for HLL) summaries computed
  * over different days/sources union without re-reading the data. That
  * mergeability — not the RAM saving on one box — is what matters at
  * 1000 executors: re-aggregation moves KBs, not the column.
  *
  * Everything here wraps Spark built-ins (codegen'd / partial-aggregated);
  * the specs pin the advertised error bounds on real data. These are
  * deliberately NOT in the oracle set — approximate results don't
  * hash-compare across engines; the exact counterparts (e.g.
  * [[graft.operators.TextAnalysis.topTerms]]) are.
  */
object Sketches {

  /** Approximate distinct count (HyperLogLog++), relative error ≤ `rsd`.
    * One pass, fixed memory, partial-aggregates map-side. */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Apache DataSketches HLL state for `c` — the MERGEABLE form: persist per
    * partition/day/source, then [[hllUnionAgg]] + [[hllEstimate]] later.
    * `lgK` trades size for accuracy (2^lgK registers; 12 → ~1.6 KB,
    * ~2.2% RSE). */
  def hllAgg(c: Column, lgK: Int = 12): Column =
    hll_sketch_agg(c, lit(lgK))

  /** Merge HLL sketch states (e.g. daily sketches → monthly cardinality). */
  def hllUnionAgg(sketch: Column): Column = hll_union_agg(sketch)

  /** Distinct-count estimate from an HLL sketch state. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Approximate quantiles in one pass (Greenwald-Khanna style);
    * `accuracy` = 1/ε: rank error ≤ n/accuracy. */
  def approxQuantiles(
      c: Column, probabilities: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(
      c,
      array(probabilities.map(lit): _*),
      lit(accuracy))

  /** Count-min frequency sketch of `c`, queryable on the driver: point
    * lookups overestimate by at most ε·N with probability ≥ `confidence`
    * (never underestimate). Use for heavy-hitter screening when the exact
    * top-k ([[graft.operators.TextAnalysis.topTerms]]) would be run
    * repeatedly or the key space doesn't fit a hash agg. */
  def countMin(
      df: DataFrame, colName: String,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(colName, eps, confidence, seed)
}
