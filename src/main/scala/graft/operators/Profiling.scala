package graft.operators

import org.apache.spark.sql.DataFrame
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
        stableRound(col("tp").cast("double") / col("_p"), 6).as("tpr"),
        stableRound(col("fp").cast("double") / col("_n"), 6).as("fpr"))

  /** Area under the ROC curve for score/label columns of `df`: trapezoid
    * rule over the [[rocSweep]] operating points with the implicit (0,0)
    * origin. One row out (`auc`, rounded 6 dp). No ordering window at
    * all: each threshold row already knows its own cumulative (tp, fp)
    * AND its per-threshold increments, so its trapezoid slice
    * `Δfpr · (tpr + tpr_prev)/2` is computable per row and the area is a
    * plain order-free aggregate. */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    sweepCounts(df, scoreCol, labelCol)
      .select(
        ((col("fp") - col("_neg")).cast("double") / col("_n")).as("_pf"),
        (col("fp").cast("double") / col("_n")).as("_f"),
        ((col("tp") - col("_pos")).cast("double") / col("_p")).as("_pt"),
        (col("tp").cast("double") / col("_p")).as("_t"))
      .agg(stableRound(
        sum((col("_f") - col("_pf")) * (col("_t") + col("_pt")) / 2), 6)
        .as("auc"))

  /** Shared sweep core: one row per distinct score with per-threshold
    * positive/negative increments (`_pos`/`_neg`), inclusive cumulative
    * confusion counts (`tp`/`fp`) by descending threshold, and broadcast
    * class totals (`_p`/`_n`). */
  private def sweepCounts(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df
      .groupBy(col(scoreCol).cast("double").as("threshold"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("_pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("_neg"))
    val totals = df.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("_p"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("_n"))
    Packing
      .globalRunningSums(
        perScore, Seq(col("threshold").desc),
        Seq("_pos" -> "tp", "_neg" -> "fp"))
      .crossJoin(broadcast(totals))
  }
}
