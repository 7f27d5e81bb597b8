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
}
