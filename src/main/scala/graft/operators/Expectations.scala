package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality assertions — the ingest gate a pipeline runs on
  * every new source drop before the data is allowed near training (the
  * "expectation suite" pattern): each constraint evaluates to one result row
  * `(expectation, total, violations, pass)` over the WHOLE table, so the gate
  * is a handful of rows a scheduler can alert on, not a per-row annotation.
  * Extends the reference's per-row validity handling (NaN normalization at
  * the sink, `dod-etl/.../DatabaseOutputOperation.java`-era scope) into a
  * whole-table contract check.
  *
  * Plan shape, designed for 100 TB:
  *   - ALL row-level constraints ([[Expectations.NotNull]] / [[Expectations.InRange]] /
  *     [[Expectations.AcceptedValues]] / [[Expectations.MatchesRegex]]) fold into ONE
  *     aggregate pass — one scan of the pruned columns, one
  *     `sum(when(violated,1))` per constraint side by side, map-side
  *     combined to a single row. Adding a constraint adds an expression,
  *     never a pass.
  *   - each [[Expectations.Unique]] adds one keyed count (its own shuffle, map-side
  *     combined; violations = rows − distinct keys, computed from the
  *     grouped frame without a second scan).
  *   - each [[Expectations.RefIntegrity]] adds one broadcast left-anti probe over the
  *     key column only (dim side deduplicated then broadcast — the fact
  *     table never shuffles; for a non-broadcastable dim, pre-filter with
  *     [[BloomJoin]] the same way the on-demand joins do).
  * The per-kind single-row results are unioned — a union of 1-row frames,
  * not a data-sized plan.
  */
object Expectations {

  sealed trait Expectation { def name: String }

  /** `column` must be non-null on every row. */
  final case class NotNull(column: String) extends Expectation {
    val name = s"not_null($column)"
  }

  /** Non-null values of `column` must lie in [lo, hi] (inclusive; nulls are
    * [[NotNull]]'s business, not a range violation). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Expectation {
    require(lo <= hi, s"in_range: lo $lo > hi $hi")
    val name = s"in_range($column, $lo, $hi)"
  }

  /** Non-null values of `column` must be one of `values`. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Expectation {
    require(values.nonEmpty, "accepted_values: empty value set")
    val name = s"accepted_values($column)"
  }

  /** Non-null values of `column` must match `pattern` (Java regex,
    * unanchored — anchor explicitly with ^$ when needed). */
  final case class MatchesRegex(column: String, pattern: String)
      extends Expectation {
    val name = s"matches_regex($column)"
  }

  /** `columns` must be row-unique. Violations = surplus rows beyond one per
    * distinct key (null keys group like any other key, matching
    * GROUP BY / DISTINCT semantics on both engines). */
  final case class Unique(columns: Seq[String]) extends Expectation {
    require(columns.nonEmpty, "unique: no columns")
    val name = s"unique(${columns.mkString(", ")})"
  }

  /** Every non-null `column` value must exist in `dim.dimColumn` (null FK =
    * [[NotNull]]'s business). `dim` is deduplicated and broadcast. */
  final case class RefIntegrity(column: String, dim: DataFrame, dimColumn: String)
      extends Expectation {
    val name = s"ref_integrity($column -> $dimColumn)"
  }

  private def violatedCond(e: Expectation): Column = e match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      // a non-null value whose double cast FAILS is a violation, not a pass
      // — the gate must hold exactly when the column is most broken, never
      // wave garbage through. try_cast: under ANSI a plain cast would THROW
      // on the first bad value instead of counting it
      col(c).isNotNull &&
        (col(c).try_cast("double").isNull ||
          col(c).try_cast("double") < lo || col(c).try_cast("double") > hi)
    case AcceptedValues(c, vs) =>
      col(c).isNotNull && !col(c).cast("string").isin(vs: _*)
    case MatchesRegex(c, p) =>
      col(c).isNotNull && !col(c).cast("string").rlike(p)
    case other => throw new IllegalArgumentException(
      s"not a row-level expectation: ${other.name}")
  }

  /** Evaluate `expectations` against `df`. Output: one row per expectation,
    * `(expectation, total, violations, pass)` — `total` is always the table
    * row count, `pass = (violations == 0)`. Result order is undefined
    * (single-digit rows; sort downstream if needed).
    *
    * The shared row-level pass runs EAGERLY at call time (its result is one
    * row of counters, fetched to the driver so every per-constraint output
    * row is a literal instead of a re-scan of the shared aggregate — the
    * same 1-row-fetch pattern as [[Pca.fit]]); Unique/RefIntegrity branches
    * stay lazy in the returned plan. */
  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "expectations: empty suite")
    require(expectations.map(_.name).distinct.size == expectations.size,
      "expectations: duplicate constraint names")
    val spark = df.sparkSession

    val rowLevel = expectations.filter {
      case _: NotNull | _: InRange | _: AcceptedValues | _: MatchesRegex => true
      case _ => false
    }
    val uniques = expectations.collect { case u: Unique => u }
    val refs = expectations.collect { case r: RefIntegrity => r }

    // one aggregate pass: total + every row-level violation count side by
    // side — skipped entirely for a uniques-only suite (Unique derives its
    // own total; no constraint would consume this scan's result)
    val needsSharedPass = rowLevel.nonEmpty || refs.nonEmpty
    val one =
      if (needsSharedPass) {
        val aggs = count(lit(1)).as("_total") +:
          rowLevel.zipWithIndex.map { case (e, i) =>
            sum(when(violatedCond(e), 1L).otherwise(0L)).as(s"_v_$i")
          }
        df.agg(aggs.head, aggs.tail: _*).head()
      } else null
    val total = if (needsSharedPass) one.getLong(0) else 0L

    def literalRow(name: String, tot: Long, viol: Long): DataFrame =
      spark.range(1).select(
        lit(name).as("expectation"),
        lit(tot).as("total"),
        lit(viol).as("violations"))

    val rowLevelOut = rowLevel.zipWithIndex.map { case (e, i) =>
      // a violation sum over zero rows is null -> zero violations
      literalRow(e.name, total, if (one.isNullAt(i + 1)) 0L else one.getLong(i + 1))
    }

    val uniqueOut = uniques.map { u =>
      df.groupBy(u.columns.map(col): _*)
        .agg(count(lit(1)).as("_cnt"))
        .agg(
          coalesce(sum(col("_cnt")), lit(0L)).as("_rows"),
          count(lit(1)).as("_groups"))
        .select(
          lit(u.name).as("expectation"),
          col("_rows").as("total"),
          (col("_rows") - col("_groups")).as("violations"))
    }

    val refOut = refs.map { r =>
      df.select(col(r.column).as("_fk"))
        .where(col("_fk").isNotNull)
        .join(
          broadcast(r.dim.select(col(r.dimColumn).as("_fk")).distinct()),
          Seq("_fk"), "left_anti")
        .agg(count(lit(1)).as("_viol"))
        .select(
          lit(r.name).as("expectation"),
          lit(total).as("total"),
          col("_viol").as("violations"))
    }

    (rowLevelOut ++ uniqueOut ++ refOut)
      .reduce(_.unionAll(_))
      .withColumn("pass", col("violations") === 0L)
  }
}
