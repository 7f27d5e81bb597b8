package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}

import graft.sources.ManifestFileIndex

/** METADATA-ONLY aggregates over a manifest-pruned table (the round-16
  * verdict task 3 taken transparent): `GraftTable.aggregate` serves
  * COUNT/MIN/MAX from the manifest through an explicit API — this rule
  * serves the same answers to a PLAIN `spark.sql("SELECT COUNT(*),
  * MIN(c) FROM t")`, rewriting the whole-table aggregate to a
  * one-row [[LocalRelation]] at optimization time. This is Spark's own
  * `OptimizeMetadataOnlyQuery` idea (which covers partition columns
  * only) extended to every column the manifest carries exact stats for
  * — the Delta/Iceberg `SELECT COUNT(*)` fast path.
  *
  * Exactness contract: the manifest's per-file stats are exact and the
  * manifest covers exactly the files the SAME index serves to scans (a
  * file the manifest does not list is invisible to reads through this
  * index too — the documented "the manifest IS the table" contract, with
  * freshness gated at [[graft.sources.GraftTable.open]]). MIN/MAX are
  * null-aware for free: an all-null file carries null bounds, which the
  * manifest-level min/max ignore; `COUNT(c)` = n_rows − null count.
  *
  * Rewrites ONLY when every piece is provably servable; everything else
  * is left untouched (the conservatism direction of the whole pruning
  * family):
  *  - global aggregate (no GROUP BY) directly over the relation, or over
  *    a bare column projection of it — any Filter in between declines;
  *  - every aggregate is a non-DISTINCT, unfiltered `COUNT(lit)`,
  *    `COUNT(col)`, `MIN(col)`, or `MAX(col)` with `col` a bare
  *    attribute the manifest has stats for.
  *
  * Enabled per session by [[ManifestAggregates.install]] (done
  * automatically when a [[ManifestFileIndex]] table is constructed);
  * `spark.graft.manifestAgg=false` disables at runtime. Cost: the
  * totals are ONE job over the KB-sized manifest, computed lazily once
  * per index and cached — planner state, never the corpus. */
class ManifestAggRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.manifestAgg"

  private def enabled: Boolean =
    spark.conf.getOption(ConfKey).forall(_.toBoolean)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(groups, exprs, child, _) if groups.isEmpty =>
        indexOf(child).flatMap(rewrite(agg, exprs, _)).getOrElse(agg)
    }

  private def indexOf(p: LogicalPlan): Option[ManifestFileIndex] = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      indexOf(c)
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case m: ManifestFileIndex => Some(m)
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  /** Some(value) = servable (value may be null — an all-null MIN);
    * None = decline the whole rewrite. */
  private def serve(
      idx: ManifestFileIndex, fn: Expression): Option[Any] = fn match {
    case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case c: Count => c.children match {
          case Seq(l: Literal) =>
            Some(if (l.value == null) 0L else idx.totalRows)
          case Seq(a: AttributeReference) =>
            idx.colNulls(a.name).map(n => idx.totalRows - n)
          case _ => None
        }
        case Min(a: AttributeReference) => idx.colMin(a.name)
        case Max(a: AttributeReference) => idx.colMax(a.name)
        case _ => None
      }
    case _ => None
  }

  /** Substitute every aggregate in the output expression with its served
    * literal and EVALUATE the surrounding scalar tree (casts, aliases,
    * arithmetic — e.g. `CAST(MIN(d) AS STRING)`, which the optimizer
    * collapses INTO the aggregate list). Declines unless every aggregate
    * is servable and the remainder is a deterministic, attribute-free
    * scalar expression. */
  private def rewrite(
      agg: Aggregate, exprs: Seq[NamedExpression],
      idx: ManifestFileIndex): Option[LogicalPlan] = {
    var ok = true
    val served = exprs.map { ne =>
      val e = ne match { case Alias(c, _) => c; case other => other }
      val replaced = e.transformUp {
        case ae: AggregateExpression => serve(idx, ae) match {
          // Literal.create converts the EXTERNAL manifest value
          // (java.sql.Date, String, …) to Catalyst internal form
          case Some(v) => Literal.create(v, ae.dataType)
          case None => ok = false; ae
        }
      }
      if (!ok || replaced.exists(_.isInstanceOf[AggregateExpression]) ||
          replaced.references.nonEmpty || !replaced.deterministic) {
        ok = false; null
      } else replaced.eval(InternalRow.empty)
    }
    if (!ok) None
    else Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(served))))
  }
}

/** Session installer for [[ManifestAggRewrite]] — `extraOptimizations`
  * so a LIVE session gets the rule (no `withExtensions` rebuild
  * needed); idempotent. */
object ManifestAggregates {
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[ManifestAggRewrite]))
      spark.experimental.extraOptimizations =
        cur :+ new ManifestAggRewrite(spark)
  }
}
