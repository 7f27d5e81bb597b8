package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Opt-in optimizer rule: rewrite an interval-overlap theta join into a
  * range-bucketed equi-join (the logical-plan form of
  * [[graft.operators.IntervalJoin.overlapJoinBucketed]]).
  *
  * Why: Catalyst plans `l.s < r.e AND l.e > r.s` (plus any equi keys) as a
  * broadcast-nested-loop or per-key cross join — at 100 TB an O(n·m)
  * non-starter. Bucketing both sides by fixed-width time buckets turns it
  * into an equi-join on `(…, bucket)` that shuffles and parallelizes like
  * any hash join; the matched pair is kept only in the bucket containing
  * `greatest(l.s, r.s)`, so no dedup shuffle is introduced.
  *
  * Match conditions (all must hold, otherwise the join is left untouched):
  *  - inner join whose condition contains exactly one `l.s < r.e` and one
  *    `l.e > r.s` strict range conjunct pair over LongType attributes
  *    (flipped comparisons are normalized first). EXACTLY one of each: a
  *    further cross-side inequality (e.g. an `a.id < b.id` self-join dedup)
  *    makes the interval pairing ambiguous, and a wrong pairing would
  *    silently drop matches — the rule declines instead. Express such joins
  *    with [[graft.operators.IntervalJoin.overlapJoinBucketed]] directly;
  *  - the rule is enabled by setting `spark.graft.intervalJoin.bucketWidth`
  *    to a positive long (same unit as the interval columns). Opt-in because
  *    the rewrite assumes interval semantics (`start <= end`) the engine
  *    cannot verify statically.
  *
  * Register via [[graft.plans.GraftExtensions]]:
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class IntervalJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.intervalJoin.bucketWidth"

  private def bucketWidth: Option[Long] =
    spark.conf.getOption(ConfKey).map(_.toLong).filter(_ > 0)

  /** `(c - pmod(c, w)) / w` — exact floor division for longs. */
  private def idiv(c: Expression, w: Expression): Expression =
    IntegralDivide(Subtract(c, Pmod(c, w)), w)

  private def isLongAttr(e: Expression): Boolean =
    e.isInstanceOf[AttributeReference] && e.dataType == LongType

  override def apply(plan: LogicalPlan): LogicalPlan = bucketWidth match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(l, r, Inner, Some(cond), hint) =>
          rewrite(j, l, r, cond, hint, w).getOrElse(j)
      }
  }

  private def rewrite(
      j: Join, l: LogicalPlan, r: LogicalPlan, cond: Expression,
      hint: JoinHint, w: Long): Option[LogicalPlan] = {
    // Idempotence: optimizer batches run to FIXPOINT, so without this guard
    // the rule re-rewrites its own output every iteration (the rewritten
    // join's condition still contains the original range conjuncts),
    // compounding the bucket explosion until OOM.
    if (cond.references.exists(_.name.startsWith("_graft_bucket"))) return None
    val conjuncts = splitConjunctivePredicates(cond)

    // normalize strict comparisons to (leftSideExpr op rightSideExpr)
    sealed case class Range(le: Expression, re: Expression, isLess: Boolean)
    val ranges = conjuncts.flatMap {
      case LessThan(a, b) if a.references.subsetOf(l.outputSet) &&
        b.references.subsetOf(r.outputSet) => Some(Range(a, b, isLess = true))
      case GreaterThan(a, b) if b.references.subsetOf(l.outputSet) &&
        a.references.subsetOf(r.outputSet) => Some(Range(b, a, isLess = true))
      case GreaterThan(a, b) if a.references.subsetOf(l.outputSet) &&
        b.references.subsetOf(r.outputSet) => Some(Range(a, b, isLess = false))
      case LessThan(a, b) if b.references.subsetOf(l.outputSet) &&
        a.references.subsetOf(r.outputSet) => Some(Range(b, a, isLess = false))
      case _ => None
    }
    val less = ranges.filter(_.isLess)    // l.s < r.e
    val greater = ranges.filter(!_.isLess) // l.e > r.s
    if (less.size != 1 || greater.size != 1) return None
    val (lStart, rEnd) = (less.head.le, less.head.re)
    val (lEnd, rStart) = (greater.head.le, greater.head.re)
    if (!Seq(lStart, rEnd, lEnd, rStart).forall(isLongAttr)) return None
    if (lStart.semanticEquals(lEnd) || rStart.semanticEquals(rEnd)) return None

    val width = Literal(w, LongType)
    def explodeBuckets(child: LogicalPlan, s: Expression, e: Expression, name: String) = {
      val attr = AttributeReference(name, LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED until a
      // timeZoneId is set, even for long bounds
      val gen = Explode(new Sequence(
        idiv(s, width),
        idiv(Greatest(Seq(Subtract(e, Literal(1L, LongType)), s)), width),
        None,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)))
      (Generate(gen, Nil, outer = false, None, Seq(attr), child), attr)
    }
    val (lGen, lBucket) = explodeBuckets(l, lStart, lEnd, "_graft_bucket_l")
    val (rGen, rBucket) = explodeBuckets(r, rStart, rEnd, "_graft_bucket_r")

    // original condition stays (range preds verify within the bucket); add
    // bucket equality + containing-bucket dedup
    val newCond = And(
      And(cond, EqualTo(lBucket, rBucket)),
      EqualTo(lBucket, idiv(Greatest(Seq(lStart, rStart)), width)))
    val joined = Join(lGen, rGen, Inner, Some(newCond), hint)
    // drop the bucket columns so downstream operators see the original schema
    Some(Project(j.output, joined))
  }
}

/** Session extensions: the bucketing rule + the native kernels as SQL
  * functions (`SELECT long_array_agree(a, b)` etc. from `spark.sql`). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(spark =>
      new IntervalJoinRewrite(spark.asInstanceOf[SparkSession]))
    ext.injectOptimizerRule(spark =>
      new ManifestAggRewrite(spark.asInstanceOf[SparkSession]))
    graft.functions.ArrayKernels.registerSql(ext)
  }
}
