package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY §2.10): compile-checked custom
  * aggregations usable both as a `TypedColumn` on `Dataset[T]` and —
  * via `functions.udaf(...)` — as an untyped/SQL aggregate. The reference
  * has no pluggable aggregate interface (its folds are hard-coded loops,
  * `…/dodetl/stp/BeamStreamProcessor.scala:99-113`); this is the Spark-native
  * extension point a user would reach for.
  *
  * 100 TB: Aggregators compile to `TypedImperativeAggregate`-style partial
  * aggregation — map-side combine applies, shuffle volume ∝ groups, not
  * rows.
  */
object Aggregators {

  /** Welford/Chan central-moment buffer: (count, mean, M2) merges
    * ASSOCIATIVELY (Chan et al.'s pairwise update), so partial aggregation
    * is exact AND numerically stable — the naive `sumSq − n·mean²` one-pass
    * form cancels catastrophically on large-magnitude data (1000 values
    * near 1.7e15 gave std = 0.0 instead of 288.8). */
  final case class MomentsBuf(
      n: Long, mean: Double, m2: Double, min: Double, max: Double)

  /** Finalized per-group stats; `std` is the sample standard deviation
    * (n−1 denominator, matching `stddev_samp`; NaN for n < 2). Empty groups
    * finalize to `n = 0` with NaN mean/std/min/max — the double-typed
    * analog of SQL's NULL over empty input (the buffer's ±∞ sentinels never
    * leak). */
  final case class Moments(
      n: Long, mean: Double, std: Double, min: Double, max: Double)

  /** Mean / sample-std / min / max of a Double-valued field in one pass. */
  final class DoubleMoments[IN](f: IN => Double)
      extends Aggregator[IN, MomentsBuf, Moments] {
    override def zero: MomentsBuf =
      MomentsBuf(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: MomentsBuf, a: IN): MomentsBuf = {
      val v = f(a)
      val n = b.n + 1
      val delta = v - b.mean
      val mean = b.mean + delta / n
      MomentsBuf(n, mean, b.m2 + delta * (v - mean),
        math.min(b.min, v), math.max(b.max, v))
    }
    override def merge(x: MomentsBuf, y: MomentsBuf): MomentsBuf =
      if (x.n == 0) y
      else if (y.n == 0) x
      else {
        val n = x.n + y.n
        val delta = y.mean - x.mean
        MomentsBuf(
          n,
          x.mean + delta * y.n / n,
          x.m2 + y.m2 + delta * delta * x.n * y.n / n,
          math.min(x.min, y.min), math.max(x.max, y.max))
      }
    override def finish(b: MomentsBuf): Moments =
      if (b.n == 0) Moments(0L, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
      else Moments(
        b.n, b.mean,
        if (b.n < 2) Double.NaN else math.sqrt(math.max(0.0, b.m2 / (b.n - 1))),
        b.min, b.max)
    override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Typed column form: `ds.groupByKey(...).agg(momentsOf[T](_.value))`. */
  def momentsOf[IN](f: IN => Double): TypedColumn[IN, Moments] =
    new DoubleMoments[IN](f).toColumn

  /** Boxed-input wrapper for the SQL/DataFrame surface: a nullable Double
    * column deserializes to `java.lang.Double` with nulls preserved, and
    * nulls are SKIPPED like every built-in aggregate (a primitive-Double
    * encoder silently turns NULL into 0.0 and corrupts every statistic). */
  private object NullSkippingMoments
      extends Aggregator[java.lang.Double, MomentsBuf, Moments] {
    private val inner = new DoubleMoments[Double](identity)
    override def zero: MomentsBuf = inner.zero
    override def reduce(b: MomentsBuf, a: java.lang.Double): MomentsBuf =
      if (a == null) b else inner.reduce(b, a.doubleValue())
    override def merge(x: MomentsBuf, y: MomentsBuf): MomentsBuf = inner.merge(x, y)
    override def finish(b: MomentsBuf): Moments = inner.finish(b)
    override def bufferEncoder: Encoder[MomentsBuf] = inner.bufferEncoder
    override def outputEncoder: Encoder[Moments] = inner.outputEncoder
  }

  /** Untyped/SQL form over a (nullable) Double column, for
    * `df.groupBy(...).agg(momentsUdaf(col("value")))` or
    * `spark.udf.register("moments", momentsUdaf)`. */
  val momentsUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(NullSkippingMoments, Encoders.DOUBLE)
}
