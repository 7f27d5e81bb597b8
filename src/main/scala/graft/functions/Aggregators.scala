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

  /** Streaming-friendly moments buffer: count/sum/sumSq/min/max merge
    * associatively, so partial aggregation is exact. */
  final case class MomentsBuf(
      n: Long, sum: Double, sumSq: Double, min: Double, max: Double)

  /** Finalized per-group stats; `std` is the sample standard deviation
    * (n-1 denominator, matching `stddev_samp`). */
  final case class Moments(
      n: Long, mean: Double, std: Double, min: Double, max: Double)

  /** Mean / sample-std / min / max of a Double-valued field in one pass. */
  final class DoubleMoments[IN](f: IN => Double)
      extends Aggregator[IN, MomentsBuf, Moments] {
    override def zero: MomentsBuf =
      MomentsBuf(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: MomentsBuf, a: IN): MomentsBuf = {
      val v = f(a)
      MomentsBuf(b.n + 1, b.sum + v, b.sumSq + v * v,
        math.min(b.min, v), math.max(b.max, v))
    }
    override def merge(x: MomentsBuf, y: MomentsBuf): MomentsBuf =
      MomentsBuf(x.n + y.n, x.sum + y.sum, x.sumSq + y.sumSq,
        math.min(x.min, y.min), math.max(x.max, y.max))
    override def finish(b: MomentsBuf): Moments = {
      val mean = b.sum / b.n
      val variance =
        if (b.n < 2) Double.NaN
        else math.max(0.0, (b.sumSq - b.n * mean * mean) / (b.n - 1))
      Moments(b.n, mean, math.sqrt(variance), b.min, b.max)
    }
    override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Typed column form: `ds.groupByKey(...).agg(momentsOf[T](_.value))`. */
  def momentsOf[IN](f: IN => Double): TypedColumn[IN, Moments] =
    new DoubleMoments[IN](f).toColumn

  /** Untyped/SQL form over a Double column, for
    * `df.groupBy(...).agg(momentsUdaf(col("value")))` or
    * `spark.udf.register("moments", momentsUdaf)`. */
  val momentsUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new DoubleMoments[Double](identity), Encoders.scalaDouble)
}
