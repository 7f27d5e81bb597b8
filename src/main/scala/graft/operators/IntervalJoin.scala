package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap (temporal range) join + fact-grain clamp.
  *
  * Reference: each product event is joined against every EQUIPMENT_STATUS row
  * whose `[START_TIME, END_TIME)` overlaps the event interval for the same
  * equipment (`…/dodetl/stp/DataTransformer.scala:40-61`, SQL at `:46`), and
  * each match becomes one fact grain with the interval clamped to the
  * intersection (`…/dodetl/stp/DataTransformer.scala:63-100`, clamp `:79-87`).
  *
  * Interval columns are epoch-micros longs (engine convention, [[graft.Tables]]).
  * Spark plans the naive form as a broadcast nested-loop / broadcast hash join
  * with range predicates — fine while one side is small. At 100 TB use
  * [[IntervalJoin.overlapJoinBucketed]]: both sides explode into fixed-width
  * time buckets, turning the theta join into an equi-join on
  * `(keys, bucket)` that shuffles and parallelizes like any hash join.
  */
object IntervalJoin {

  private def overlapCond(
      left: DataFrame, right: DataFrame, equiKeys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String): Column =
    equiKeys
      .map(k => left(k) === right(k))
      .reduceOption(_ && _)
      .map(_ && left(lStart) < right(rEnd) && left(lEnd) > right(rStart))
      .getOrElse(left(lStart) < right(rEnd) && left(lEnd) > right(rStart))

  /** One output row per overlapping pair; duplicate equi-key columns from the
    * right side are dropped. Column names (other than equi-keys) must be
    * disjoint between the two sides. */
  def overlapJoin(
      left: DataFrame, right: DataFrame, equiKeys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String): DataFrame = {
    val joined = left.join(
      right, overlapCond(left, right, equiKeys, lStart, lEnd, rStart, rEnd))
    equiKeys.foldLeft(joined)((df, k) => df.drop(right(k)))
  }

  /** Exact floor division for epoch longs (`/` on Columns is double
    * division; `c - pmod(c, w)` is an exact multiple of `w`, so the quotient
    * is exact). */
  private def idiv(c: Column, w: Column): Column =
    ((c - pmod(c, w)) / w).cast("long")

  /** Scale path: explode each interval into the `bucketWidth`-sized time
    * buckets it covers, equi-join on (keys, bucket), and keep each matched
    * pair only in the bucket that contains `greatest(lStart, rStart)` so no
    * distinct/dedup shuffle is needed. Semantics identical to
    * [[overlapJoin]] (verified by property test). */
  def overlapJoinBucketed(
      left: DataFrame, right: DataFrame, equiKeys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val w = lit(bucketWidth)
    def withBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn(
        "_bucket",
        explode(sequence(idiv(col(s).cast("long"), w), idiv(col(e).cast("long") - 1, w))))
    val lb = withBuckets(left, lStart, lEnd)
    val rb = withBuckets(right, rStart, rEnd)
    val cond = (equiKeys.map(k => lb(k) === rb(k)) :+ (lb("_bucket") === rb("_bucket")))
      .reduce(_ && _) &&
      lb(lStart) < rb(rEnd) && lb(lEnd) > rb(rStart) &&
      lb("_bucket") === idiv(greatest(lb(lStart), rb(rStart)).cast("long"), w)
    val joined = lb.join(rb, cond)
    equiKeys
      .foldLeft(joined)((df, k) => df.drop(rb(k)))
      .drop(lb("_bucket")).drop(rb("_bucket"))
  }

  /** Clamp to the intersection: the reference's fact-grain interval
    * (`…/dodetl/stp/DataTransformer.scala:79-87`). */
  def clamped(
      joined: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      outStart: String = "fact_start", outEnd: String = "fact_end"): DataFrame =
    joined
      .withColumn(outStart, greatest(col(lStart), col(rStart)))
      .withColumn(outEnd, least(col(lEnd), col(rEnd)))
}
