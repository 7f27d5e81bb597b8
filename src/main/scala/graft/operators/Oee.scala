package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OEE metric math (Overall Equipment Effectiveness), column-for-column from
  * the reference's `calculateOEE` (`…/dodetl/stp/DataTransformer.scala:102-141`):
  *
  *   splitFactor  = isOff ? 0 : factDuration / prodDuration
  *   prodFactor   = isOff ? 0 : prodDuration / plannedDuration
  *   performance  = splitFactor * (quantity / (prodFactor * plannedQuantity))
  *   availability = isOff ? 0 : 1
  *   quality      = isOutOfSpec ? 0 : 1
  *   oee          = performance * availability * quality
  *
  * Division edge cases deliberately mirror the reference: a zero duration or
  * quantity produces NaN/Infinity here, and NaN is only coerced to 0.0 at the
  * sink (`…/dodetl/utils/JDBCSink.scala:21`) via [[Oee.nanToZero]].
  * All expressions are plain Catalyst columns — whole-stage codegen applies.
  */
object Oee {

  /** Append PERFORMANCE / AVAILABILITY / QUALITY / OEE columns to a fact-grain
    * frame. Inputs are column expressions so callers can pass epoch-micros
    * longs or TimestampType-derived durations alike. */
  def withMetrics(
      grains: DataFrame,
      factStart: Column, factEnd: Column,
      prodStart: Column, prodEnd: Column,
      plannedStart: Column, plannedEnd: Column,
      quantity: Column, plannedQuantity: Column,
      statusType: Column, isOutOfSpec: Column): DataFrame = {
    val factDur = factEnd.cast("double") - factStart.cast("double")
    val prodDur = prodEnd.cast("double") - prodStart.cast("double")
    val plannedDur = plannedEnd.cast("double") - plannedStart.cast("double")
    val isOff = statusType.contains("OFF")
    val splitFactor = when(isOff, 0.0).otherwise(factDur / prodDur)
    val prodFactor = when(isOff, 0.0).otherwise(prodDur / plannedDur)
    val performance = splitFactor * (quantity / (prodFactor * plannedQuantity))
    val availability = when(isOff, 0.0).otherwise(1.0)
    val quality = when(isOutOfSpec, 0.0).otherwise(1.0)
    grains
      .withColumn("PERFORMANCE", performance)
      .withColumn("AVAILABILITY", availability)
      .withColumn("QUALITY", quality)
      .withColumn("OEE", performance * availability * quality)
  }

  /** Sink-side NaN coercion (reference `…/dodetl/utils/JDBCSink.scala:21`). */
  def nanToZero(c: Column): Column = nanvl(c, lit(0.0))
}
