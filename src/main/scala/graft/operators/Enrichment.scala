package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension-enrichment joins (reference J1/J6: per-event point lookups into
  * dimension tables, `…/dodetl/stp/DataTransformer.scala:17-38`, fanned out in
  * parallel at `…/dodetl/stp/BeamStreamProcessor.scala:71-88`).
  *
  * The reference issues one H2 SQL lookup per event per dimension; here the
  * whole enrichment is a single declarative multi-join plan. No explicit
  * broadcast hint: AQE broadcasts dimensions that are actually small at
  * runtime and falls back to a shuffled join when they are not (a pinned
  * hint on a 100 TB dimension would OOM the driver). To shrink a large
  * dimension first, pre-filter it with [[OnDemand.semiFilter]] (the
  * reference's on-demand trick).
  */
object Enrichment {

  /** Left-outer enrich `fact` with selected columns of a small `dim`.
    * Missing dimension rows yield nulls, matching the reference's
    * missing-PO detection (`…/dodetl/stp/BeamStreamProcessor.scala:83`). */
  def leftEnrich(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      dimCols: Seq[String]): DataFrame = {
    val d = dim.select((dimKey +: dimCols).map(col): _*)
    fact.join(d, fact(factKey) === d(dimKey), "left").drop(d(dimKey))
  }

  /** Chain of left-outer hops (customer -> nation -> region style snowflake).
    * Each hop is (dim, factKey, dimKey, dimCols). */
  def dimChain(
      fact: DataFrame,
      hops: Seq[(DataFrame, String, String, Seq[String])]): DataFrame =
    hops.foldLeft(fact) { case (acc, (dim, fk, dk, cols)) =>
      leftEnrich(acc, dim, fk, dk, cols)
    }
}
