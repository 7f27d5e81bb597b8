package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's "on-demand" dynamic pruning, plus retention.
  *
  * On-demand (the DOD-ETL paper's core idea): only dimension rows whose join
  * key has actually appeared in the operational stream are materialized —
  * semantically `dim ⋉ distinct_keys(stream)`
  * (`…/dodetl/imtu/InMemoryTableUpdater.scala:142-146`, key registration
  * `…/dodetl/imtu/InMemoryTableUpdaterManager.scala:55-65`).
  *
  * At 100 TB this is the mechanism that replaces broadcast once dimensions
  * outgrow memory: a semi-join prune keyed on the observed fact keys (Spark
  * also derives runtime bloom/semi-join filters itself when
  * `spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled` is on).
  */
object OnDemand {

  /** `dim ⋉ keys`: keep dimension rows whose `dimKey` appears in
    * `keys(keyCol)` (reference F1/J4). */
  def semiFilter(dim: DataFrame, keys: DataFrame, dimKey: String, keyCol: String): DataFrame =
    dim.join(
      keys.select(col(keyCol).as(dimKey)).distinct(),
      Seq(dimKey), "left_semi")

  /** `dim ▷ keys`: rows whose key does NOT appear (reference J5 eviction /
    * K5 delete, `…/dodetl/imtu/InMemoryTableUpdater.scala:90-103`). */
  def antiFilter(dim: DataFrame, keys: DataFrame, dimKey: String, keyCol: String): DataFrame =
    dim.join(
      keys.select(col(keyCol).as(dimKey)).distinct(),
      Seq(dimKey), "left_anti")

  /** Retention: keep rows whose event time lies within `horizon` of the
    * observed maximum (reference F2, stubbed in the original at
    * `…/dodetl/imtu/InMemoryTableUpdater.scala:49-57`; intent documented at
    * `:75`). `tsCol` is epoch-micros; `horizon` in the same unit. The max is
    * a one-row broadcast, so this stays a single scan at any scale. */
  def retainWithin(df: DataFrame, tsCol: String, horizon: Long): DataFrame = {
    val mx = df.agg(max(col(tsCol)).as("_mx"))
    df.crossJoin(broadcast(mx))
      .filter(col(tsCol) >= col("_mx") - lit(horizon))
      .drop("_mx")
  }
}
