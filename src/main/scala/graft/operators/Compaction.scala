package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-writer-wins compaction and CDC upsert application.
  *
  * Reference: during a topic dump the latest Kafka offset per record key wins
  * (manual log compaction, `…/dodetl/imtu/InMemoryTableUpdater.scala:129-171`,
  * argmax at `:152-157`), and `MERGE INTO … KEY(ID)` applies newest-wins
  * upserts (`…/dodetl/imtu/DatabaseManager.scala:52-62`).
  *
  * Spark-first: one hash aggregation with `max_by(struct(*), ord)` — partial
  * (map-side) aggregation keeps the shuffle proportional to the number of
  * distinct keys, not the number of versions, which is exactly what makes
  * this hold up at 100 TB of CDC history.
  */
object Compaction {

  /** Keep, per key, the row with the maximum `ord` value. */
  def latestByKey(df: DataFrame, keys: Seq[String], ord: String): DataFrame = {
    val payload = df.columns.filterNot(keys.contains).map(col)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload: _*), col(ord)).as("_latest"))
      .select(keys.map(col) :+ col("_latest.*"): _*)
  }

  /** Apply a CDC batch to a snapshot: union then newest-wins per key.
    * Applying a batch twice is idempotent (same argmax). Both frames must
    * share the same schema including the `ord` column. */
  def applyUpserts(
      snapshot: DataFrame, updates: DataFrame,
      keys: Seq[String], ord: String): DataFrame =
    latestByKey(snapshot.unionByName(updates), keys, ord)

  /** Delete-by-key (reference K5/J5 eviction,
    * `…/dodetl/imtu/DatabaseManager.scala:161-167`). */
  def deleteKeys(snapshot: DataFrame, evicted: DataFrame, key: String): DataFrame =
    snapshot.join(evicted.select(key).distinct(), Seq(key), "left_anti")
}
