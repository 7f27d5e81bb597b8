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

  /** Keyed diff of two table snapshots — the CDC-audit inverse of
    * [[applyUpserts]] (that applies a delta; this recovers one): which keys
    * were `added`, `removed`, or `changed` between `before` and `after`?
    * Output: key columns + `status`; unchanged keys are dropped (at 100 TB
    * the overwhelmingly common case — the result is delta-sized, never
    * snapshot-sized). `compareCols` defaults to every shared non-key column;
    * comparison is null-safe per column (`<=>` — a null→value flip IS a
    * change, two nulls are not). Both inputs must be key-unique
    * ([[latestByKey]] output shape; duplicate keys make "changed" ambiguous
    * and are the caller's bug).
    *
    * Plan: ONE full outer join on the key (both sides hash-partitioned by
    * the same key — on bucketed/pre-partitioned snapshots written by
    * [[graft.sources.Sinks]] the exchanges vanish entirely), then a
    * per-row status expression. No window, no second pass. */
  def snapshotDiff(
      before: DataFrame, after: DataFrame,
      keys: Seq[String], compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff: no key columns")
    val shared = before.columns.toSet.intersect(after.columns.toSet)
    val cmp = if (compareCols.nonEmpty) compareCols
    else (before.columns.filter(shared.contains).filterNot(keys.contains)).toSeq
    require(cmp.forall(shared.contains),
      s"snapshotDiff: compare columns ${cmp.filterNot(shared.contains).mkString(", ")} missing from a side")
    val b = before.select((keys ++ cmp).map(c => col(c).as(s"_b_$c")): _*)
    val a = after.select((keys ++ cmp).map(c => col(c).as(s"_a_$c")): _*)
    val joinCond = keys.map(k => col(s"_b_$k") <=> col(s"_a_$k")).reduce(_ && _)
    // presence flags must survive rows that are all-null on one side: a
    // literal true per side, null only when the side is absent entirely
    val joined = b.withColumn("_b_present", lit(true))
      .join(a.withColumn("_a_present", lit(true)), joinCond, "full_outer")
    val changed =
      if (cmp.isEmpty) lit(false)
      else cmp.map(c => !(col(s"_b_$c") <=> col(s"_a_$c"))).reduce(_ || _)
    joined
      .withColumn("status",
        when(col("_b_present").isNull, lit("added"))
          .when(col("_a_present").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .where(col("status").isNotNull)
      .select(keys.map(k => coalesce(col(s"_a_$k"), col(s"_b_$k")).as(k))
        :+ col("status"): _*)
  }
}
