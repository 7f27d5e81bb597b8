package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** SCD Type-2 dimension historization from a CDC log — the history-keeping
    * upgrade of [[latestByKey]]/[[applyUpserts]] (A1/A3 keep only the
    * latest-wins snapshot; the reference's `MERGE INTO` upserts destroy
    * history outright, `…/dodetl/imtu/DatabaseManager.scala:52-62`). Per
    * key, CDC versions become half-open validity intervals:
    * `effective_from` = the version's timestamp, `effective_to` = the NEXT
    * version's timestamp (current rows open-ended, `effective_to` null,
    * `is_current` true), so a warehouse can answer "what did this dimension
    * row look like at time t" with an interval probe instead of replaying
    * the log.
    *
    * Contracts (all oracle-replayed in q87):
    *  - SAME-TIMESTAMP TIE-BREAK: rows sharing (keys, ts) collapse to ONE
    *    version — the greatest `struct(seqCol?, payload*, opCol?)` wins
    *    (lexicographic struct max, the [[latestByKey]] argmax family).
    *    Supply `seqCol` (the CDC offset) to make the winner the last
    *    writer; without it the greatest payload wins, which is exactly the
    *    [[AsOfJoin]] carry tie-break — that agreement is what makes
    *    as-of-joining this table reproduce `asOf` row-for-row (q87b).
    *    Tie-break columns must be non-null: engines disagree on null
    *    ordering inside DESC sorts, so null tie-breaks are the caller's
    *    portability bug.
    *  - DELETE TOMBSTONES: a CDC row whose `opCol` equals `deleteOp`
    *    CLOSES the previous interval at the tombstone's timestamp but opens
    *    none — a key whose last version is a delete has no current row, and
    *    a later re-insert opens a fresh interval, leaving the deleted gap
    *    uncovered.
    *
    * Plan shape: one map-side-combined argmax per (keys, ts) — shuffle ∝
    * distinct versions, not CDC rows — then a lead() window PARTITIONED BY
    * the key over the collapsed version log (rows per partition = versions
    * per dimension key, bounded by update cadence, never fact-table-sized;
    * no unpartitioned window anywhere). Both exchanges hash on the same
    * key prefix, so AQE coalesces them into one at scale. */
  def scd2(
      cdc: DataFrame, keys: Seq[String], tsCol: String,
      payload: Seq[String], seqCol: Option[String] = None,
      opCol: Option[String] = None, deleteOp: String = "D"): DataFrame =
    versionIntervals(collapseVersions(
      cdc, keys, tsCol, payload, seqCol, opCol), keys, tsCol, payload, opCol,
      deleteOp)

  /** [[scd2]] stage 1: collapse CDC rows to one winner per (keys, ts) —
    * greatest `struct(seqCol?, payload*, opCol?)`. Keeps every column the
    * interval pass needs (payload + op) inside `_w`. Associative and
    * idempotent over re-collapse (struct max), which is what lets the
    * streaming attach fold late batches into a staged version log and
    * replay batches without drift. */
  private[graft] def collapseVersions(
      cdc: DataFrame, keys: Seq[String], tsCol: String,
      payload: Seq[String], seqCol: Option[String],
      opCol: Option[String]): DataFrame = {
    require(keys.nonEmpty, "scd2: no key columns")
    require(payload.nonEmpty, "scd2: no payload columns")
    val ordCols = (seqCol.toSeq ++ payload ++ opCol.toSeq).distinct.map(col)
    cdc.groupBy((keys :+ tsCol).map(col): _*)
      .agg(max(struct(ordCols: _*)).as("_w"))
  }

  /** [[scd2]] stage 2: the keyed lead() pass over a collapsed version log
    * ((keys, ts)-unique rows carrying `_w`). Split from [[scd2]] so the
    * streaming attach can run it over ONLY the keys a batch touched. */
  private[graft] def versionIntervals(
      versions: DataFrame, keys: Seq[String], tsCol: String,
      payload: Seq[String], opCol: Option[String],
      deleteOp: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    val open = opCol match {
      case Some(o) => col(s"_w.$o") =!= lit(deleteOp)
      case None    => lit(true)
    }
    versions
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .where(open)
      .select(keys.map(col) ++
        payload.map(p => col(s"_w.$p").as(p)) ++ Seq(
          col(tsCol).as("effective_from"),
          col("effective_to"),
          col("effective_to").isNull.as("is_current")): _*)
  }
}
