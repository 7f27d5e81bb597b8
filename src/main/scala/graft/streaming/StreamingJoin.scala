package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM interval join — the two-live-streams
  * correlation the rest of the streaming surface deliberately avoids
  * (dimension enrichment is stream-STATIC, [[StreamingAsOf]] keeps one
  * side as keyed state): impression↔click attribution, order↔shipment
  * matching, sensor↔alarm correlation — "pair each left event with the
  * right events for the same key within the next `maxLag`".
  *
  * This is the one operator family where Spark's own engine carries the
  * state for us, and the design work is entirely in the CONSTRAINTS that
  * make that state finite:
  *
  *  - both sides carry an event-time watermark (`watermarkDelay` of
  *    allowed disorder), and
  *  - the join condition bounds the two event times against each other
  *    (`right.ts ∈ [left.ts, left.ts + maxLag]`),
  *
  * so each side's buffered rows are dropped once the OTHER side's
  * watermark passes their last possible match — state per executor is
  * O(in-flight window × per-key rate), not O(stream history). Omitting
  * either constraint makes the state grow without bound, which is why
  * this wrapper refuses to build the join without them rather than
  * exposing raw `join` on two streams.
  *
  * Scale shape at 100 TB/day: both streams shuffle on `key` once (the
  * same exchange the batch interval join pays), matching is local to the
  * key partition, and AQE-less streaming skew is handled the usual way —
  * salt the key upstream if one key dominates. Left-outer emits the
  * unmatched left row (null right columns) only after the right watermark
  * passes `left.ts + maxLag`, i.e. when "no match" is FINAL — the
  * streaming analog of the batch anti-join arm.
  *
  * Output columns: left's columns (original names), then the right
  * stream's non-key columns prefixed `r_` (the key and both timestamps
  * already tell the whole story; the prefix keeps self-joins of one
  * stream against itself legal).
  *
  * Batch parity: called on two BATCH frames the same code degrades to a
  * plain interval equi-join (watermarks are no-ops on batch plans), which
  * is exactly the parity oracle StreamingJoinSpec pins.
  */
object StreamingJoin {

  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      maxLag: String, watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer").contains(joinType),
      s"intervalJoin supports inner | left_outer, got $joinType")
    require(leftTs != rightTs,
      "leftTs and rightTs must be distinct names (rename one side first)")
    val l = left.withWatermark(leftTs, watermarkDelay)
    // prefix the right side BEFORE the join so key/payload names never
    // collide (a post-join drop would be ambiguous on a self-join)
    val rPref = right.columns.foldLeft(right) { (df, c) =>
      if (c == key || c == rightTs) df else df.withColumnRenamed(c, s"r_$c")
    }
      .withColumnRenamed(key, "_r_key")
      .withWatermark(rightTs, watermarkDelay)
    val joined = l.join(
      rPref,
      col(key) === col("_r_key") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxLag"),
      joinType)
    joined.drop("_r_key")
  }
}
