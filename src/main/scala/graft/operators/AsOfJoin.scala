package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal point-lookup) join: for every left row, attach the payload
  * of the LATEST right row with the same key whose time is at-or-before the
  * left row's time. The batch analog of the reference's per-event "current
  * dimension state" lookup (`…/dodetl/stp/DataTransformer.scala:40-66` reads
  * the newest status row at the event's timestamp) and the standard
  * trade/quote, event/config-version primitive Spark lacks natively.
  *
  * Implementation is the scalable merge formulation, NOT a range join:
  * union both sides tagged, shuffle ONCE by key, sort within partitions by
  * (time, side-tag, payload), and carry the last non-null payload forward
  * with a running window. Cost is one exchange + one sort of |L|+|R| rows —
  * no (key, time-range) candidate explosion, no broadcast requirement, no
  * per-key driver loop, so it survives both a 100 TB fact side and a large
  * right side. (A BroadcastNestedLoop or inequality-join formulation expands
  * |L|×|R| per key before aggregating back down; this never materializes
  * more than the union.)
  *
  * Determinism: right rows that tie on (key, time) resolve to the greatest
  * payload struct (field-lexicographic, i.e. order `payload` columns by
  * tie-break significance). Left rows never shadow each other — they carry
  * null payloads and are excluded from the running `last(ignoreNulls)`.
  */
object AsOfJoin {

  private val T = "_graft_asof_t"
  private val TAG = "_graft_asof_tag"
  private val P = "_graft_asof_p"
  private val L = "_graft_asof_l"

  /** Left as-of join. Returns all `left` columns plus `payload` columns from
    * the matched right row (null when no right row is at-or-before).
    *
    * @param leftKeys  equi-join key columns on `left`
    * @param rightKeys matching key columns on `right` (positional)
    * @param leftTime  left event-time column (any orderable type; must be
    *                  comparable with `rightTime` — normalize units first)
    * @param payload   right columns to attach; also the tie-break order for
    *                  right rows sharing (key, time) — greatest wins
    * @param inclusive `true`: right rows at exactly the left time match
    *                  (at-or-before); `false`: strictly-before
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      inclusive: Boolean = true): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      s"key lists must be non-empty and equal length: $leftKeys vs $rightKeys")
    require(payload.nonEmpty, "payload columns must be non-empty")

    val keyNames = leftKeys.indices.map(i => s"_graft_asof_k$i")
    val pType = StructType(payload.map(c => right.schema(c)))
    val lType = StructType(left.schema.fields)

    val rSide = right.select(
      rightKeys.zip(keyNames).map { case (k, kn) => col(k).as(kn) } ++ Seq(
        col(rightTime).as(T),
        lit(0).as(TAG),
        struct(payload.map(col): _*).as(P),
        lit(null).cast(lType).as(L)): _*)

    val lSide = left.select(
      leftKeys.zip(keyNames).map { case (k, kn) => col(k).as(kn) } ++ Seq(
        col(leftTime).as(T),
        lit(1).as(TAG),
        lit(null).cast(pType).as(P),
        struct(left.columns.map(col): _*).as(L)): _*)

    // Inclusive: right sorts BEFORE left at equal time (tag 0 < 1), so an
    // exactly-simultaneous right row is visible to the left row. Exclusive
    // flips the tag order so the left row comes first and cannot see it.
    val tagOrder = if (inclusive) col(TAG).asc else col(TAG).desc
    val w = Window
      .partitionBy(keyNames.map(col): _*)
      .orderBy(col(T).asc, tagOrder, col(P).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rSide.unionByName(lSide)
      .withColumn(P, last(col(P), ignoreNulls = true).over(w))
      .filter(col(TAG) === 1)

    matched.select(
      col(s"$L.*") +: payload.map(c => col(s"$P.$c").as(c)): _*)
  }
}
