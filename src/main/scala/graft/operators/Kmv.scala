package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** KMV / theta sketches — bottom-k minimum hash VALUES per set, the third
  * member of the sketch family and the one that answers what [[Hll]]
  * cannot: SET-OPERATION cardinalities. An HLL register frame can union
  * (max-fold) but never intersect; a KMV sketch is a uniform hash-space
  * SAMPLE of the distinct values, so two sketches intersect by joining
  * their samples below the shared threshold θ — "how many users appear in
  * BOTH event streams" over 100 TB without ever shuffling the raw values.
  * (Beyer et al., "On synopses for distinct-value estimation under
  * multiset operations", SIGMOD 2007; the Theta Sketch framework.)
  *
  * North-star extension (no reference analog). Everything is deterministic
  * and engine-portable: values hash through [[Dedup.hash56]] (md5-derived,
  * 56-bit, so H = 2^56), the sketch is the k SMALLEST distinct hashes —
  * an order statistic, not a random sample — and every estimate is a
  * single integer-ratio division (no FP accumulation anywhere), so a
  * DuckDB oracle replays sketch AND estimates bit-for-bit.
  *
  * Convention (mirrored exactly in SQL): θ = the largest RETAINED hash
  * (inclusive); a sketch holding fewer than k hashes IS its distinct set
  * (θ = H, estimates exact). Distinct estimate: `(k−1) · H / θ`;
  * intersection: join the two samples on hash — any common hash is
  * automatically ≤ θ* = min(θ_a, θ_b) — and scale `|common| · H / θ*`.
  *
  * Scale shape: [[sketch]] is one distinct-aggregate (map-side combined,
  * shuffle ∝ distinct hashes) finished by `TakeOrderedAndProject` (global
  * form) or the skew-safe two-pass [[TopK.perGroup]] (grouped form) —
  * each partition forwards at most k rows. Everything downstream touches
  * only k-row frames. */
object Kmv {

  /** Hash-space size: [[Dedup.hash56]] values are uniform in [0, 2^56). */
  val H: Long = 1L << 56

  private def checkK(k: Int): Unit =
    require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")

  /** The k smallest distinct value hashes per group: `(keys*, _h)`,
    * ascending within each group. Null values are excluded (the
    * count-distinct convention). */
  def sketch(
      df: DataFrame, keys: Seq[String], valueCol: String, k: Int): DataFrame = {
    checkK(k)
    val hashes = df.where(col(valueCol).isNotNull)
      .select((keys.map(col) :+
        Dedup.hash56(col(valueCol).cast("string")).as("_h")): _*)
      .distinct()
    if (keys.isEmpty) hashes.orderBy("_h").limit(k)
    else TopK.perGroup(hashes, keys, Seq(col("_h").asc), k).drop("rank")
  }

  /** Merge two sketches (same keys/k): the k smallest of the combined
    * samples — EXACTLY `sketch(A ∪ B)` (the k smallest hashes of A ∪ B
    * are all within the union of each side's k smallest), associative,
    * commutative and idempotent, which is what makes the sketch
    * incrementally maintainable ([[graft.streaming.StreamingKmv]]) and
    * union-estimable for free: `estimate(merge(a, b))` is the union
    * cardinality. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    checkK(k)
    val u = a.unionByName(b).distinct()
    if (keys.isEmpty) u.orderBy("_h").limit(k)
    else TopK.perGroup(u, keys, Seq(col("_h").asc), k).drop("rank")
  }

  /** Roll a sketch frame up to a coarser grouping (`toKeys` ⊂ the frame's
    * keys, possibly empty = the grand total): distinct union of the
    * constituent samples re-truncated to the k smallest per surviving
    * group — EXACTLY `sketch()` built directly at the coarse level (the
    * merge-exactness argument), in sketch-sized work. [[Hll.rollup]]'s
    * twin for the set-operation sketch, so a sketch-serving cube keeps
    * INTERSECTION estimates available at every level (q94). */
  def rollup(sk: DataFrame, toKeys: Seq[String], k: Int): DataFrame = {
    checkK(k)
    val u = sk.select((toKeys :+ "_h").map(col): _*).distinct()
    if (toKeys.isEmpty) u.orderBy("_h").limit(k)
    else TopK.perGroup(u, toKeys, Seq(col("_h").asc), k).drop("rank")
  }

  /** Fold a sketch to `(keys*, kmv_distinct)` (6dp): exact below k,
    * `(k−1) · H / θ` at capacity — one double division per group, no
    * accumulation. */
  def estimate(sk: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    checkK(k)
    sk.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"), max("_h").as("_th"))
      .select((keys.map(col) :+
        stableRound(
          when(col("_n") < k, col("_n").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(H.toDouble) / col("_th")),
          6).as("kmv_distinct")): _*)
  }

  /** Intersection-cardinality estimate of two sketches (same keys/k):
    * `(keys*, kmv_intersect)` (6dp) = `|samples in common| · H / θ*`,
    * θ* = min of the two (capacity-adjusted) thresholds. Groups present
    * on only one side estimate 0 (an empty intersection sample). */
  def intersectEstimate(
      a: DataFrame, b: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    checkK(k)
    def thOf(sk: DataFrame, alias: String): DataFrame =
      sk.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("_n"), max("_h").as("_mh"))
        .select((keys.map(col) :+
          when(col("_n") < k, lit(H)).otherwise(col("_mh")).as(alias)): _*)
    val joinKeys = keys :+ "_h"
    val common = a.join(b, joinKeys)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val thetas = (if (keys.isEmpty) thOf(a, "_ta").crossJoin(thOf(b, "_tb"))
                  else thOf(a, "_ta").join(thOf(b, "_tb"), keys))
    val joined = if (keys.isEmpty) thetas.crossJoin(common)
                 else thetas.join(common, keys, "left")
    joined.select((keys.map(col) :+
      stableRound(
        coalesce(col("_c"), lit(0L)).cast("double") * lit(H.toDouble) /
          least(col("_ta"), col("_tb")).cast("double"),
        6).as("kmv_intersect")): _*)
  }
}
