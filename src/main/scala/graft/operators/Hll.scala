package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketches as FIRST-CLASS relational state —
  * the 100 TB cardinality primitive (distinct users/tokens/keys per group
  * without ever shuffling the raw values), kept deliberately outside a
  * black-box aggregate: the sketch IS a small DataFrame of (group, bucket,
  * max-rank) registers, so it composes with everything else in the engine —
  * persist it, union it, max-fold it across days or micro-batches, estimate
  * whenever.
  *
  * North-star extension (not in the reference — the reference has no
  * approximate aggregate surface at all). Flajolet et al.'s HLL with the
  * standard small-range (linear counting) correction; hashing is the
  * engine-portable [[Dedup.hash56]] (md5-derived 56-bit), bucket = top `p`
  * bits, rank = leading-zero count of the remaining `56-p` bits + 1,
  * computed EXACTLY in both engines via the minimal-width binary string
  * (`bin`, identical Spark/DuckDB semantics) — no floating-point log2 on
  * the hot path, so a DuckDB oracle replays the registers and the estimate
  * bit-for-bit.
  *
  * Scale shape: [[registers]] is ONE map-side-combined (group, bucket)
  * max aggregate — shuffle ∝ groups × 2^p (register frames, never rows);
  * [[merge]] is a union + the same max aggregate (associative and
  * idempotent — sketch(A ∪ B) == merge(sketch(A), sketch(B)) EXACTLY,
  * which is what makes the sketch incrementally maintainable); [[estimate]]
  * folds each group's registers to one row. Nothing downstream of the
  * first aggregate ever touches the corpus.
  */
object Hll {

  private def checkP(p: Int): Unit =
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")

  /** Register frame for `valueCol` per `keys`: one row per (group,
    * non-empty bucket) with the max rank observed — `(keys*, _bucket,
    * _rank)`. Null values are excluded (the count-distinct convention).
    * Empty buckets are implicit (rank 0) and reconstructed by
    * [[estimate]]; an empty input yields an empty frame. */
  def registers(
      df: DataFrame, keys: Seq[String], valueCol: String, p: Int): DataFrame = {
    checkP(p)
    val w = 56 - p
    val h = Dedup.hash56(col(valueCol).cast("string"))
    // rank = w - bitlength(rest) + 1, bitlength via the minimal-width
    // binary string (strip the lone "0" bin() emits for zero); rest = 0
    // (all w bits zero) -> rank = w + 1, the same formula
    val rest = h.bitwiseAND(lit((1L << w) - 1L))
    val rank = lit(w + 1) -
      length(regexp_replace(bin(rest), "^0+", "")).cast("int")
    df.where(col(valueCol).isNotNull)
      .select(
        (keys.map(col) :+ shiftright(h, w).as("_bucket") :+
          rank.as("_rank")): _*)
      .groupBy((keys :+ "_bucket").map(col): _*)
      .agg(max("_rank").as("_rank"))
  }

  /** Max-fold two register frames (same keys/p): the HLL merge — exact,
    * associative, idempotent.
    *
    * CONTRACT: both frames must have been built by [[registers]] with the
    * SAME precision `p` — max-folding registers of different precisions
    * silently produces a meaningless sketch (buckets don't line up).
    * Pass `p` to enforce it: every row is plan-guarded to
    * `_bucket ∈ [0, 2^p)` and `_rank ∈ [1, 56−p+1]`. A FINER frame
    * (p' > p) is always caught — with more than a handful of values some
    * bucket necessarily exceeds `2^p−1`. A COARSER frame (p' < p) is
    * caught only when it carries a rank beyond the p-envelope (deep ranks
    * need ~2^(56−p) values per bucket), so the guard is a tripwire, not a
    * proof, in that direction — registers carry no per-row precision
    * fingerprint by design (the frame IS plain relational state). The
    * 3-arg form skips the guard for callers that already hold the
    * invariant structurally (e.g. both sides from one [[registers]] call
    * site). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keys :+ "_bucket").map(col): _*)
      .agg(max("_rank").as("_rank"))

  /** [[merge]] with the precision-compatibility guard (see contract
    * above). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String], p: Int): DataFrame = {
    checkP(p)
    val m = 1L << p
    val maxRank = 56 - p + 1
    def guarded(df: DataFrame): DataFrame = df.withColumn("_rank",
      when(
        col("_bucket") < 0 || col("_bucket") >= lit(m) ||
          col("_rank") < 1 || col("_rank") > lit(maxRank),
        raise_error(concat(
          lit(s"HLL merge precision mismatch: register (bucket="),
          col("_bucket").cast("string"), lit(", rank="),
          col("_rank").cast("string"),
          lit(s") is outside the p=$p envelope [0,$m) x [1,$maxRank]")))
          .cast("int"))
        .otherwise(col("_rank")))
    merge(guarded(a), guarded(b), keys)
  }

  /** Roll a register frame up to a coarser grouping (`toKeys` ⊂ the frame's
    * keys, possibly empty = the grand total): per surviving key set and
    * bucket, max of ranks — the idempotent HLL merge applied as ONE
    * aggregation over the register frame, never a corpus re-scan. This is
    * how a sketch-serving OLAP layer answers every cube level from the
    * finest cells (q93): register frames are cells × 2^p rows, so the
    * whole rollup is sketch-sized work. */
  def rollup(regs: DataFrame, toKeys: Seq[String]): DataFrame =
    regs.groupBy((toKeys :+ "_bucket").map(col): _*)
      .agg(max("_rank").as("_rank"))

  /** Fold a register frame to one row per group: `(keys*, hll_distinct)`,
    * the bias-corrected HLL estimate (6 dp): `E = α_m m² / Σ 2^{-M_j}`
    * (empty buckets contribute 2⁰), switched to linear counting
    * `m·ln(m/V)` when `E ≤ 2.5m` and V (empty buckets) > 0.
    *
    * The harmonic sum is folded as INTEGER-scaled terms `2^{w+1-rank}`
    * (exact BIGINT arithmetic, ≤ 2^56 total) instead of floating
    * `2^{-rank}`: FP addition is order-dependent, and a partition-order
    * difference at the `E ≤ 2.5m` branch boundary would flip the
    * correction — the integer fold makes the estimate bit-identical
    * across engines and shuffles. */
  def estimate(regs: DataFrame, keys: Seq[String], p: Int): DataFrame = {
    checkP(p)
    val m = 1 << p
    val w = 56 - p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    regs
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("_ne"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - _rank)")).as("_s"))
      .select(
        (keys.map(col) :+ {
          val v = (lit(m.toLong) - col("_ne")).cast("double")
          // denom = (m - ne)·2^{w+1} + Σ 2^{w+1-rank}, exact in BIGINT
          val denom = ((lit(m.toLong) - col("_ne")) * lit(1L << (w + 1)) +
            col("_s")).cast("double")
          val e = lit(alpha * m.toDouble * m * (1L << (w + 1)).toDouble) / denom
          stableRound(
            when(e <= lit(2.5 * m) && v > 0,
              lit(m.toDouble) * log(lit(m) / v)).otherwise(e), 6)
            .as("hll_distinct")
        }): _*)
  }

  /** [[registers]] + [[estimate]] in one call — the one-shot grouped
    * approximate distinct count. */
  def distinctSketch(
      df: DataFrame, keys: Seq[String], valueCol: String, p: Int): DataFrame =
    estimate(registers(df, keys, valueCol, p), keys, p)
}
