package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch frequency registers as FIRST-CLASS relational state —
  * the 100 TB heavy-hitter primitive ([[Hll]]'s sibling: HLL answers "how
  * many distinct", CMS answers "how often does THIS value occur") kept
  * deliberately outside a black-box aggregate: the sketch IS a small
  * DataFrame of (group, hash-row, bucket, count) registers, so it composes
  * with everything else in the engine — persist it, sum-fold it across
  * days or micro-batches, probe it whenever, without ever re-touching the
  * corpus.
  *
  * North-star extension (not in the reference — the reference has no
  * approximate aggregate surface at all). Cormode–Muthukrishnan CMS:
  * `depth` independent hash rows of `width` buckets; update adds 1 to one
  * bucket per row; a point estimate is the MIN across rows — an
  * overestimate by construction (collisions only ever ADD), never an
  * underestimate. Hashing is the engine-portable [[Dedup.hash56]] over
  * `"row:value"` (md5-derived 56-bit), so a DuckDB oracle replays the
  * registers and every estimate bit-for-bit — integer arithmetic end to
  * end, no FP anywhere.
  *
  * Scale shape: [[registers]] is ONE map-side-combined aggregate — the
  * per-row explode multiplies map-side work by `depth` (small), but
  * shuffle is capped at groups × depth × width register rows, never
  * corpus rows; [[merge]] is a union + sum (associative and commutative —
  * `sketch(A ∪ B) == merge(sketch(A), sketch(B))` EXACTLY, which is what
  * makes the sketch incrementally maintainable; replay safety in a stream
  * comes from staged prefixes, not idempotence — see
  * [[graft.streaming.StreamingCms]]); [[estimate]] probes cost ∝
  * candidates × depth and join against the register frame, never the
  * corpus.
  */
object Cms {

  private def check(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    require(width >= 2 && width <= (1 << 20),
      s"width must be in [2, 2^20], got $width")
  }

  /** The bucket a value hits in hash row `row`: `hash56("row:value") mod
    * width` — one md5 per (row, value), engine-portable. */
  def bucketOf(row: Column, value: Column, width: Int): Column =
    pmod(
      Dedup.hash56(concat(row.cast("string"), lit(":"), value.cast("string"))),
      lit(width.toLong))

  /** Register frame for `valueCol` per `keys`: one row per (group,
    * hash-row, non-empty bucket) with its collision-summed count —
    * `(keys*, _row, _bucket, _cnt)`. Null values are excluded; empty
    * buckets are implicit (count 0) and reconstructed by [[estimate]];
    * an empty input yields an empty frame. */
  def registers(
      df: DataFrame, keys: Seq[String], valueCol: String,
      depth: Int, width: Int): DataFrame = {
    check(depth, width)
    df.where(col(valueCol).isNotNull)
      .select(
        (keys.map(col) :+ col(valueCol) :+
          explode(array((0 until depth).map(lit): _*)).as("_row")): _*)
      .select(
        (keys.map(col) :+ col("_row") :+
          bucketOf(col("_row"), col(valueCol), width).as("_bucket")): _*)
      .groupBy((keys ++ Seq("_row", "_bucket")).map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
  }

  /** Sum-fold two register frames (same keys/depth/width): the CMS merge —
    * exact, associative, commutative. NOT idempotent (counts add): folding
    * a sketch into itself doubles it — replay safety in incremental use
    * comes from the staged-prefix discipline, not from the algebra.
    * CONTRACT: both frames must share depth/width; like [[Hll.merge]],
    * register frames carry no per-row parameter fingerprint by design. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keys ++ Seq("_row", "_bucket")).map(col): _*)
      .agg(sum("_cnt").as("_cnt"))

  /** Roll a register frame up to a coarser grouping (`toKeys` ⊂ the
    * frame's keys, possibly empty = the grand total): per surviving key
    * set and (row, bucket), sum of counts — [[merge]] applied across all
    * of a coarse group's cells at once, EXACTLY the registers built
    * directly at the coarse level (the sum-fold is exact). The
    * frequency-sketch member of the cube family (q93 HLL / q94 KMV /
    * q95 KLL / q96 this): point estimates and the never-undercount
    * guarantee stay available at every rollup level from cells × depth ×
    * width rows of state. */
  def rollup(regs: DataFrame, toKeys: Seq[String]): DataFrame =
    regs.groupBy((toKeys ++ Seq("_row", "_bucket")).map(col): _*)
      .agg(sum("_cnt").as("_cnt"))

  /** Point-estimate each probe row's `valueCol` against the registers:
    * `(keys*, valueCol, cms_count)` with `cms_count = min` over hash rows
    * of the hit bucket's count (0 for a bucket the sketch never touched).
    * Probes are deduplicated per (group, value). Cost ∝ probes × depth;
    * the join keys on (group, row, bucket) so AQE broadcasts the small
    * side — the corpus is never touched. */
  def estimate(
      regs: DataFrame, probes: DataFrame, keys: Seq[String], valueCol: String,
      depth: Int, width: Int): DataFrame = {
    check(depth, width)
    val pr = probes
      .select((keys.map(col) :+ col(valueCol)): _*).distinct()
      .withColumn("_row", explode(array((0 until depth).map(lit): _*)))
      .withColumn("_bucket", bucketOf(col("_row"), col(valueCol), width))
    pr.join(regs, keys ++ Seq("_row", "_bucket"), "left")
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(min(coalesce(col("_cnt"), lit(0L))).as("cms_count"))
  }

  /** Q85 — CMS inner-product JOIN-CARDINALITY estimate (Alon–Gilbert–
    * Matias–Szegedy / Cormode–Muthukrishnan §4.2): for two sketches built
    * over the two join key columns with the SAME (depth, width), each hash
    * row's `Σ_bucket cntA·cntB` is an overestimate of the true equi-join
    * size `Σ_k fA(k)·fB(k)` (collisions only ever ADD — never an
    * underestimate), and the reported estimate is the MIN across rows,
    * with expected excess ≤ |A|·|B|/width per row. This is the plan-time
    * shuffle-sizing readout at 100 TB: the true join size of two
    * petabyte tables from two KB-sized register frames, no corpus touched
    * — the number that decides broadcast vs shuffle vs skew-salt before
    * any exchange is scheduled.
    *
    * Output: `(keys*, join_size_est)`. The product fold runs in
    * decimal(38,0) (two billion-row hot keys square past BIGINT); the
    * reported estimate is cast to BIGINT — exact to 9.2e18, beyond any
    * join an engine would survive anyway. Register frames carry no
    * parameter fingerprint ([[merge]]'s documented contract): the caller
    * owns depth/width agreement.
    *
    * Every depth row participates in the min (round-13 advice): a hash
    * row whose two sketches share NO non-empty bucket has inner product
    * 0 — the strongest possible evidence the true join size is ~0 — so
    * the bucket join is re-anchored on a per-(keys, _row) spine (one row
    * per depth row present in BOTH sketches, register-frame-sized) and
    * missing products coalesce to 0 instead of silently dropping out.
    * Disjoint key sets now estimate 0, never NULL and never a
    * collision-inflated min over the surviving rows. */
  def innerProduct(
      a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val wide = "decimal(38,0)"
    val rk = keys :+ "_row"
    val bb = b.select(
      (keys.map(col) :+ col("_row") :+ col("_bucket") :+
        col("_cnt").as("_cnt_b")): _*)
    val spine = a.select(rk.map(col): _*).distinct()
      .join(bb.select(rk.map(col): _*).distinct(), rk)
    val perRow = a.join(bb, keys ++ Seq("_row", "_bucket"))
      .groupBy(rk.map(col): _*)
      .agg(sum(col("_cnt").cast(wide) * col("_cnt_b").cast(wide)).as("_ip"))
    spine.join(perRow, rk, "left")
      .groupBy(keys.map(col): _*)
      .agg(min(coalesce(col("_ip"), lit(0).cast(wide)))
        .cast("long").as("join_size_est"))
  }
}
