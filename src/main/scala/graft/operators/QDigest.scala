package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q-digest quantile sketches as FIRST-CLASS relational state — the fourth
  * member of the engine's sketch family (HLL distinct [[Hll]], CMS frequency
  * [[Cms]], KMV set-ops [[Kmv]], and now quantiles), and the 100 TB
  * percentile primitive [[TopK.hashSample]]-based q64 cannot be: day-over-day
  * MERGEABLE and streaming-foldable. The sketch IS a small DataFrame of
  * `(group, _node, _cnt)` registers over a heap-numbered binary tree on a
  * quantized value universe, so it composes with everything else in the
  * engine — persist it, union it, fold it across days or micro-batches,
  * estimate whenever.
  *
  * North-star extension (not in the reference — the reference has no
  * approximate aggregate surface at all; reference analytics stop at H2 SQL
  * aggregates, `dod-etl/.../imtu/InMemoryTableUpdater.scala:141-171`).
  * Design follows Shrivastava et al.'s q-digest (SenSys'04) with one
  * deliberate deviation: compression is a DETERMINISTIC pure function of the
  * register multiset (level-by-level bottom-up, merge-into-parent iff the
  * family total `cnt(left)+cnt(right)+cnt(parent) ≤ ⌊n/k⌋`), not a
  * traversal-order-dependent heuristic — so ANY engine replaying the rule
  * over the same counts produces bit-identical registers, which is what lets
  * a DuckDB oracle replay build, merge AND estimate exactly. Everything on
  * the hot path is integer arithmetic (counts, node ids, shifts); doubles
  * appear only in the per-row quantization affine map and the final value
  * reconstruction, both mirrored term-for-term in the generated SQL.
  *
  * Universe: values quantized to `2^bits` equal cells of `[lo, hi)` (out-of-
  * range values clamp to the edge cells — declared, not an error: a 100 TB
  * ingest always has a stray outlier and a sketch must absorb it). Cell
  * width `(hi-lo)/2^bits` is a VALUE-resolution floor; the sketch's own
  * guarantee is on RANK: after any sequence of [[merge]]s, the reported
  * quantile's true rank is within `bits · Σᵢ ⌊nᵢ/k⌋` of the target rank
  * (one `⌊nᵢ/k⌋` family per tree level per constituent build — the
  * mergeable-summaries additive-slack argument), plus the mass of the
  * reported cell (CDF granularity, not sketch error). Size ≤ 3k nodes per
  * group regardless of n.
  *
  * Scale shape: [[leafCounts]] is ONE map-side-combined aggregate — shuffle
  * ∝ groups × 2^bits (register frames, never rows); [[compress]] operates on
  * that bounded frame (`bits` window+fold rounds over ≤ groups × 2^bits
  * rows — corpus-size-independent); [[merge]] is a union + count sum +
  * recompress. Nothing downstream of the first aggregate ever touches the
  * corpus. The per-group estimate window orders ≤ 3k sketch rows, never
  * data rows.
  */
object QDigest {

  private def checkBits(bits: Int): Unit =
    require(bits >= 2 && bits <= 20, s"bits must be in [2, 20], got $bits")

  private def check(bits: Int, k: Int): Unit = {
    checkBits(bits)
    require(k >= 8, s"k must be >= 8, got $k")
  }

  /** The quantization affine map: value → leaf cell index in `[0, 2^bits)`,
    * clamped. Mirror in SQL via [[leafIndexSql]]. */
  def leafIndex(value: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val m = (1L << bits).toDouble
    val raw = floor(((value.cast("double") - lit(lo)) * lit(m)) / lit(hi - lo))
    least(greatest(raw, lit(0L)), lit((1L << bits) - 1L))
  }

  /** Uncompressed register frame: one row per (group, occupied leaf node)
    * with its exact count — `(keys*, _node, _cnt)`. Leaf node ids are
    * `2^bits + cell` (heap numbering: root 1, children of i are 2i, 2i+1).
    * Nulls are excluded; an empty input yields an empty frame. Frame size
    * ≤ groups × 2^bits rows — bounded by the universe, never the corpus. */
  def leafCounts(
      df: DataFrame, keys: Seq[String], valueCol: String,
      lo: Double, hi: Double, bits: Int): DataFrame = {
    checkBits(bits)
    df.where(col(valueCol).isNotNull)
      .select((keys.map(col) :+
        (lit(1L << bits) + leafIndex(col(valueCol), lo, hi, bits))
          .as("_node")): _*)
      .groupBy((keys :+ "_node").map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
  }

  /** The per-group compression recurrence, evaluated locally: for depth
    * d = bits..1, a sibling pair folds into its parent iff
    * `cnt(left)+cnt(right)+cnt(parent) ≤ ⌊n/k⌋`. Families at one level are
    * DISJOINT, so within-level order is irrelevant — the result is a pure
    * function of the input multiset, bit-identical to the unrolled
    * relational form the DuckDB oracle replays ([[compressChainSql]]). */
  private def compressLocal(
      pairs: Seq[(Long, Long)], bits: Int, k: Int): Seq[(Long, Long)] = {
    val cnt = scala.collection.mutable.LongMap.empty[Long]
    pairs.foreach { case (nd, c) => cnt(nd) = cnt.getOrElse(nd, 0L) + c }
    val n = pairs.iterator.map(_._2).sum
    val thr = n / k
    var d = bits
    while (d >= 1) {
      val lo = 1L << d
      val hi = 1L << (d + 1)
      val parents =
        cnt.keys.iterator.filter(nd => nd >= lo && nd < hi)
          .map(_ >> 1).toArray.distinct
      parents.foreach { p =>
        val cc = cnt.getOrElse(2 * p, 0L) + cnt.getOrElse(2 * p + 1, 0L)
        if (cc > 0 && cc + cnt.getOrElse(p, 0L) <= thr) {
          cnt(p) = cnt.getOrElse(p, 0L) + cc
          cnt.remove(2 * p)
          cnt.remove(2 * p + 1)
        }
      }
      d -= 1
    }
    cnt.toSeq.sortBy(_._1)
  }

  /** Deterministic bottom-up compression to ≤ 3k nodes per group: the
    * [[compressLocal]] recurrence applied per group. A pure function of the
    * register multiset: order- and partitioning-independent, hence
    * cache/AQE/retry-safe and engine-replayable. Input may hold nodes at
    * any depth (the [[merge]] path), not just leaves.
    *
    * Physical shape — a DELIBERATE one-UDF exception to the
    * functions-not-UDFs rule, with the justification the rule demands:
    * per-group state here is bounded by the UNIVERSE (≤ 2^bits occupied
    * leaves + their ancestors), never by the corpus, so one keyed
    * `collect_list` fold holds ≤ 2^{bits+1} integer pairs per group —
    * while the fully relational unroll (kept verbatim in the generated
    * oracle SQL) costs `bits` window exchanges + `bits` aggregates PER
    * EVALUATION, ~50 scheduler round-trips of a kilobyte-sized frame
    * (measured 8.5 s of pure stage latency for q74's three chains at
    * sf0.01, data-size-independent). The kernel is integer arithmetic on
    * ≤ 4096-entry maps — microseconds per group — and runs once per group,
    * not per row, so codegen is irrelevant to it. */
  def compress(regs: DataFrame, keys: Seq[String], bits: Int, k: Int): DataFrame = {
    check(bits, k)
    val kernel = udf((rs: Seq[org.apache.spark.sql.Row]) =>
      compressLocal(rs.map(r => (r.getLong(0), r.getLong(1))), bits, k))
    regs
      .groupBy(keys.map(col): _*)
      .agg(collect_list(struct(col("_node"), col("_cnt"))).as("_rs"))
      .select((keys.map(col) :+ explode(kernel(col("_rs"))).as("_e")): _*)
      .select((keys.map(col) :+ col("_e._1").as("_node") :+
        col("_e._2").as("_cnt")): _*)
  }

  /** [[leafCounts]] + [[compress]]: the one-shot sketch build. */
  def registers(
      df: DataFrame, keys: Seq[String], valueCol: String,
      lo: Double, hi: Double, bits: Int, k: Int): DataFrame =
    compress(leafCounts(df, keys, valueCol, lo, hi, bits), keys, bits, k)

  /** Merge two sketches built over the SAME (lo, hi, bits) universe: sum
    * counts per node, recompress against the combined total. Exact in the
    * sketch sense — the result is a valid q-digest of the union whose rank
    * slack is the SUM of the constituents' slacks (≤ bits·Σ⌊nᵢ/k⌋); total
    * count is preserved bit-exactly. Deterministic given the two inputs
    * (NOT structurally associative — (a⊕b)⊕c and a⊕(b⊕c) are both valid
    * sketches of a∪b∪c but may compress differently; every ordering
    * satisfies the declared bound, which is what mergeability means here). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String], bits: Int, k: Int): DataFrame =
    compress(
      a.unionByName(b)
        .groupBy((keys :+ "_node").map(col): _*)
        .agg(sum(col("_cnt")).as("_cnt")),
      keys, bits, k)

  /** Fold a register frame to one row per group with, per requested
    * quantile `(name, q)`: `name` = the reconstructed value (6 dp) and
    * `name_leaf` = the reporting node's upper leaf cell (an exact integer —
    * the hash-checkable register-level answer), plus the group total `n`.
    *
    * Rule (deterministic): nodes sorted post-order (upper cell asc, lower
    * cell desc — smaller ranges before enclosing ones), counts accumulated;
    * the first node whose running total reaches `⌈q·n⌉` reports, and the
    * value is the UPPER edge of its range: `lo + (leaf+1)·(hi-lo)/2^bits`
    * (the true quantile is ≤ this edge, within the declared rank slack).
    * The window orders ≤ 3k sketch rows per group — never corpus rows. */
  def estimate(
      regs: DataFrame, keys: Seq[String], bits: Int,
      lo: Double, hi: Double, qs: Seq[(String, Double)]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(qs.nonEmpty, "qs must be non-empty")
    qs.foreach { case (n, q) =>
      require(q > 0.0 && q <= 1.0, s"quantile $n=$q outside (0,1]") }
    val m = (1L << bits).toDouble
    val depth =
      (length(regexp_replace(bin(col("_node")), "^0+", "")) - lit(1))
        .cast("int")
    val ann0 = regs.withColumn("_depth", depth)
      .withColumn("_base", expr("shiftleft(CAST(1 AS BIGINT), _depth)"))
      .withColumn("_span", expr(s"shiftleft(CAST(1 AS BIGINT), $bits - _depth)"))
    val ann = ann0
      .withColumn("_upper",
        (col("_node") - col("_base") + lit(1L)) * col("_span") - lit(1L))
      .withColumn("_lower", (col("_node") - col("_base")) * col("_span"))
      .withColumn("_n",
        sum(col("_cnt")).over(Window.partitionBy(keys.map(col): _*)))
      .withColumn("_cum",
        sum(col("_cnt")).over(
          Window.partitionBy(keys.map(col): _*)
            .orderBy(col("_upper").asc, col("_lower").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perQ = qs.map { case (name, q) =>
      val r = ceil(lit(q) * col("_n")).cast("long")
      ann.where(col("_cum") >= r)
        .groupBy(keys.map(col): _*)
        .agg(min(struct(col("_upper"), (-col("_lower")).as("_nl"),
          col("_n").as("_gn"))).as("_pick"))
        .select((keys.map(col) :+ col("_pick._gn").as("n") :+
          col("_pick._upper").as(s"${name}_leaf") :+
          stableRound(
            lit(lo) + (col("_pick._upper") + lit(1L)).cast("double") *
              lit(hi - lo) / lit(m), 6).as(name)): _*)
    }
    perQ.reduce((a, b) => a.join(b.drop("n"), keys))
  }

  // ── generated DuckDB oracle fragments (house pattern: Layout.zValueSql) ──

  private def dbl(x: Double): String = s"CAST('${x}' AS DOUBLE)"

  /** SQL mirror of [[leafIndex]] — term-for-term the same IEEE double
    * expression tree, so floor lands identically. */
  def leafIndexSql(valueExpr: String, lo: Double, hi: Double, bits: Int): String = {
    val m = (1L << bits).toDouble
    s"LEAST(GREATEST(CAST(FLOOR(((CAST($valueExpr AS DOUBLE) - ${dbl(lo)}) * ${dbl(m)}) / ${dbl(hi - lo)}) AS BIGINT), 0), ${(1L << bits) - 1})"
  }

  private def kcols(keys: Seq[String]): String = keys.mkString(", ")
  private def kpart(keys: Seq[String]): String =
    if (keys.isEmpty) "" else keys.mkString("PARTITION BY ", ", ", "")

  /** CTE chain replaying [[compress]] over `inCte` (columns: keys, _node,
    * _cnt). Emits `${p}n, ${p}${bits}..${p}1`; the final compressed frame is
    * `${p}1`. */
  def compressChainSql(
      inCte: String, keys: Seq[String], bits: Int, k: Int, p: String): String = {
    val kc = if (keys.isEmpty) "" else kcols(keys) + ", "
    val init =
      s"""${p}n AS MATERIALIZED (SELECT $kc _node, _cnt,
         |          SUM(_cnt) OVER (${kpart(keys)}) AS _n FROM $inCte)""".stripMargin
    val levels = (bits to 1 by -1).map { d =>
      val loId = 1L << d
      val hiId = 1L << (d + 1)
      val prev = if (d == bits) s"${p}n" else s"${p}${d + 1}"
      val famCase =
        s"""CASE WHEN _node >= $loId AND _node < $hiId THEN _node // 2
           |     WHEN _node >= ${loId >> 1} AND _node < $loId THEN _node
           |     ELSE -_node END""".stripMargin
      val partBy = (keys :+ famCase).mkString(", ")
      s"""${p}$d AS MATERIALIZED (
         |  SELECT $kc _node, CAST(SUM(_cnt) AS BIGINT) AS _cnt, MAX(_n) AS _n
         |  FROM (SELECT $kc
         |          CASE WHEN _node >= $loId AND _node < $hiId AND _famtot <= _n // $k
         |               THEN _node // 2 ELSE _node END AS _node, _cnt, _n
         |        FROM (SELECT $kc _node, _cnt, _n,
         |                SUM(_cnt) OVER (PARTITION BY $partBy) AS _famtot
         |              FROM $prev))
         |  GROUP BY $kc _node)""".stripMargin
    }
    (init +: levels).mkString(",\n")
  }

  /** CTE chain replaying [[registers]] from `srcSql` (any SELECT producing
    * the keys and `valueExpr`). Final frame: `${p}1`. */
  def buildSql(
      srcSql: String, keys: Seq[String], valueExpr: String,
      lo: Double, hi: Double, bits: Int, k: Int, p: String): String = {
    val kc = if (keys.isEmpty) "" else kcols(keys) + ", "
    val leaf =
      s"""${p}leaf AS MATERIALIZED (
         |  SELECT $kc ${1L << bits} + ${leafIndexSql(valueExpr, lo, hi, bits)} AS _node,
         |         COUNT(*) AS _cnt
         |  FROM ($srcSql) WHERE $valueExpr IS NOT NULL
         |  GROUP BY $kc ${1L << bits} + ${leafIndexSql(valueExpr, lo, hi, bits)})""".stripMargin
    leaf + ",\n" + compressChainSql(s"${p}leaf", keys, bits, k, p)
  }

  /** CTE chain replaying [[merge]] of two compressed frames. Final frame:
    * `${p}1`. */
  def mergeSql(
      aCte: String, bCte: String, keys: Seq[String], bits: Int, k: Int,
      p: String): String = {
    val kc = if (keys.isEmpty) "" else kcols(keys) + ", "
    val u =
      s"""${p}u AS MATERIALIZED (SELECT $kc _node, CAST(SUM(_cnt) AS BIGINT) AS _cnt FROM
         |  (SELECT * FROM $aCte UNION ALL SELECT * FROM $bCte)
         |  GROUP BY $kc _node)""".stripMargin
    u + ",\n" + compressChainSql(s"${p}u", keys, bits, k, p)
  }

  /** CTE chain replaying [[estimate]] over compressed frame `inCte`. Emits
    * `${p}ann` plus one `${p}_<name>` CTE per quantile with columns
    * `(keys*, n, <name>_leaf, <name>)`. */
  def estimateSql(
      inCte: String, keys: Seq[String], bits: Int, lo: Double, hi: Double,
      qs: Seq[(String, Double)], p: String): String = {
    val m = (1L << bits).toDouble
    val kc = kcols(keys) + ", "
    val ann =
      s"""${p}ann AS MATERIALIZED (
         |  SELECT $kc _node, _cnt,
         |         (_node - (CAST(1 AS BIGINT) << _depth) + 1) * (CAST(1 AS BIGINT) << ($bits - _depth)) - 1 AS _upper,
         |         (_node - (CAST(1 AS BIGINT) << _depth)) * (CAST(1 AS BIGINT) << ($bits - _depth)) AS _lower
         |  FROM (SELECT $kc _node, _cnt,
         |          CAST(length(regexp_replace(bin(_node), '^0+', '')) - 1 AS INTEGER) AS _depth
         |        FROM $inCte)),
         |${p}cum AS MATERIALIZED (
         |  SELECT $kc _node, _cnt, _upper, _lower,
         |         SUM(_cnt) OVER (${kpart(keys)}) AS _n,
         |         SUM(_cnt) OVER (${kpart(keys)} ORDER BY _upper ASC, _lower DESC ROWS UNBOUNDED PRECEDING) AS _cum
         |  FROM ${p}ann)""".stripMargin
    val perQ = qs.map { case (name, q) =>
      s"""${p}_$name AS MATERIALIZED (
         |  SELECT $kc CAST(_n AS BIGINT) AS n, _upper AS ${name}_leaf,
         |         ROUND(${dbl(lo)} + CAST(_upper + 1 AS DOUBLE) * ${dbl(hi - lo)} / ${dbl(m)} + 1e-9, 6) AS $name
         |  FROM (SELECT $kc _upper, _lower, _n,
         |          row_number() OVER (${kpart(keys)} ORDER BY _upper ASC, _lower DESC) AS _rn
         |        FROM ${p}cum
         |        WHERE _cum >= CAST(CEIL(CAST('$q' AS DOUBLE) * _n) AS BIGINT))
         |  WHERE _rn = 1)""".stripMargin
    }
    (ann +: perQ).mkString(",\n")
  }
}
