package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.QDigest

/** Contract nets for the q-digest quantile sketch: exact-regime identity,
  * count preservation, size bound, determinism over physical layout
  * (cache/repartition — the round-11 Quantiles failure mode), clamping, and
  * the declared `bits·Σ⌊nᵢ/k⌋` rank-slack bound under merges in BOTH
  * association orders (mergeability is "every order satisfies the bound",
  * not structural associativity). */
class QDigestSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")

  private def sorted(df: DataFrame): Seq[Row] =
    df.orderBy("g", "_node").collect().toSeq

  /** True rank of the reported leaf edge vs the target rank, per group. */
  private def rankErrs(
      data: DataFrame, est: DataFrame, q: Double, name: String,
      lo: Double, hi: Double, bits: Int): Seq[(Long, Long, Long)] =
    data.join(broadcast(est.select(col("g"), col(s"${name}_leaf"), col("n"))), "g")
      .groupBy("g")
      .agg(
        sum(when(QDigest.leafIndex(col("v"), lo, hi, bits) <=
          col(s"${name}_leaf"), 1L).otherwise(0L)).as("tr"),
        ceil(lit(q) * max("n")).cast("long").as("r"),
        max(col("n")).as("n"))
      .collect().toSeq.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))

  test("exact regime: n < k leaves the leaf histogram uncompressed") {
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")
    val leaves = QDigest.leafCounts(df, keys, "v", 0.0, 128.0, 8)
    val regs = QDigest.registers(df, keys, "v", 0.0, 128.0, 8, 512)
    assert(sorted(regs) == sorted(leaves))
    val est = QDigest.estimate(regs, keys, 8, 0.0, 128.0, Seq("p50" -> 0.5))
    val row = est.head()
    // ceil(0.5*100)=50 → leaf of value 50.0 → cell floor(50*256/128)=100
    assert(row.getAs[Long]("p50_leaf") == 100L)
    assert(row.getAs[Long]("n") == 100L)
  }

  test("clamping: out-of-range values land in edge cells, count preserved") {
    val df = Seq(("a", -5.0), ("a", 0.5), ("a", 99.0), ("a", 500.0))
      .toDF("g", "v")
    val leaves = QDigest.leafCounts(df, keys, "v", 0.0, 100.0, 4)
    val nodes = sorted(leaves).map(r => (r.getAs[Long]("_node"), r.getAs[Long]("_cnt")))
    assert(nodes.map(_._2).sum == 4L)
    // universe 16 cells: -5 → cell 0 (node 16), 500 → cell 15 (node 31)
    assert(nodes.exists(_._1 == 16L) && nodes.exists(_._1 == 31L))
  }

  test("compression: count preserved, size ≤ 3k per group, layout-independent") {
    val rnd = new scala.util.Random(421)
    val df = (1 to 20000).map(_ => ("a", rnd.nextGaussian() * 10 + 50))
      .toDF("g", "v")
    val (lo, hi, bits, k) = (0.0, 100.0, 10, 32)
    val regs = QDigest.registers(df, keys, "v", lo, hi, bits, k)
    val total = regs.agg(sum("_cnt")).head().getLong(0)
    assert(total == 20000L)
    assert(regs.count() <= 3L * k)
    // determinism across physical layout: cached + repartitioned input
    // must yield the identical register multiset (the failure mode that
    // silently corrupted round-11 exactGrouped over repartitionByRange)
    val cached = df.repartition(7).cache()
    try {
      val regs2 = QDigest.registers(cached, keys, "v", lo, hi, bits, k)
      assert(sorted(regs) == sorted(regs2))
    } finally { cached.unpersist(blocking = false) }
  }

  test("merge: preserves counts and satisfies the additive rank-slack bound in both orders") {
    val rnd = new scala.util.Random(1207)
    val rows = (1 to 30000).map { i =>
      val part = i % 3
      ("a", math.pow(rnd.nextDouble(), 2) * 1000.0, part)
    }
    val df = rows.toDF("g", "v", "part")
    val (lo, hi, bits, k) = (0.0, 1000.0, 12, 256)
    val parts = (0 to 2).map(p =>
      QDigest.registers(df.where(col("part") === p), keys, "v", lo, hi, bits, k))
    val ab_c = QDigest.merge(
      QDigest.merge(parts(0), parts(1), keys, bits, k), parts(2), keys, bits, k)
    val a_bc = QDigest.merge(
      parts(0), QDigest.merge(parts(1), parts(2), keys, bits, k), keys, bits, k)
    for (m <- Seq(ab_c, a_bc)) {
      assert(m.agg(sum("_cnt")).head().getLong(0) == 30000L)
      assert(m.count() <= 3L * k)
      val est = QDigest.estimate(m, keys, bits, lo, hi,
        Seq("p50" -> 0.5, "p90" -> 0.9))
      // slack: bits·Σ⌊nᵢ/k⌋ over the three builds + two merges (recompress
      // adds one more ⌊n/k⌋ family per level), plus the reported cell mass
      val perBuild = 10000L / k
      val slack = bits.toLong * (3 * perBuild + 2 * (30000L / k))
      val cellMax = df
        .groupBy(QDigest.leafIndex(col("v"), lo, hi, bits)).count()
        .agg(max("count")).head().getLong(0)
      for ((name, q) <- Seq("p50" -> 0.5, "p90" -> 0.9);
           (tr, r, _) <- rankErrs(df, est, q, name, lo, hi, bits)) {
        assert(math.abs(tr - r) <= slack + cellMax,
          s"$name rank err ${math.abs(tr - r)} > slack $slack + cell $cellMax")
      }
    }
  }

  test("randomized net: single-build estimate tracks exact quantiles") {
    for (seed <- Seq(7, 77, 777)) {
      val rnd = new scala.util.Random(seed)
      val n = 5000 + rnd.nextInt(5000)
      val df = (1 to n).map(_ => ("a", rnd.nextDouble() * 500.0))
        .toDF("g", "v")
      val (lo, hi, bits, k) = (0.0, 500.0, 12, 128)
      val regs = QDigest.registers(df, keys, "v", lo, hi, bits, k)
      val est = QDigest.estimate(regs, keys, bits, lo, hi, Seq("p75" -> 0.75))
      val slack = bits.toLong * (n / k)
      val cellMax = df
        .groupBy(QDigest.leafIndex(col("v"), lo, hi, bits)).count()
        .agg(max("count")).head().getLong(0)
      val Seq((tr, r, total)) = rankErrs(df, est, 0.75, "p75", lo, hi, bits)
      assert(total == n)
      assert(math.abs(tr - r) <= slack + cellMax,
        s"seed $seed: rank err ${math.abs(tr - r)} > $slack + $cellMax")
    }
  }
}
