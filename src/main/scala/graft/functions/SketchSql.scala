package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.operators.Kll

/** SQL-surface registration for the sketch algebra (round-14 verdict task
  * 7): the cube family (q93-q96) was DataFrame-only; these typed
  * [[Aggregator]]s expose each algebra's BUILD and MERGE as SQL aggregate
  * functions, so `GROUP BY … WITH CUBE`-style sketch serving is
  * expressible from `spark.sql` alone:
  *
  *  - `hll_regs(value)`  / `hll_merge_regs(regs)`   — dense rank array
  *  - `cms_regs(value)`  / `cms_merge_regs(regs)`   — depth×width counts
  *  - `kmv_sketch(value)` / `kmv_merge_sketch(sk)`  — k smallest hashes
  *  - `kll_regs(id, value)` / `kll_merge_regs(regs)` — compactor rows
  *
  * Each mirrors the RELATIONAL register algebra bit-for-bit (same
  * [[graft.operators.Dedup.hash56]] lanes via [[Kll.hash56Local]], same
  * max/sum/truncate/sweep folds, same salts), so a sketch built through
  * SQL and one built through the DataFrame operators are ROW-IDENTICAL
  * once the array is exploded back to register rows — pinned per algebra
  * in SketchSqlSpec and hash-checked against the generated DuckDB
  * replays in q100-q103.
  *
  * Buffer discipline, measured both ways: the FIXED-SIZE register
  * buffers (hll/cms arrays, kmv's k-bounded array) are mutable primitive
  * arrays updated in place — the first immutable-Vector cut copied the
  * whole register array per input row, an O(m)-per-row tax that benched
  * q101 at 6.4 s for ~1 s of work. The GROWING buffers (kll's raw-value
  * lists) stay persistent Vectors — tree-amortized append — because the
  * symmetric "optimization" (flat-array append) is O(n) per row and sent
  * q103 quadratic (2.2 s → 11.5 s before being caught).
  *
  * Scale note: the relational register frames remain the 100 TB serving
  * shape (they shuffle as narrow rows and fold map-side); this surface
  * is the EXPRESSIBILITY layer — per-group state here is the same
  * sketch-sized array the register frame holds, and the KLL build
  * buffers raw values per group exactly like the relational
  * `collect_list` kernel it mirrors. Nulls: callers filter null values
  * (`WHERE v IS NOT NULL`), the count-distinct convention everywhere in
  * the family; a null String input is additionally skipped defensively. */
object SketchSql {

  final case class IntArr(var a: Array[Int])
  final case class LongArr(var a: Array[Long])
  final case class KllItem(level: Int, value: Double)

  private def hllBucketRank(v: String, p: Int): (Int, Int) = {
    val w = 56 - p
    val h = Kll.hash56Local(v)
    val rest = h & ((1L << w) - 1L)
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(rest)
    ((h >>> w).toInt, w + 1 - bitlen)
  }

  /** HLL build: dense `2^p` rank array, max-per-bucket — the array form
    * of [[graft.operators.Hll.registers]] (bucket = array index, empty
    * buckets 0). */
  final class HllRegsAgg(p: Int) extends Aggregator[String, IntArr, Seq[Int]] {
    private val m = 1 << p
    def zero: IntArr = IntArr(new Array[Int](m))
    def reduce(b: IntArr, v: String): IntArr = {
      if (v != null) {
        val (bk, r) = hllBucketRank(v, p)
        if (r > b.a(bk)) b.a(bk) = r
      }
      b
    }
    def merge(x: IntArr, y: IntArr): IntArr = {
      var i = 0
      while (i < m) { if (y.a(i) > x.a(i)) x.a(i) = y.a(i); i += 1 }
      x
    }
    def finish(b: IntArr): Seq[Int] = b.a.toSeq
    def bufferEncoder: Encoder[IntArr] = Encoders.product[IntArr]
    def outputEncoder: Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  }

  /** HLL merge: element-wise max of register arrays —
    * [[graft.operators.Hll.merge]]/[[graft.operators.Hll.rollup]] as a
    * SQL aggregate. */
  final class HllMergeAgg(p: Int) extends Aggregator[Seq[Int], IntArr, Seq[Int]] {
    private val m = 1 << p
    def zero: IntArr = IntArr(new Array[Int](m))
    def reduce(b: IntArr, v: Seq[Int]): IntArr = {
      if (v != null) {
        require(v.size == m, s"hll_merge_regs: array size ${v.size} != $m")
        var i = 0
        while (i < m) { if (v(i) > b.a(i)) b.a(i) = v(i); i += 1 }
      }
      b
    }
    def merge(x: IntArr, y: IntArr): IntArr = {
      var i = 0
      while (i < m) { if (y.a(i) > x.a(i)) x.a(i) = y.a(i); i += 1 }
      x
    }
    def finish(b: IntArr): Seq[Int] = b.a.toSeq
    def bufferEncoder: Encoder[IntArr] = Encoders.product[IntArr]
    def outputEncoder: Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  }

  /** CMS build: flattened `depth×width` count array (`i = row·width +
    * bucket`), sum-per-cell — the array form of
    * [[graft.operators.Cms.registers]]. */
  final class CmsRegsAgg(depth: Int, width: Int)
      extends Aggregator[String, LongArr, Seq[Long]] {
    def zero: LongArr = LongArr(new Array[Long](depth * width))
    def reduce(b: LongArr, v: String): LongArr = {
      if (v != null) {
        var r = 0
        while (r < depth) {
          val bk = (Kll.hash56Local(s"$r:$v") % width).toInt
          b.a(r * width + bk) += 1L
          r += 1
        }
      }
      b
    }
    def merge(x: LongArr, y: LongArr): LongArr = {
      var i = 0
      while (i < x.a.length) { x.a(i) += y.a(i); i += 1 }
      x
    }
    def finish(b: LongArr): Seq[Long] = b.a.toSeq
    def bufferEncoder: Encoder[LongArr] = Encoders.product[LongArr]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** CMS merge: element-wise sum —
    * [[graft.operators.Cms.merge]]/[[graft.operators.Cms.rollup]]. */
  final class CmsMergeAgg(depth: Int, width: Int)
      extends Aggregator[Seq[Long], LongArr, Seq[Long]] {
    def zero: LongArr = LongArr(new Array[Long](depth * width))
    def reduce(b: LongArr, v: Seq[Long]): LongArr = {
      if (v != null) {
        require(v.size == depth * width,
          s"cms_merge_regs: array size ${v.size} != ${depth * width}")
        var i = 0
        while (i < b.a.length) { b.a(i) += v(i); i += 1 }
      }
      b
    }
    def merge(x: LongArr, y: LongArr): LongArr = {
      var i = 0
      while (i < x.a.length) { x.a(i) += y.a(i); i += 1 }
      x
    }
    def finish(b: LongArr): Seq[Long] = b.a.toSeq
    def bufferEncoder: Encoder[LongArr] = Encoders.product[LongArr]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Insert `h` into a sorted-ascending k-bounded distinct array. */
  private def kmvInsert(a: Array[Long], h: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(a, h)
    if (pos >= 0) a // already present
    else {
      val ins = -pos - 1
      if (a.length >= k && ins >= k) a // larger than the k-th smallest
      else {
        val n = math.min(a.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(a, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  /** KMV build: the k smallest distinct value hashes, ascending — the
    * array form of [[graft.operators.Kmv.sketch]]. */
  final class KmvSketchAgg(k: Int) extends Aggregator[String, LongArr, Seq[Long]] {
    def zero: LongArr = LongArr(Array.emptyLongArray)
    def reduce(b: LongArr, v: String): LongArr = {
      if (v != null) b.a = kmvInsert(b.a, Kll.hash56Local(v), k)
      b
    }
    def merge(x: LongArr, y: LongArr): LongArr = {
      var i = 0
      while (i < y.a.length) { x.a = kmvInsert(x.a, y.a(i), k); i += 1 }
      x
    }
    def finish(b: LongArr): Seq[Long] = b.a.toSeq
    def bufferEncoder: Encoder[LongArr] = Encoders.product[LongArr]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** KMV merge: distinct union re-truncated to the k smallest —
    * [[graft.operators.Kmv.merge]]/[[graft.operators.Kmv.rollup]]. */
  final class KmvMergeAgg(k: Int) extends Aggregator[Seq[Long], LongArr, Seq[Long]] {
    def zero: LongArr = LongArr(Array.emptyLongArray)
    def reduce(b: LongArr, v: Seq[Long]): LongArr = {
      if (v != null) v.foreach(h => b.a = kmvInsert(b.a, h, k))
      b
    }
    def merge(x: LongArr, y: LongArr): LongArr = {
      var i = 0
      while (i < y.a.length) { x.a = kmvInsert(x.a, y.a(i), k); i += 1 }
      x
    }
    def finish(b: LongArr): Seq[Long] = b.a.toSeq
    def bufferEncoder: Encoder[LongArr] = Encoders.product[LongArr]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** KLL build over `(id, value)` pairs: raw values buffer per group
    * (the same shape the relational `collect_list` kernel holds — Vector
    * appends are tree-amortized, where a flat-array append would be
    * quadratic per group), then the EXACT
    * [[graft.operators.Kll.registers]] pipeline at finish — md5-bucketed
    * lanes (`salt/b`), per-lane sweep, one fold sweep at `rounds+4`
    * (`salt/f`). Output: compactor rows as structs. */
  final case class KllVBuf(items: Seq[KllItem], raw: Seq[Double],
      rawBuckets: Seq[Long])

  final class KllRegsAgg(buckets: Int, k: Int, rounds: Int, salt: String)
      extends Aggregator[(String, Double), KllVBuf, Seq[KllItem]] {
    def zero: KllVBuf = KllVBuf(Vector.empty, Vector.empty, Vector.empty)
    def reduce(b: KllVBuf, v: (String, Double)): KllVBuf =
      if (v == null || v._1 == null) b
      else KllVBuf(b.items, b.raw :+ v._2,
        b.rawBuckets :+ (Kll.hash56Local(v._1) % buckets))
    def merge(x: KllVBuf, y: KllVBuf): KllVBuf =
      KllVBuf(x.items ++ y.items, x.raw ++ y.raw,
        x.rawBuckets ++ y.rawBuckets)
    def finish(b: KllVBuf): Seq[KllItem] = {
      val perBucket = b.rawBuckets.zip(b.raw).groupBy(_._1).toSeq
        .flatMap { case (bk, vs) =>
          Kll.sweepLocal(vs.map(x => (0, x._2)), k, rounds, s"$salt/b", bk)
        }
      Kll.sweepLocal(perBucket, k, rounds + 4, s"$salt/f", -1L)
        .map { case (l, v) => KllItem(l, v) }
    }
    def bufferEncoder: Encoder[KllVBuf] = Encoders.product[KllVBuf]
    def outputEncoder: Encoder[Seq[KllItem]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KllItem]]()
  }

  /** KLL merge/rollup: union the compactor rows, one `salt/r` sweep —
    * [[graft.operators.Kll.rollup]] as a SQL aggregate. */
  final class KllMergeAgg(k: Int, sweepRounds: Int, salt: String)
      extends Aggregator[Seq[KllItem], KllVBuf, Seq[KllItem]] {
    def zero: KllVBuf = KllVBuf(Vector.empty, Vector.empty, Vector.empty)
    def reduce(b: KllVBuf, v: Seq[KllItem]): KllVBuf =
      if (v == null) b else KllVBuf(b.items ++ v, b.raw, b.rawBuckets)
    def merge(x: KllVBuf, y: KllVBuf): KllVBuf =
      KllVBuf(x.items ++ y.items, Vector.empty, Vector.empty)
    def finish(b: KllVBuf): Seq[KllItem] =
      Kll.sweepLocal(b.items.map(i => (i.level, i.value)), k, sweepRounds,
        s"$salt/r", -1L)
        .map { case (l, v) => KllItem(l, v) }
    def bufferEncoder: Encoder[KllVBuf] = Encoders.product[KllVBuf]
    def outputEncoder: Encoder[Seq[KllItem]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KllItem]]()
  }

  // ── scalar ESTIMATE finishers over the register arrays (round-16
  // verdict task 7): q100–q103 could BUILD and MERGE sketches in pure
  // SQL but estimation still required the DataFrame operators — these
  // close the loop so a spark.sql-only user builds AND serves a sketch
  // cube. Arithmetic is bit-identical to the relational estimators
  // (integer harmonic fold, same literal products/divisions in the same
  // order), so the SAME generated DuckDB replays hash-check both
  // surfaces. Raw doubles — compose `round(x + 1e-9, 6)` (the house
  // stableRound) at the output boundary when hash-comparing. ──

  /** [[graft.operators.Hll.estimate]] over one dense rank array. */
  def hllEstimate(regs: Seq[Int], p: Int): Double = {
    val m = 1 << p
    val w = 56 - p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var ne = 0L
    var s = 0L
    regs.foreach { r => if (r > 0) { ne += 1L; s += 1L << (w + 1 - r) } }
    val v = (m - ne).toDouble
    val denom = ((m - ne) * (1L << (w + 1)) + s).toDouble
    val e = alpha * m.toDouble * m * (1L << (w + 1)).toDouble / denom
    if (e <= 2.5 * m && v > 0) m.toDouble * math.log(m / v) else e
  }

  /** [[graft.operators.Cms.estimate]]'s point count for one value over a
    * flattened depth×width count array (0 for untouched buckets). */
  def cmsEstimate(regs: Seq[Long], v: String, depth: Int, width: Int): Long =
    if (v == null) 0L
    else {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val bk = (Kll.hash56Local(s"$r:$v") % width).toInt
        val c = regs(r * width + bk)
        if (c < best) best = c
        r += 1
      }
      best
    }

  /** [[graft.operators.Kmv.estimate]] over one ascending hash array:
    * exact below k, `(k−1)·H/θ` at capacity. */
  def kmvEstimate(sk: Seq[Long], k: Int): Double =
    if (sk.size < k) sk.size.toDouble
    else (k - 1).toDouble * graft.operators.Kmv.H.toDouble / sk.last

  /** [[graft.operators.Kll.estimate]]'s quantile readout over one
    * compactor-row array: weighted cumulative rank by (value, level),
    * first value whose cum ≥ ⌈q·n⌉. */
  def kllQuantile(items: Seq[KllItem], q: Double): Double = {
    require(q > 0.0 && q <= 1.0, s"kll_quantile: q=$q outside (0,1]")
    require(items.nonEmpty, "kll_quantile: empty sketch")
    val sorted = items.sortBy(i => (i.value, i.level))
    val n = sorted.iterator.map(i => 1L << i.level).sum
    val t = math.ceil(q * n).toLong
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += 1L << sorted(i).level
      if (cum >= t) return sorted(i).value
      i += 1
    }
    sorted.last.value
  }

  /** Register the whole surface on `spark` (idempotent — re-registering
    * replaces). Parameters are bound at registration, the same way the
    * relational call sites bind them; re-register to change them. */
  def register(
      spark: SparkSession,
      hllP: Int = 8,
      cmsDepth: Int = 4, cmsWidth: Int = 64,
      kmvK: Int = 64,
      kllBuckets: Int = 4, kllK: Int = 32, kllRounds: Int = 10,
      kllSalt: String = "sqlk", kllSweepRounds: Int = 16): Unit = {
    spark.udf.register("hll_regs", udaf(new HllRegsAgg(hllP)))
    spark.udf.register("hll_merge_regs", udaf(new HllMergeAgg(hllP)))
    spark.udf.register("cms_regs", udaf(new CmsRegsAgg(cmsDepth, cmsWidth)))
    spark.udf.register("cms_merge_regs",
      udaf(new CmsMergeAgg(cmsDepth, cmsWidth)))
    spark.udf.register("kmv_sketch", udaf(new KmvSketchAgg(kmvK)))
    spark.udf.register("kmv_merge_sketch", udaf(new KmvMergeAgg(kmvK)))
    spark.udf.register("kll_regs",
      udaf(new KllRegsAgg(kllBuckets, kllK, kllRounds, kllSalt)))
    spark.udf.register("kll_merge_regs",
      udaf(new KllMergeAgg(kllK, kllSweepRounds, kllSalt)))
    spark.udf.register("hll_est",
      (regs: Seq[Int]) => hllEstimate(regs, hllP))
    spark.udf.register("cms_est",
      (regs: Seq[Long], v: String) =>
        cmsEstimate(regs, v, cmsDepth, cmsWidth))
    spark.udf.register("kmv_est", (sk: Seq[Long]) => kmvEstimate(sk, kmvK))
    spark.udf.register("kll_quantile",
      (items: Seq[KllItem], q: Double) => kllQuantile(items, q))
  }
}
