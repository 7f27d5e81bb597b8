package graft.functions

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup/similarity hot paths.
  *
  * Why these exist: Spark's higher-order functions (`transform` / `zip_with` /
  * `aggregate`) are interpreted with per-element boxing — fine for per-
  * document work at document cardinality, ruinous for per-candidate-pair work
  * at pair cardinality (a near-dup join evaluates its kernels tens of
  * millions of times; profiled ~100× slower than the equivalent primitive
  * loop). The per-PAIR kernels below implement `doGenCode` so they stay
  * inside whole-stage codegen as tight primitive loops; the per-DOCUMENT
  * kernels (shingle hashing, minhash signatures) are `CodegenFallback` —
  * one virtual call per row at document cardinality is noise, and their
  * internal loops are primitive either way.
  *
  * Hashing is FNV-1a 64 over UTF-8 bytes + a splitmix64 finalizer — public
  * textbook constructions, deterministic across runs/executors, with no
  * dependency on Spark-internal hash utilities. None of these hashes need to
  * match any other engine: correctness contracts (e.g. exact Jaccard) are on
  * SET algebra, which any injective-in-practice 64-bit hash preserves
  * (collision odds ~n²/2⁶⁵).
  */
object kernels {

  @inline final def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline final def fnv1a64(bytes: Array[Byte]): Long =
    fnv1a64(bytes, 0, bytes.length)

  /** FNV-1a over `bytes[from, until)` — the in-place form the shingle kernel
    * uses to hash k-gram windows without a substring allocation per gram. */
  @inline final def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L
      i += 1
    }
    h
  }

  /** Sort + dedupe in place; returns the deduped prefix length. */
  final def sortDistinct(a: Array[Long]): Int = {
    if (a.length == 0) return 0
    java.util.Arrays.sort(a)
    var w = 0
    var i = 1
    while (i < a.length) {
      if (a(i) != a(w)) { w += 1; a(w) = a(i) }
      i += 1
    }
    w + 1
  }
}

/** Count of positions where two long arrays hold equal values (up to the
  * shorter length). Used as the minhash signature-agreement estimator, so it
  * runs once per candidate pair — codegen'd primitive loop. */
case class LongArrayAgree(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "long_array_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var c = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayAgree =
    copy(left = newLeft, right = newRight)
}

/** 1-based index of the first position where two long arrays agree; 0 when
  * none. Drives first-matching-band dedup of LSH candidate pairs — codegen'd,
  * runs once per raw band match. */
case class LongArrayFirstEqual(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "long_array_first_equal"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) return i + 1
      i += 1
    }
    0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) { ${ev.value} = $i + 1; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayFirstEqual =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two SORTED-distinct long arrays via a merge
  * scan — O(n+m), no per-call hash table (unlike `array_intersect`). The
  * caller contract (sortedness) is produced by [[ShingleHashes]] /
  * [[SortedTokenHashes]]. Codegen'd; runs once per verified candidate pair. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val u = x.getLong(i)
      val v = y.getLong(j)
      if (u == v) { c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0;
         |${ev.value} = 0;
         |while ($i < $n && $j < $m) {
         |  final long $u = $a.getLong($i);
         |  final long $v = $b.getLong($j);
         |  if ($u == $v) { ${ev.value}++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Jaccard of two sorted-distinct long arrays with a THRESHOLDED EARLY EXIT:
  * returns the exact Jaccard when the merge completes, or -1.0 as soon as
  * the largest intersection still reachable (`inter_so_far +
  * min(remaining_a, remaining_b)`) provably cannot pass the caller's
  * `jaccard >= t` filter. Every EMITTED (≥ t) pair carries its exact
  * Jaccard and the `≥ t` result set is IDENTICAL to the full-merge
  * formulation — only provably-failing pairs short-circuit. On the near-dup
  * verification stage most candidates sit just below the threshold (LSH
  * sends them), so the bail saves the back half of millions of long merges.
  *
  * Boundary exactness: the required intersection is an INTEGER `ireq`,
  * derived from `ceil(t(n+m)/(1+t))` and then fixed up using the very same
  * double-division compare the final filter applies (float division is
  * monotone in the numerator, so "final inter ≥ ireq" ⟺ "fl(i/(n+m−i)) ≥ t"
  * exactly). Comparing against the raw floating `t(n+m)/(1+t)` instead
  * loses exact-boundary pairs for thresholds that aren't binary-exact
  * (t = 0.4 rounds the requirement up; measured 78k dropped pairs at
  * sf0.1). Per-pair cardinality → codegen'd. */
case class SortedJaccardGeq(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard_geq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    val cap = math.min(n, m)
    var ireq = math.ceil(threshold * (n + m) / (1.0 + threshold)).toInt
    if (ireq > cap + 1) ireq = cap + 1
    if (ireq < 0) ireq = 0
    while (ireq > 0 &&
        (ireq - 1).toDouble / (n + m - (ireq - 1)).toDouble >= threshold) ireq -= 1
    while (ireq <= cap &&
        ireq.toDouble / (n + m - ireq).toDouble < threshold) ireq += 1
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      if (inter + math.min(n - i, m - j) < ireq) return -1.0
      val u = x.getLong(i)
      val v = y.getLong(j)
      if (u == v) { inter += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter).toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      val cap = ctx.freshName("cap")
      val inter = ctx.freshName("inter")
      val ireq = ctx.freshName("ireq")
      val bail = ctx.freshName("bail")
      val t = s"${threshold}d"
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |final int $cap = java.lang.Math.min($n, $m);
         |int $ireq = (int) java.lang.Math.ceil($t * ($n + $m) / (1.0d + $t));
         |if ($ireq > $cap + 1) $ireq = $cap + 1;
         |if ($ireq < 0) $ireq = 0;
         |while ($ireq > 0 &&
         |    ((double) ($ireq - 1)) / ((double) ($n + $m - ($ireq - 1))) >= $t) $ireq--;
         |while ($ireq <= $cap &&
         |    ((double) $ireq) / ((double) ($n + $m - $ireq)) < $t) $ireq++;
         |int $i = 0; int $j = 0; int $inter = 0;
         |boolean $bail = false;
         |while ($i < $n && $j < $m) {
         |  if ($inter + java.lang.Math.min($n - $i, $m - $j) < $ireq) {
         |    $bail = true; break;
         |  }
         |  final long $u = $a.getLong($i);
         |  final long $v = $b.getLong($j);
         |  if ($u == $v) { $inter++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = $bail ? -1.0d
         |  : ((double) $inter) / ((double) ($n + $m - $inter));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccardGeq =
    copy(left = newLeft, right = newRight)
}

/** Sorted-distinct 64-bit hashes of the character `k`-grams of a string.
  * Replaces the `transform(sequence(...), i -> xxhash64(substr(...)))` chain
  * (interpreted, per-element boxed, plus an O(n log n) `array_distinct` on
  * boxed longs). Texts shorter than `k` hash as one whole-string shingle,
  * matching `substring`'s clamping semantics. Per-document cardinality →
  * CodegenFallback. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String]
    // One byte copy + one char-offset walk, then every k-gram hashes IN
    // PLACE over the shared array. The previous form
    // (`substringSQL(i+1, k).getBytes` per gram) allocated a UTF8String AND
    // a byte[] per gram — tens of thousands of allocations per document,
    // which dominated the d02 cache-build stage (profiled 68 CPU-s for
    // 5000 docs at sf0.1). Hash values are bit-identical: same FNV over the
    // same byte windows.
    val bytes = str.getBytes
    val nBytes = bytes.length
    val offsets = new Array[Int](str.numChars() + 1)
    var c = 0
    var b = 0
    while (b < nBytes) {
      offsets(c) = b
      c += 1
      b += UTF8String.numBytesForFirstByte(bytes(b))
    }
    offsets(c) = nBytes
    val n = c
    val count = math.max(n - k, 0) + 1
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val until = offsets(math.min(i + k, n))
      out(i) = kernels.splitmix64(kernels.fnv1a64(bytes, offsets(i), until))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.take(kernels.sortDistinct(out)))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Sorted-distinct 64-bit hashes of an array of strings (word tokens).
  * Same motivation as [[ShingleHashes]], for token-set Jaccard. */
case class SortedTokenHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_token_hashes"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      out(i) =
        if (t == null) 0L
        else kernels.splitmix64(kernels.fnv1a64(t.getBytes))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.take(kernels.sortDistinct(out)))
  }

  override protected def withNewChildInternal(newChild: Expression): SortedTokenHashes =
    copy(child = newChild)
}

/** MinHash signature: element `i` is the minimum over all shingle hashes `h`
  * of `splitmix64(h ^ seed_i)` — one fused primitive pass instead of
  * `numHashes` interpreted `transform`s. Per-document cardinality →
  * CodegenFallback. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => kernels.splitmix64(0x5EED5EED00000000L + i))

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = kernels.splitmix64(h ^ seeds(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 56-bit md5-derived hash (value of the first 14 hex chars = first 7 digest
  * bytes) — bit-identical to the SQL form
  * `conv(substring(md5(c), 1, 14), 16, 10)` and to DuckDB's
  * `('0x' || substr(md5(c), 1, 14))::UBIGINT`, at primitive speed. */
object Hash56 {
  // MessageDigest.getInstance is a provider lookup + allocation per call —
  // measured as the dominant per-gram cost in the fingerprint/simhash
  // kernels. MD5 digests are reusable after digest() (implicit reset), so
  // one instance per thread serves every row that thread evaluates.
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def apply(bytes: Array[Byte]): Long = ofRange(bytes, 0, bytes.length)

  /** Hash a sub-range without materializing the slice (the k-gram loop's
    * shape: one shared byte array, many windows). */
  def ofRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    val digest = md.get()
    digest.update(bytes, from, until - from)
    val d = digest.digest()
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h
  }
}

/** `hash56(c)` as one fused codegen-friendly expression: md5 over the
  * input bytes, top 56 bits as a long — bit-identical to the composed SQL
  * form `conv(substring(md5(c), 1, 14), 16, 10)` (the first 14 hex chars
  * ARE the first 7 digest bytes) and to DuckDB's
  * `('0x' || substr(md5(c), 1, 14))::UBIGINT::BIGINT`, without the hex
  * string materialization and the base-16 string re-parse (`conv`) the
  * composed form pays per row. Accepts BinaryType with the same implicit
  * string→binary coercion `md5` itself uses, so string inputs hash the
  * identical UTF-8 bytes. */
case class Hash56Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hash56"

  override protected def nullSafeEval(b: Any): Any =
    Hash56(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash56.apply($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash56Expr =
    copy(child = newChild)
}

/** Occurrence count of a constant token phrase inside a token array: the
  * number of start positions `i` with `tokens(i+j) == terms(j)` for every
  * `j` (overlaps count, the s22 contract) — one primitive pass replacing
  * the interpreted `size(filter(sequence(1, n−L+1), …))` HOF tower whose
  * per-start lambda allocated boxed indices and re-dispatched two
  * `element_at` calls (measured ~0.5 ms/doc at sf0.1 → µs). Result is
  * bit-identical to the HOF form for non-null arrays; the caller supplies
  * the null→0 wrapper the old CaseWhen provided. Per-row variable-length
  * loop → CodegenFallback (the kernel family's documented trade). */
case class PhraseCount(child: Expression, terms: Array[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "phrase_count"

  @transient private lazy val termBytes: Array[UTF8String] =
    terms.map(UTF8String.fromString)

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val l = termBytes.length
    var count = 0L
    var i = 0
    val last = n - l
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < l) {
        val t = arr.getUTF8String(i + j)
        ok = t != null && t.equals(termBytes(j))
        j += 1
      }
      if (ok) count += 1L
      i += 1
    }
    count
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseCount =
    copy(child = newChild)
}

/** Distinct character k-grams of a string in first-occurrence order — the
  * primitive form of `array_distinct(transform(sequence(0, n−k), i →
  * substr(i+1, k)))` (one byte copy + one char-offset walk + one hash set,
  * instead of an interpreted per-position lambda and a second distinct
  * pass). Identical output: same grams, same first-occurrence order, the
  * whole (short) string as the single gram when n ≤ k. */
case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override protected def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nBytes = bytes.length
    val n = s.numChars()
    val offsets = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (bi < nBytes) {
      offsets(ci) = bi
      ci += 1
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
    }
    offsets(ci) = nBytes
    val count = math.max(n - k, 0) + 1
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      seen.add(UTF8String.fromBytes(
        bytes, offsets(i), offsets(math.min(i + k, n)) - offsets(i)))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** Per-document language-profile overlap in ONE primitive pass — the
  * scoring half of [[graft.operators.TextAnalysis.langIdNgram]] once the
  * per-language trigram profiles (bounded MODEL state: topN × nLangs
  * strings, the tokenizer-family build-once discipline) are collected.
  * Walks the text's DISTINCT char k-grams exactly like [[CharShingles]]
  * (same byte walk, same whole-string-when-short rule), counts, per
  * language, how many land in that language's profile set, and returns
  * `struct(lang, ov)` for the argmax under the relational tie-break
  * (ov desc, lang asc in UTF8 binary order); zero overlap → ("unk", 0).
  * Replaces a corpus-trigram explode + join + two windows with a map
  * lookup per distinct gram. Per-document cardinality → CodegenFallback. */
case class LangProfileOverlap(
    child: Expression, k: Int, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("ov", LongType, nullable = false)))
  override def prettyName: String = "lang_profile_overlap"

  private lazy val langs: Array[UTF8String] = profiles
    .map(p => UTF8String.fromString(p._1))
    .sortWith(_.compareTo(_) < 0)
    .toArray
  private lazy val unk = UTF8String.fromString("unk")
  private lazy val gramToLangs: java.util.HashMap[UTF8String, Array[Int]] = {
    val li = langs.zipWithIndex.toMap
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    profiles.foreach { case (l, gs) =>
      val i = li(UTF8String.fromString(l))
      gs.foreach { g =>
        val u = UTF8String.fromString(g)
        val prev = m.get(u)
        m.put(u, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  override protected def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nBytes = bytes.length
    val n = s.numChars()
    val offsets = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (bi < nBytes) {
      offsets(ci) = bi
      ci += 1
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
    }
    offsets(ci) = nBytes
    val count = math.max(n - k, 0) + 1
    val seen = new java.util.HashSet[UTF8String](count * 2)
    val ov = new Array[Long](langs.length)
    var i = 0
    while (i < count) {
      val g = UTF8String.fromBytes(
        bytes, offsets(i), offsets(math.min(i + k, n)) - offsets(i))
      if (seen.add(g)) {
        val ls = gramToLangs.get(g)
        if (ls != null) {
          var j = 0
          while (j < ls.length) { ov(ls(j)) += 1L; j += 1 }
        }
      }
      i += 1
    }
    var best = -1
    var bestOv = 0L
    i = 0
    while (i < langs.length) {
      if (ov(i) > bestOv) { best = i; bestOv = ov(i) }
      i += 1
    }
    if (best < 0)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](unk, 0L))
    else
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](langs(best), bestOv))
  }

  override protected def withNewChildInternal(newChild: Expression): LangProfileOverlap =
    copy(child = newChild)
}

/** 56-bit SimHash over an array of string tokens: per-bit majority vote of
  * md5-derived token hashes ([[Hash56]]) — one primitive pass replacing the
  * interpreted per-token-per-bit `aggregate(zip_with(…))` chain (measured 9.2s
  * → ~2s at sf0.1). Per-document cardinality → CodegenFallback. */
case class SimHash56(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash56"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](56)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val h = if (t == null) 0L else Hash56(t.getBytes)
      var j = 0
      while (j < 56) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 56) { if (counts(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash56 =
    copy(child = newChild)
}

/** Winnowing fingerprint of a (pre-normalized) string: md5-derived 56-bit
  * k-gram hashes, sliding-window minima, distinct+sorted, first `take` joined
  * with commas — single primitive pass replacing per-gram
  * `conv(substring(md5(…)))` string expressions plus HOF window minima.
  * Matches the SQL/DuckDB formulation gram for gram. */
case class WinnowFingerprint(child: Expression, k: Int, window: Int, take: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "winnow_fingerprint"

  override protected def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val n = s.numChars()
    val nGrams = math.max(n - k, 0) + 1
    // One byte copy + one char-offset walk, then every k-gram hashes in
    // place over the shared array (the ShingleHashes discipline). The
    // previous `substringSQL(i + 1, k).getBytes` per gram re-scanned the
    // string from position 0 each call (O(n²) char walks) and allocated a
    // UTF8String + byte[] per gram. Hash values are bit-identical: same md5
    // over the same byte windows.
    val bytes = s.getBytes
    val nBytes = bytes.length
    val offsets = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (bi < nBytes) {
      offsets(ci) = bi
      ci += 1
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
    }
    offsets(ci) = nBytes
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      grams(i) = Hash56.ofRange(bytes, offsets(i), offsets(math.min(i + k, n)))
      i += 1
    }
    val nWins = math.max(nGrams - window, 0) + 1
    val mins = new Array[Long](nWins)
    var w = 0
    while (w < nWins) {
      var m = Long.MaxValue
      var j = w
      val end = math.min(w + window, nGrams)
      while (j < end) { if (grams(j) < m) m = grams(j); j += 1 }
      mins(w) = m
      w += 1
    }
    val cnt = kernels.sortDistinct(mins)
    UTF8String.fromString(
      mins.take(math.min(cnt, take)).mkString(","))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** Cosine similarity of two numeric arrays (float or double elements) in one
  * fused primitive pass (dot product + both norms simultaneously), instead of
  * three interpreted `aggregate(zip_with(…))` traversals. Runs once per
  * candidate pair in the similarity joins → codegen'd. Accumulation order is
  * identical to the sequential HOF form (left-to-right double adds), so
  * results are bit-identical to it and to the DuckDB oracle. Mirrors the HOF
  * null semantics: null when lengths differ or any element is null. */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_cosine"

  private def elemAccessor(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case t => throw new IllegalArgumentException(s"vec_cosine: unsupported element type $t")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val yf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val u = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val v = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += u * v; na += u * u; nb += v * v
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $u = (double) $a.${elemAccessor(left)}($i);
         |    final double $v = (double) $b.${elemAccessor(right)}($i);
         |    $dot += $u * $v; $na += $u * $u; $nb += $v * $v;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** Apply one BPE merge to a symbol array: every adjacent `(left, right)`
  * occurrence becomes the single symbol `left+right`, scanning left to right
  * (so `aaa` under (a,a) → `[aa, a]` — the standard greedy application,
  * Sennrich et al. 2016). Per-WORD-VOCABULARY cardinality (the merge loop
  * runs over the word-frequency table, never the corpus) → CodegenFallback,
  * like the other per-document kernels. Null elements pass through unmerged. */
case class MergeAdjacentPair(child: Expression, left: String, right: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "merge_adjacent_pair"

  private lazy val l = UTF8String.fromString(left)
  private lazy val r = UTF8String.fromString(right)
  private lazy val lr = UTF8String.fromString(left + right)

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    var k = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur != null && cur.equals(l)) {
        val nxt = arr.getUTF8String(i + 1)
        if (nxt != null && nxt.equals(r)) {
          out(k) = lr; k += 1; i += 2
        } else { out(k) = cur; k += 1; i += 1 }
      } else { out(k) = cur; k += 1; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, k))
  }

  override protected def withNewChildInternal(newChild: Expression): MergeAdjacentPair =
    copy(child = newChild)
}

/** Euclidean (L2) distance of two numeric arrays in one fused primitive pass
  * — the metric companion to [[VecCosine]] (cosine ignores magnitude, inner
  * product IS magnitude; L2 is what PCA projection preserves under its
  * centered rotation, so PCA-compressed retrieval ranks by THIS). Runs once
  * per candidate pair → codegen. Sequential left-to-right accumulation,
  * mirroring DuckDB's `list_distance` over double lists. Null when lengths
  * differ or any element is null. */
case class VecL2Dist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2_dist"

  private def elemAccessor(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case t => throw new IllegalArgumentException(s"vec_l2_dist: unsupported element type $t")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val yf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val u = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val v = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = u - v
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = (double) $a.${elemAccessor(left)}($i)
         |      - (double) $b.${elemAccessor(right)}($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($s); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Dist =
    copy(left = newLeft, right = newRight)
}

/** Apply a LEARNED merge table to a symbol array (BPE encoding): repeatedly
  * find the adjacent pair with the lowest merge rank and apply it greedily
  * left-to-right ([[MergeAdjacentPair]] semantics), until no adjacent pair
  * is in the table — the standard BPE encoder loop. `merges` is the
  * rank-ordered output of the learner. Per-WORD-VOCABULARY cardinality
  * (encode each distinct word once, join back) → CodegenFallback. Null
  * elements never merge. */
case class ApplyBpeMerges(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "apply_bpe_merges"

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var syms = new Array[String](arr.numElements())
    var i = 0
    while (i < syms.length) {
      val u = arr.getUTF8String(i)
      syms(i) = if (u == null) null else u.toString
      i += 1
    }
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j + 1 < syms.length) {
        if (syms(j) != null && syms(j + 1) != null) {
          val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
          if (r < bestRank) bestRank = r
        }
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (l, r) = merges(bestRank)
        val out = new Array[String](syms.length)
        var k = 0
        j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
            out(k) = l + r; k += 1; j += 2
          } else { out(k) = syms(j); k += 1; j += 1 }
        }
        syms = java.util.Arrays.copyOf(out, k)
        done = syms.length < 2
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      syms.map(s => if (s == null) null else UTF8String.fromString(s))
        .asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): ApplyBpeMerges =
    copy(child = newChild)
}

/** Per-document character statistics in ONE pass over the string: code-point
  * count, distinct code points, and Shannon entropy in bits — the
  * gibberish/boilerplate quality signal (near-zero entropy = one repeated
  * char; English prose sits ~4.1-4.5 bits/char). Computed per row with no
  * shuffle at all — the relational alternative (explode chars → (doc, char)
  * aggregate) moves a row PER CHARACTER of the corpus, ~3 orders of
  * magnitude more shuffle at 100 TB. Entropy uses the cancellation-light
  * form `log2(n) − Σ k·log2(k) / n`, mirrored term-for-term by the DuckDB
  * oracle. Per-document cardinality → CodegenFallback. Empty string →
  * (0, 0, null). */
case class CharStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = true)))
  override def prettyName: String = "char_stats"

  override protected def nullSafeEval(s: Any): Any = {
    val cps = s.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n == 0) org.apache.spark.sql.catalyst.InternalRow(0L, 0, null)
    else {
      java.util.Arrays.sort(cps)
      val ln2 = math.log(2.0)
      var distinct = 0
      var sum = 0.0
      var i = 0
      while (i < n) {
        var j = i
        while (j < n && cps(j) == cps(i)) j += 1
        val k = (j - i).toDouble
        sum += k * (math.log(k) / ln2)
        distinct += 1
        i = j
      }
      val entropy = math.log(n.toDouble) / ln2 - sum / n
      org.apache.spark.sql.catalyst.InternalRow(n.toLong, distinct, entropy)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD via `java.text.Normalizer`) —
  * the canonical-form cleaning step that makes visually-identical strings
  * byte-identical BEFORE any hash-based dedup/token op sees them (a
  * decomposed `é` and a composed `é` otherwise hash apart). Spark has no
  * built-in for this; per-document cardinality → CodegenFallback. The fast
  * path (`isNormalized` — true for all-ASCII) skips the rebuild, so the
  * common case is one scan of the string, zero allocation. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String]
    val jstr = str.toString
    if (java.text.Normalizer.isNormalized(jstr, f)) str
    else UTF8String.fromString(java.text.Normalizer.normalize(jstr, f))
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Column-level entry points for the kernels above. */
/** Fused signed-projection kernel — the codegen form of
  * [[graft.operators.Similarity.jlProject]]'s lambda tower. The HOF form
  * (`transform` × `aggregate`) is interpreted with per-element boxing:
  * k×d ≈ 1024 boxed lambda evaluations per VECTOR, on the map path every
  * vector takes. This is a tight primitive double loop over the flattened
  * row-major k×d sign matrix (a reference object — baked once per task,
  * not per row), with the SAME per-coordinate boundary rounding as
  * `stableRound` (`BigDecimal.valueOf(x/scale + 1e-9).setScale(6,
  * HALF_UP)` — bit-identical to Catalyst's `Round` on double, so kernel
  * and lambda outputs are equal and the s27 oracle is unchanged).
  * Null result for a dimension mismatch or a null element. */
case class SignedProject(
    child: Expression, signs: Array[Double], outDim: Int, scale: Double)
    extends UnaryExpression {
  private def dims: Int = signs.length / outDim
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "signed_project"

  private def elemAccessor: String =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case t => throw new IllegalArgumentException(
        s"signed_project: unsupported element type $t")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = dims
    if (v.numElements() != d) return null
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val res = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      var i = 0
      while (i < d) {
        if (v.isNullAt(i)) return null
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * signs(j * d + i)
        i += 1
      }
      res(j) = java.math.BigDecimal.valueOf(s / scale + 1e-9)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sg = ctx.addReferenceObj("signs", signs, "double[]")
      val res = ctx.freshName("res")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      val d = dims
      s"""
         |if ($a.numElements() != $d) { ${ev.isNull} = true; } else {
         |  double[] $res = new double[$outDim];
         |  boolean $bad = false;
         |  for (int $j = 0; $j < $outDim && !$bad; $j++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $d; $i++) {
         |      if ($a.isNullAt($i)) { $bad = true; break; }
         |      $s += ((double) $a.$elemAccessor($i)) * $sg[$j * $d + $i];
         |    }
         |    if (!$bad) {
         |      $res[$j] = java.math.BigDecimal.valueOf($s / $scale + 1e-9)
         |        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |    }
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignedProject =
    copy(child = newChild)
}

object ArrayKernels {

  /** Register the kernels as SQL functions (via SparkSessionExtensions), so
    * `spark.sql` users get the same codegen'd kernels:
    * `SELECT sorted_long_intersect_count(a, b) FROM …`. */
  def registerSql(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    def info(name: String, clazz: Class[_]) =
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(clazz.getName, name)
    ext.injectFunction((FunctionIdentifier("long_array_agree"),
      info("long_array_agree", classOf[LongArrayAgree]),
      (es: Seq[Expression]) => LongArrayAgree(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("long_array_first_equal"),
      info("long_array_first_equal", classOf[LongArrayFirstEqual]),
      (es: Seq[Expression]) => LongArrayFirstEqual(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("sorted_long_intersect_count"),
      info("sorted_long_intersect_count", classOf[SortedLongIntersectCount]),
      (es: Seq[Expression]) => SortedLongIntersectCount(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("sorted_jaccard_geq"),
      info("sorted_jaccard_geq", classOf[SortedJaccardGeq]),
      (es: Seq[Expression]) => SortedJaccardGeq(es(0), es(1), es(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toDouble
        case other => throw new IllegalArgumentException(
          s"sorted_jaccard_geq(a, b, t): t must be a literal, got $other")
      })))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", classOf[ShingleHashes]),
      (es: Seq[Expression]) => ShingleHashes(es(0), es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"shingle_hashes(text, k): k must be a literal, got $other")
      })))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", classOf[MinHashSig]),
      (es: Seq[Expression]) => MinHashSig(es(0), es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"minhash_sig(hashes, n): n must be a literal, got $other")
      })))
  }
  private def c(e: Expression): Column = GraftExpr.column(e)
  private def e(col: Column): Expression = GraftExpr.expression(col)

  def hash56(s: Column): Column = c(Hash56Expr(e(s)))
  def phraseCountKernel(tokens: Column, terms: Seq[String]): Column =
    c(PhraseCount(e(tokens), terms.toArray))
  def charShingles(s: Column, k: Int): Column = c(CharShingles(e(s), k))

  def langProfileOverlap(
      s: Column, k: Int, profiles: Seq[(String, Seq[String])]): Column =
    c(LangProfileOverlap(e(s), k, profiles))
  def agreeCount(a: Column, b: Column): Column = c(LongArrayAgree(e(a), e(b)))
  def vecCosine(a: Column, b: Column): Column = c(VecCosine(e(a), e(b)))
  def simHash56(tokens: Column): Column = c(SimHash56(e(tokens)))
  def winnowFingerprint(norm: Column, k: Int, window: Int, take: Int): Column =
    c(WinnowFingerprint(e(norm), k, window, take))
  def firstEqualIndex(a: Column, b: Column): Column = c(LongArrayFirstEqual(e(a), e(b)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    c(SortedLongIntersectCount(e(a), e(b)))
  def sortedJaccardGeq(a: Column, b: Column, threshold: Double): Column =
    c(SortedJaccardGeq(e(a), e(b), threshold))
  def shingleHashes(s: Column, k: Int): Column = c(ShingleHashes(e(s), k))
  def sortedTokenHashes(a: Column): Column = c(SortedTokenHashes(e(a)))
  def minHashSig(hashes: Column, numHashes: Int): Column =
    c(MinHashSig(e(hashes), numHashes))
  def mergeAdjacentPair(symbols: Column, left: String, right: String): Column =
    c(MergeAdjacentPair(e(symbols), left, right))
  def applyBpeMerges(symbols: Column, merges: Seq[(String, String)]): Column =
    c(ApplyBpeMerges(e(symbols), merges.toArray))
  def vecL2Dist(a: Column, b: Column): Column = c(VecL2Dist(e(a), e(b)))
  def signedProject(
      v: Column, signs: Array[Double], outDim: Int, scale: Double): Column =
    c(SignedProject(e(v), signs, outDim, scale))
  def charStats(s: Column): Column = c(CharStats(e(s)))
  def unicodeNormalize(s: Column, form: String): Column = {
    require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
      s"unicodeNormalize: form must be NFC/NFD/NFKC/NFKD, got $form")
    c(UnicodeNormalize(e(s), form))
  }
}
