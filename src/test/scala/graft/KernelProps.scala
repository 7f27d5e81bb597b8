package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

import graft.functions.{kernels, Hash56}

/** ScalaCheck properties for the pure (no-Spark) kernel functions — the JVM
  * loops under the Catalyst expressions (SURVEY §5.3). */
object KernelProps extends Properties("kernels") {

  property("sortDistinct == sorted+distinct") =
    forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { xs =>
      val arr = xs.toArray
      val n = kernels.sortDistinct(arr)
      arr.take(n).toSeq == xs.distinct.sorted
    }

  property("sortDistinct output feeds a correct merge intersect") =
    forAll(
      Gen.listOf(Gen.chooseNum(0L, 50L)),
      Gen.listOf(Gen.chooseNum(0L, 50L))) { (xs, ys) =>
      val a = xs.toArray; val na = kernels.sortDistinct(a)
      val b = ys.toArray; val nb = kernels.sortDistinct(b)
      // same merge scan the SortedLongIntersectCount codegen emits
      var i = 0; var j = 0; var c = 0
      while (i < na && j < nb) {
        if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      c == xs.toSet.intersect(ys.toSet).size
    }

  property("Hash56 == first-14-hex-chars-of-md5 parsed base 16") =
    forAll(Gen.asciiPrintableStr) { s =>
      val bytes = s.getBytes("UTF-8")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      Hash56(bytes) == java.lang.Long.parseLong(hex.take(14), 16)
    }

  property("Hash56 is non-negative (fits DuckDB BIGINT cast)") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      Hash56(bs.map(_.toByte).toArray) >= 0L
    }

  property("splitmix64 is injective on a sample (no accidental collisions)") =
    forAll(Gen.listOfN(100, Gen.chooseNum(Long.MinValue, Long.MaxValue))) { xs =>
      val d = xs.distinct
      d.map(kernels.splitmix64).distinct.size == d.size
    }

  property("fnv1a64 deterministic across copies") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val arr = bs.map(_.toByte).toArray
      kernels.fnv1a64(arr) == kernels.fnv1a64(arr.clone())
    }

  property("SortedJaccardGeq: (result >= t) iff (double-formula jaccard >= t)") = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val arrGen = Gen.listOf(Gen.chooseNum(0L, 30L)).map(_.distinct.sorted)
    // thresholds deliberately include binary-INEXACT values (0.4, 0.3, 1/3…)
    // whose ceil'd floating requirement over-rounds without the integer fixup
    val tGen = Gen.oneOf(0.0, 0.3, 1.0 / 3.0, 0.4, 0.5, 0.6, 2.0 / 3.0, 0.75, 1.0)
    forAll(arrGen, arrGen, tGen) { (a, b, t) =>
      val expr = graft.functions.SortedJaccardGeq(
        Literal.create(new GenericArrayData(a.toArray), ArrayType(LongType, false)),
        Literal.create(new GenericArrayData(b.toArray), ArrayType(LongType, false)),
        t)
      val got = expr.eval(null).asInstanceOf[Double]
      val inter = a.toSet.intersect(b.toSet).size
      val exact = inter.toDouble / (a.size + b.size - inter).toDouble
      // identical filter outcome, and emitted values are the exact jaccard
      Prop(
        ((got >= t) == (exact >= t)) &&
          (got == -1.0 || got == exact || (got.isNaN && exact.isNaN)))
    }
  }

  property("minhash containment: signature of a superset is elementwise <=") =
    forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)),
      Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { (xs, extra) =>
      def sig(hs: Seq[Long]): Seq[Long] = {
        val seeds = (0 until 16).map(i => kernels.splitmix64(0x5EED5EED00000000L + i))
        seeds.map(s => hs.map(h => kernels.splitmix64(h ^ s)).min)
      }
      Prop(sig(xs ++ extra).zip(sig(xs)).forall { case (sup, sub) => sup <= sub })
    }

  // ---- expression-eval properties for the round-9 kernels -----------------
  // (interpreted nullSafeEval through Literal children — the same code path
  // whole-stage codegen mirrors)

  private val vecGen = Gen.listOfN(
    8, Gen.chooseNum(-100.0, 100.0).map(v => math.rint(v * 64) / 64))

  private def l2(a: Seq[Double], b: Seq[Double]): Double =
    graft.functions.VecL2Dist(
      Literal.create(new GenericArrayData(a.toArray), ArrayType(DoubleType, false)),
      Literal.create(new GenericArrayData(b.toArray), ArrayType(DoubleType, false)))
      .eval(null).asInstanceOf[Double]

  property("vecL2: symmetric, zero iff equal, matches reference sum") =
    forAll(vecGen, vecGen) { (a, b) =>
      val d = l2(a, b)
      val ref = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      Prop(d == l2(b, a) && d == ref && ((d == 0.0) == (a == b)))
    }

  property("vecL2: triangle inequality (to float tolerance)") =
    forAll(vecGen, vecGen, vecGen) { (a, b, c) =>
      Prop(l2(a, c) <= l2(a, b) + l2(b, c) + 1e-9)
    }

  private def evalSyms(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[String] =
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toSeq[org.apache.spark.unsafe.types.UTF8String](StringType)
      .map(u => if (u == null) null else u.toString)

  private val symGen = Gen.listOf(Gen.oneOf("a", "b", "c", "ab", "bc"))
  private def symLit(xs: Seq[String]) = Literal.create(
    new GenericArrayData(xs.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
    ArrayType(StringType, true))

  property("mergeAdjacentPair: concatenation preserved, length shrinks by merges applied") =
    forAll(symGen, Gen.oneOf(("a", "b"), ("b", "c"), ("a", "a"))) { (xs, p) =>
      val out = evalSyms(graft.functions.MergeAdjacentPair(symLit(xs), p._1, p._2))
      Prop(out.mkString == xs.mkString && out.size <= xs.size)
    }

  property("applyBpeMerges: concatenation preserved and fixpoint reached") =
    forAll(symGen) { xs =>
      val merges = Array(("a", "b"), ("ab", "c"), ("b", "c"), ("a", "a"))
      val out = evalSyms(graft.functions.ApplyBpeMerges(symLit(xs), merges))
      val table = merges.toSet
      val noPairLeft = out.size < 2 ||
        out.sliding(2).forall(p => !table.contains((p(0), p(1))))
      Prop(out.mkString == xs.mkString && noPairLeft)
    }
}
