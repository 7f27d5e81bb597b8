package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Shared n-dimensional Hilbert walk — Skilling's transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004; public
  * domain): axes → transposed index by the inverse-undo exchange/invert
  * sweep, gray encode, then bit-interleave the transposed words into one
  * scalar (dimension 0 owns the most significant bit of each level —
  * the [[graft.operators.Layout.withZValue]] convention). Called from
  * BOTH the interpreted eval and the generated code (the static
  * forwarder keeps the kernel inside whole-stage codegen as a single
  * call), and mirrored level-for-level by the generated DuckDB CTE
  * chain ([[graft.operators.Layout.hilbertSqlN]]).
  *
  * MUTATES `xs` (the caller owns the scratch array — codegen reuses one
  * per operator instance). Inputs must already be bucketed to
  * `[0, 2^bits)`; `n·bits ≤ 63` keeps the index in a signed long. */
object HilbertKernel {
  def index(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    // inverse undo: for each level Q (high→low, excluding 1), exchange or
    // invert the low bits below Q — the i-loop is ORDER-DEPENDENT (each
    // step reads/writes xs(0)), which is why the SQL replay unrolls it
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((xs(i) & q) != 0L) xs(0) ^= p
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // gray encode
    var i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((xs(n - 1) & q) != 0L) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // interleave the transposed words: level ℓ contributes n bits, word 0
    // most significant within the level
    var h = 0L
    var lvl = bits - 1
    while (lvl >= 0) {
      var j = 0
      while (j < n) {
        h |= ((xs(j) >> lvl) & 1L) << (lvl * n + (n - 1 - j))
        j += 1
      }
      lvl -= 1
    }
    h
  }
}

/** N-dimensional Hilbert index of already-bucketed coordinates — the
  * [[HilbertIndex]] 2-D kernel generalized (round-14 verdict task 6:
  * 3-4 layout columns is the common lake case, and it is where Hilbert's
  * tighter boxes beat z-order hardest). Same contract: inputs in
  * `[0, 2^bits)` (caller buckets), `n·bits ≤ 63`, null in → null out.
  * The per-level state dependency makes this a native kernel, not a
  * Column fold — an unrolled expression tree grows ~`(2n)^bits` nodes. */
case class HilbertIndexN(children: Seq[Expression], bits: Int)
    extends Expression with ExpectsInputTypes {
  require(children.size >= 2, s"need >= 2 dims, got ${children.size}")
  require(bits >= 1 && bits * children.size <= 63,
    s"bits*dims must fit a signed long, got $bits x ${children.size}")

  // every child must already be LongType (round-15 advice: eval casts
  // with asInstanceOf[Long], so an int child would throw in interpreted
  // mode while codegen silently widened — declare the contract so misuse
  // fails at ANALYSIS time, identically on both paths). Return type is
  // inferred: AbstractDataType is private[sql], unnamable from here.
  override def inputTypes = Seq.fill(children.size)(LongType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "hilbert_index_n"

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertKernel.index(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    // one scratch array per operator instance, reused across rows
    val arr = ctx.addMutableState("long[]", "hilbXs",
      v => s"$v = new long[$n];")
    val evals = children.map(_.genCode(ctx))
    val anyNull =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ")
      else "false"
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    val nullCheck =
      if (nullable)
        code"""
          |boolean ${ev.isNull} = ($anyNull);
          |long ${ev.value} = 0L;
          |if (!${ev.isNull}) {
          |  $fill
          |  ${ev.value} = graft.functions.HilbertKernel.index($arr, $bits);
          |}
        """.stripMargin
      else
        code"""
          |long ${ev.value} = 0L;
          |$fill
          |${ev.value} = graft.functions.HilbertKernel.index($arr, $bits);
        """.stripMargin
    val evalCode = evals.map(_.code).reduce(_ + _)
    if (nullable)
      ev.copy(code = code"$evalCode" + nullCheck)
    else
      ev.copy(code = code"$evalCode" + nullCheck, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndexN =
    copy(children = newChildren)
}
