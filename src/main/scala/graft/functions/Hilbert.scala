package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve index of two already-bucketed coordinates in
  * `[0, 2^bits)` — the locality-preserving alternative to the Morton/Z
  * interleave ([[graft.operators.Layout.withZValue]]): consecutive Hilbert
  * indices are always grid NEIGHBORS (Manhattan distance 1), where the Z
  * curve jumps across the plane at every power-of-two boundary, so files
  * cut from a Hilbert-sorted order cover tighter bounding boxes and prune
  * better on box predicates (measured in q92b).
  *
  * The standard iterative xy→d walk (Wikipedia "Hilbert curve", public
  * domain pseudocode): per level, quadrant selection + reflect/swap
  * rotation. The per-level state dependency is why this is a NATIVE
  * expression and not a Column fold: each level reads the previous level's
  * (x, y) twice, so an unrolled expression tree grows ~4^bits nodes —
  * past any codegen budget at bits = 8 — while this kernel is a 10-line
  * primitive loop inside whole-stage codegen. The DuckDB oracle unrolls
  * the same walk as a generated chain of `bits` CTE levels
  * ([[graft.operators.Layout.hilbertSql]]), each materializing (hx, hy,
  * hd) once — linear growth, bit-identical results.
  *
  * Inputs outside `[0, 2^bits)` are a caller error (the bucketing upstream
  * guarantees the range); bits ≤ 31 keeps `s·s` and the accumulated index
  * inside a long. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a; long $y = $b;
         |${ev.value} = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  ${ev.value} += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
