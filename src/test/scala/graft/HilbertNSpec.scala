package graft

import org.apache.spark.sql.functions._

import graft.functions.HilbertKernel
import graft.operators.Layout

/** N-dimensional Hilbert curve (Skilling transpose walk): the two defining
  * properties — bijection onto [0, 2^(n·b)) and unit-step adjacency of
  * consecutive indices — exhaustively verified per (dims, bits), plus
  * DataFrame plumbing and codegen/interpreted parity. */
class HilbertNSpec extends SparkSpec {

  import spark.implicits._

  private def cells(n: Int, bits: Int): Seq[Array[Long]] = {
    val side = 1L << bits
    def rec(d: Int): Seq[List[Long]] =
      if (d == 0) Seq(Nil)
      else for (rest <- rec(d - 1); v <- 0L until side) yield v :: rest
    rec(n).map(_.toArray)
  }

  private def checkCurve(n: Int, bits: Int): Unit = {
    val total = 1L << (n * bits)
    val byIndex = cells(n, bits)
      .map(xs => HilbertKernel.index(xs.clone(), bits) -> xs.toSeq)
      .toMap
    assert(byIndex.size.toLong === total, s"n=$n bits=$bits not a bijection")
    assert(byIndex.keys.min === 0L && byIndex.keys.max === total - 1)
    (1L until total).foreach { h =>
      val a = byIndex(h - 1)
      val b = byIndex(h)
      val dist = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      assert(dist === 1L,
        s"n=$n bits=$bits: steps $a -> $b at h=$h not grid-adjacent")
    }
  }

  test("kernel: bijection + unit-step adjacency, exhaustive") {
    checkCurve(2, 3) //  64 cells
    checkCurve(3, 2) // 512 cells... 8^... 2^6 = 64? n*b=6 -> 64 cells
    checkCurve(3, 3) // 2^9 = 512 cells
    checkCurve(4, 2) // 2^8 = 256 cells
  }

  test("withHilbertValueN == kernel over explicitly-bucketed coords, " +
      "through codegen (the default path)") {
    val bits = 3
    val df = (for (x <- 0 until 8; y <- 0 until 8; z <- 0 until 8)
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    // spans are exactly [0, 7] so bucket(c, 3) is the identity
    val got = Layout.withHilbertValueN(df, Seq("x", "y", "z"), bits)
      .select("x", "y", "z", "h_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got.size === 512)
    got.foreach { case ((x, y, z), h) =>
      assert(h === HilbertKernel.index(Array(x, y, z), bits), s"($x,$y,$z)")
    }
  }

  test("withHilbertValueN: null dims bucket to 0; integral/arity guards") {
    val df = Seq((Some(1L), 2L, 3L), (None, 2L, 3L)).toDF("a", "b", "c")
    val out = Layout.withHilbertValueN(df, Seq("a", "b", "c"), 2)
      .select("a", "h_value").collect()
    assert(out.length === 2 && out.forall(!_.isNullAt(1)))
    intercept[IllegalArgumentException] {
      Layout.withHilbertValueN(df, Seq("a"), 4)
    }
    intercept[IllegalArgumentException] {
      Layout.withHilbertValueN(df, Seq("a", "b", "c"), 22) // 66 bits
    }
    intercept[IllegalArgumentException] {
      Layout.withHilbertValueN(
        Seq((1.5, 1L, 1L)).toDF("a", "b", "c"), Seq("a", "b", "c"), 2)
    }
    // direct-expression misuse fails at ANALYSIS time on both eval paths
    // (round-15 advice: a raw Int child used to ClassCastException only
    // in interpreted mode while codegen silently widened)
    val intDf = Seq((1, 2)).toDF("x", "y")
    intercept[org.apache.spark.sql.AnalysisException] {
      intDf.select(org.apache.spark.sql.GraftExpr.column(
        graft.functions.HilbertIndexN(
          Seq("x", "y").map(c => org.apache.spark.sql.GraftExpr
            .expression(col(c))), 4))).collect()
    }
  }

  test("3-dim hilbert clusters tighter than 3-dim z-order on the same " +
      "buckets (total box volume over 16 range-files)") {
    // three correlated-ish dims over a 64^3 grid, 4096 rows
    val df = (0 until 4096).map { i =>
      ((i * 37L) % 64L, (i * 101L) % 64L, (i * 11L) % 64L, i.toLong)
    }.toDF("a", "b", "c", "id")
    def volume(vdf: org.apache.spark.sql.DataFrame, vCol: String): Long =
      Layout.fileManifest(vdf, Seq(col(vCol).asc, col("id").asc), 16,
          Seq("a", "b", "c"))
        .withColumn("_vol",
          (col("a_max") - col("a_min") + 1) *
            (col("b_max") - col("b_min") + 1) *
            (col("c_max") - col("c_min") + 1))
        .agg(sum("_vol")).collect()(0).getLong(0)
    val hv = volume(Layout.withHilbertValueN(df, Seq("a", "b", "c"), 6), "h_value")
    val zv = volume(Layout.withZValue(df, Seq("a", "b", "c"), 6), "z_value")
    assert(hv < zv, s"hilbert3 volume $hv not tighter than z $zv")
  }
}
