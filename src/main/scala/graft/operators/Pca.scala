package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, GraftExpr}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Principal-component analysis over an embedding column — the dimensionality
  * reducer an LLM-data pipeline runs before clustering/retrieval at scale
  * (whiten 1024-d vectors to the 64 directions that carry the variance, or
  * diagnose a collapsed embedding space by reading the spectrum). The
  * reference has no linear-algebra surface (its analytics stop at OEE-style
  * scalar metrics, `dod-etl/.../OeeEventsProcessor.java`-era scope); this is
  * north-star extension surface like the rest of [[Similarity]].
  *
  * Design for 100 TB: the ONLY corpus-sized work is one aggregate pass that
  * folds every vector into a fixed-size moment buffer (count + d sums + the
  * d(d+1)/2 upper triangle of the Gram matrix). The buffer is partial-
  * aggregated — each task folds its rows locally and the shuffle moves one
  * O(d²) buffer per task, never a vector. The eigensolve then runs on the
  * driver over the d×d covariance — O(d³) on a d≤~2000 matrix is
  * milliseconds and touches no data; this is the correct split (same shape
  * as every distributed PCA: Spark MLlib's `RowMatrix
  * .computePrincipalComponents` also Gram-accumulates then solves locally).
  * Projection back over the corpus is a per-row codegen kernel with the
  * (k×d) component matrix as a task-constant reference — no join, no
  * shuffle, stays inside whole-stage codegen.
  */
object Pca {

  /** One-pass second-moment buffer: `n` rows folded, per-dimension sums, and
    * the packed upper triangle of Σ xxᵀ (index of (i ≤ j):
    * `i*d - i*(i-1)/2 + (j-i)`). Arrays allocate lazily on the first row so
    * the aggregator needs no up-front dimension. */
  final case class GramBuf(n: Long, sum: Array[Double], gram: Array[Double])

  /** Fitted model. `components` is row-major (k rows of length d),
    * orthonormal, eigenvalue-descending; `eigenvalues` are the covariance
    * eigenvalues (per-component variance, population normalization);
    * `totalVariance` is the covariance trace, so
    * `eigenvalues(i) / totalVariance` is the variance-explained ratio. */
  final case class PcaModel(
      n: Long,
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]],
      totalVariance: Double) {
    def dim: Int = mean.length
    def k: Int = components.length
    def varianceExplained: Array[Double] =
      if (totalVariance > 0) eigenvalues.map(_ / totalVariance)
      else eigenvalues.map(_ => 0.0)
  }

  private final class GramAgg extends Aggregator[Seq[Double], GramBuf, GramBuf] {
    override def zero: GramBuf = GramBuf(0L, Array.empty, Array.empty)

    override def reduce(b: GramBuf, v: Seq[Double]): GramBuf = {
      val d = v.length
      val out =
        if (b.n == 0L) GramBuf(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
        else b
      require(out.sum.length == d,
        s"pca: mixed vector dimensions (${out.sum.length} vs $d)")
      // deserialized buffer is task-private — in-place accumulation is the
      // standard Aggregator idiom (no other reader until the next serialize)
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = v(i); out.sum(i) += x(i); i += 1 }
      var idx = 0
      i = 0
      while (i < d) {
        var j = i
        val xi = x(i)
        while (j < d) { out.gram(idx) += xi * x(j); j += 1; idx += 1 }
        i += 1
      }
      GramBuf(out.n + 1, out.sum, out.gram)
    }

    override def merge(a: GramBuf, b: GramBuf): GramBuf = mergeState(a, b)

    override def finish(b: GramBuf): GramBuf = b
    override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  }

  /** Rows the moment pass (and the oracled covariance slice) accepts:
    * non-null, non-empty, and NO null elements — a vector with a null
    * coordinate has no well-defined contribution to every (i, j) product,
    * so it is complete-case excluded (the typed deserializer would
    * otherwise die on the null element with an opaque error). */
  private def fittable(vecCol: String): Column =
    col(vecCol).isNotNull && size(col(vecCol)) > 0 &&
      !exists(col(vecCol), _.isNull)

  /** One corpus pass to the moment buffer — the separable half of [[fit]],
    * exposed because the buffer is EXACTLY mergeable ([[mergeState]]): the
    * incremental-fit primitive, same build-once/extend-cheaply shape as the
    * BM25 and near-dup indexes. */
  def moments(df: DataFrame, vecCol: String): GramBuf = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(fittable(vecCol))
      .select(col(vecCol).cast("array<double>"))
      .as[Seq[Double]]
      .select(new GramAgg().toColumn)
      .head()
  }

  /** Merge two moment buffers — moments of the UNION of their inputs,
    * exactly (sums of sums): `fitFromMoments(mergeState(a, b), k)` equals a
    * fresh fit over both corpora without rescanning either. Driver-side on
    * two O(d²) arrays (the aggregator's own partial-merge delegates here —
    * ONE definition of the exact-merge invariant). Either side may be
    * empty; in-place on the left buffer's arrays when both are non-empty
    * (safe for the task-private aggregation buffers; pass a copy if the
    * caller needs `a` preserved). */
  def mergeState(a: GramBuf, b: GramBuf): GramBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      require(a.sum.length == b.sum.length,
        s"pca: mixed vector dimensions (${a.sum.length} vs ${b.sum.length})")
      var i = 0
      while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
      i = 0
      while (i < a.gram.length) { a.gram(i) += b.gram(i); i += 1 }
      GramBuf(a.n + b.n, a.sum, a.gram)
    }

  /** Persist a moment buffer as a one-row parquet (n + d + d(d+1)/2 doubles
    * — KBs at embedding dims; never data-sized). */
  def saveState(spark: org.apache.spark.sql.SparkSession, buf: GramBuf, path: String): Unit = {
    import spark.implicits._
    Seq(buf).toDS().write.mode("overwrite").parquet(path)
  }

  def loadState(spark: org.apache.spark.sql.SparkSession, path: String): GramBuf = {
    import spark.implicits._
    spark.read.parquet(path).as[GramBuf].head()
  }

  /** Fit a `k`-component PCA on `vecCol` (array of float/double; null and
    * empty vectors are skipped). One corpus pass (see class doc), then a
    * driver-side cyclic-Jacobi eigensolve of the d×d population covariance.
    * Deterministic: Jacobi rotation order is fixed, eigenpairs sort by
    * (eigenvalue desc, original index asc), and each component's sign is
    * canonicalized so its largest-|coordinate| entry (lowest index on ties)
    * is positive.
    *
    * Incremental refresh: keep the [[moments]] buffer ([[saveState]]),
    * [[mergeState]] each new batch's buffer into it, and
    * [[fitFromMoments]] — the merged fit is EXACT (not an approximation),
    * because the buffer is a pair of linear statistics. */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel =
    fitFromMoments(moments(df, vecCol), k)

  /** Eigensolve a moment buffer into a model — the driver-side half of
    * [[fit]]; see [[mergeState]] for the incremental path. */
  def fitFromMoments(buf: GramBuf, k: Int): PcaModel = {
    require(k >= 1, s"pca: k must be >= 1, got $k")
    require(buf.n > 0, "pca: no non-null vectors to fit on")
    val d = buf.sum.length
    require(k <= d, s"pca: k=$k exceeds vector dimension $d")
    val n = buf.n.toDouble
    val mean = buf.sum.map(_ / n)
    // population covariance C = gram/n - mean meanᵀ, unpacked to full sym
    val cov = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = buf.gram(idx) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; idx += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigSym(cov)
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i)).take(k)
    val components = order.map { oi =>
      val v = Array.tabulate(d)(r => eigVecs(r)(oi))
      // sign canon: largest-|coordinate| entry positive, lowest index on ties
      var best = 0
      var bi = 1
      while (bi < d) { if (math.abs(v(bi)) > math.abs(v(best))) best = bi; bi += 1 }
      if (v(best) < 0) { var t = 0; while (t < d) { v(t) = -v(t); t += 1 } }
      v
    }.toArray
    val trace = (0 until d).map(t => cov(t)(t)).sum
    PcaModel(buf.n, mean, order.map(oi => math.max(eigVals(oi), 0.0)).toArray,
      components, trace)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix (in-place on a copy).
    * Textbook construction (Golub & Van Loan §8.5): sweep all (p,q) pairs,
    * rotate away off-diagonal mass, until convergence. Returns
    * (eigenvalues, eigenvector columns). O(d³) per sweep — driver-side on a
    * d×d profile, never on data. */
  private[operators] def jacobiEigSym(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 64
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-12 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Project `vecCol` onto the model's components: per row,
    * `out_j = Σ_i (x_i - mean_i) · comp_j_i` — the centered matvec as ONE
    * codegen kernel with the (k×d) matrix as a task constant. Null vector or
    * dimension mismatch → null projection (kept, caller filters).
    *
    * `whiten = true` rescales each output coordinate by `1/√λ_j` (unit
    * variance per component — the normalization k-means/SemDeDup-style
    * clustering over PCA space wants); folded into the task-constant matrix,
    * zero per-row cost. A zero-variance component whitens to all-zero
    * output (no division blowup). */
  def project(
      df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "projection", whiten: Boolean = false): DataFrame = {
    val rows =
      if (!whiten) model.components
      else model.components.zip(model.eigenvalues).map { case (row, ev) =>
        if (ev > 1e-12) { val s = 1.0 / math.sqrt(ev); row.map(_ * s) }
        else row.map(_ => 0.0)
      }
    // cast like fit() does, so a model fit on an int/long-typed array column
    // projects instead of hitting the kernel's float/double-only accessors
    df.withColumn(outCol,
      GraftExpr.column(CenteredProject(
        GraftExpr.expression(col(vecCol).cast("array<double>")),
        model.mean, rows)))
  }

  /** Mean squared reconstruction error of projecting to the model's k
    * components — ‖x−μ‖² − ‖Wᵀ(x−μ)‖² per row (W orthonormal), averaged.
    * One scan, no reconstruction materialized. */
  def reconstructionError(df: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    val proj = project(df, vecCol, model, "_p")
      .where(col("_p").isNotNull)
      .select(
        aggregate(zip_with(col(vecCol).cast("array<double>"),
          lit(model.mean), (x, m) => (x - m) * (x - m)),
          lit(0.0), (acc, t) => acc + t).as("_tot"),
        aggregate(col("_p"), lit(0.0), (acc, t) => acc + t * t).as("_kept"))
    proj.agg(stableRound(avg(col("_tot") - col("_kept")), 6).as("mse"))
  }

  /** The ORACLED slice of the one-pass moment computation: population
    * covariance of the first `dims` coordinates, one row per unordered pair
    * `(i, j, n, cov)` (1-based, i ≤ j, cov rounded 6 dp). Same single-
    * aggregate + `stack`-unpivot shape as [[Profiling.correlationMatrix]];
    * the full-dimension [[fit]] path uses the typed buffer instead because
    * d(d+1)/2 separate aggregate expressions stop scaling around d≈30 (for
    * d=1024 that is 500k codegen'd aggregates) while ONE O(d²) buffer is
    * flat. Rows are complete-case on the sliced coordinates (null vectors,
    * short vectors, and vectors with a null element among the first `dims`
    * are skipped — so `n` counts exactly the rows inside every sum),
    * mirroring [[fit]]'s complete-case contract.
    *
    * Oracle mirror (DuckDB):
    * `(SUM(v[i]*v[j]) - SUM(v[i])*SUM(v[j])/n)/n`, ROUND(+1e-9, 6). */
  def covarianceSlice(df: DataFrame, vecCol: String, dims: Int): DataFrame = {
    require(dims >= 1, s"covarianceSlice: dims must be >= 1, got $dims")
    require(dims <= 30,
      s"covarianceSlice is the diagnostic slice — use fit() past d~30, got $dims")
    val v = df
      .where(col(vecCol).isNotNull && size(col(vecCol)) >= dims &&
        !exists(slice(col(vecCol), 1, dims), _.isNull))
      .select(col(vecCol).cast("array<double>").as("_v"))
    val pairs = for { i <- 1 to dims; j <- i to dims } yield (i, j)
    val aggs =
      (1 to dims).map(i => sum(element_at(col("_v"), i)).as(s"_s_$i")) ++
        pairs.map { case (i, j) =>
          sum(element_at(col("_v"), i) * element_at(col("_v"), j)).as(s"_p_${i}_$j")
        }
    val one = v.agg(count(lit(1)).as("_n"), aggs: _*)
    val stacked = pairs
      .map { case (i, j) => s"$i, $j, `_s_$i`, `_s_$j`, `_p_${i}_$j`" }
      .mkString(", ")
    one
      .select(col("_n"),
        expr(s"stack(${pairs.size}, $stacked) as (i, j, _sx, _sy, _sxy)"))
      // empty-input contract: the single-row aggregate always produces a
      // row, so with zero fittable rows the unpivot would emit d(d+1)/2
      // (n=0, cov=null) rows while the documented DuckDB mirror (GROUP BY
      // over the empty filtered relation) emits none — filter to match the
      // bestSplit `WHERE p + n > 0` convention
      .where(col("_n") > 0)
      .select(
        col("i"), col("j"), col("_n").as("n"),
        stableRound(
          (col("_sxy") - col("_sx") * col("_sy") / col("_n")) / col("_n"), 6)
          .as("cov"))
  }
}

/** Centered projection kernel: `(x - mean) · rows_j` for each of k component
  * rows, as one codegen primitive loop (the HOF spelling would interpret
  * k·d lambda calls per row with boxing). The mean and matrix ride along as
  * task-constant reference objects — evaluated zero times per row. */
case class CenteredProject(
    child: Expression, mean: Array[Double], rows: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "centered_project"

  private def elemAccessor: String =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case t => throw new IllegalArgumentException(
        s"centered_project: unsupported element type $t")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = mean.length
    if (x.numElements() != d) return null
    val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val cx = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (x.isNullAt(i)) return null
      cx(i) = (if (isF) x.getFloat(i).toDouble else x.getDouble(i)) - mean(i)
      i += 1
    }
    val out = new Array[Double](rows.length)
    var j = 0
    while (j < rows.length) {
      val row = rows(j)
      var s = 0.0
      i = 0
      while (i < d) { s += cx(i) * row(i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val rowsRef = ctx.addReferenceObj("pcaRows", rows, "double[][]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cx = ctx.freshName("cx")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s")
      s"""
         |final int $d = $meanRef.length;
         |if ($a.numElements() != $d) { ${ev.isNull} = true; } else {
         |  final double[] $cx = new double[$d];
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $cx[$i] = (double) $a.$elemAccessor($i) - $meanRef[$i];
         |  }
         |  if (!${ev.isNull}) {
         |    final double[] $out = new double[$rowsRef.length];
         |    for (int $j = 0; $j < $rowsRef.length; $j++) {
         |      final double[] $row = $rowsRef[$j];
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $d; $i++) { $s += $cx[$i] * $row[$i]; }
         |      $out[$j] = $s;
         |    }
         |    ${ev.value} = new $gad($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CenteredProject =
    copy(child = newChild)
}
