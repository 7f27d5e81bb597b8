package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * North-star extension (not in the reference). Cosine is computed in double
  * precision with Catalyst higher-order functions (`zip_with` + `aggregate`)
  * — codegen'd, no UDF, deterministic summation order.
  *
  * Scale path: [[bruteForceTopK]] is a single broadcast of the query vector +
  * one pass (correct baseline at any scale, O(n·d) work but embarrassingly
  * parallel); [[ivfTopK]] and [[lshTopK]] prune the scan to one coarse cell /
  * LSH bucket first, the standard ANN trade at 100 TB.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused codegen kernel ([[graft.functions.VecCosine]]): one primitive pass
    * for dot + both norms; bit-identical to the HOF composition
    * `dot(a,b)/(l2Norm(a)*l2Norm(b))` (same left-to-right accumulation). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.ArrayKernels.vecCosine(a, b)

  /** Unit-L2-normalized copy of a vector column (the standard pre-step
    * before dot-product ≡ cosine retrieval). The norm is `let`-bound so it
    * computes ONCE per row — inlined into the `transform` lambda it would
    * re-evaluate per ELEMENT (the HOF-inlining trap, a d×-cost bug).
    * Zero vectors map to zero vectors (0/0 → NaN elements would poison
    * downstream sums). */
  def l2Normalize(v: Column): Column =
    graft.operators.let(l2Norm(v)) { n =>
      transform(v, x => when(n === 0.0, 0.0).otherwise(x.cast("double") / n))
    }

  /** Distributed top-k finisher: `orderBy(...).limit(k)` plans as
    * `TakeOrderedAndProject` — each partition keeps its local top-k and only
    * those k·numPartitions rows reach the driver-side merge, vs. a global
    * `Window.orderBy` which funnels every candidate row into one partition.
    * Ties broken by id for determinism. */
  private def topK(sims: DataFrame, idCol: String, k: Int): DataFrame =
    sims.orderBy(col("_sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("_sim"), 6).as("sim"))

  /** Exact top-k cosine neighbors of the vector with id `queryId`.
    * One-row broadcast join + distributed partial top-k. */
  def bruteForceTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("_q"))
    val sims = df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("_q")).as("_sim"))
    topK(sims, idCol, k)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1): derived
    * from md5 of "plane_dim" (identical on every executor AND reproducible in
    * the DuckDB oracle as
    * `(('0x'||substr(md5(p||'_'||i),1,14))::UBIGINT % 2000003)/1000001.5-1`). */
  def planeComponent(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${plane}_${dim}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(14), 16) % 2000003L).toDouble / 1000001.5 - 1.0
  }

  /** Sign-random-projection LSH bucket id: `nPlanes` sign bits. The plane
    * matrix is computed once at the driver and embedded as literal arrays —
    * constants, not per-row hash evaluations.
    *
    * A vector whose length ≠ `dims` raises at execution time: `zip_with`
    * would null-pad the projection, every such row would silently land in
    * bucket 0, and [[lshTopK]] would degrade to a full scan of bucket 0 with
    * no error — fail fast instead (one `size` compare per row, negligible
    * next to the `nPlanes × dims` projection). */
  def lshBucket(vec: Column, nPlanes: Int, dims: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val plane = typedLit((0 until dims).map(i => planeComponent(p, i)))
      val proj = aggregate(
        zip_with(vec, plane, (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    // NULL vectors fail the guard too (size(null) is null → otherwise
    // branch) — previously they silently landed in bucket 0; coalesce keeps
    // the raise_error message non-null so the diagnostic survives
    when(size(vec) === dims, bits.reduce(_ + _))
      .otherwise(raise_error(concat(
        lit(s"lshBucket: expected $dims-dim vector, got "),
        coalesce(size(vec).cast("string"), lit("NULL")))))
  }

  /** ANN via LSH: search only vectors sharing the query's bucket. Recall is
    * approximate by construction; k results are not guaranteed if the bucket
    * is small (the scale/recall trade ANN makes). */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nPlanes: Int = 8, dims: Int = 64): DataFrame = {
    val bucketed = df.withColumn("_bucket", lshBucket(col(vecCol), nPlanes, dims))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_q"), col("_bucket"))
    val cands = bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(q), Seq("_bucket"))
    topK(
      cands.select(col(idCol), cosine(col(vecCol), col("_q")).as("_sim")),
      idCol, k)
  }

  /** Element-wise mean vector per cell — the IVF coarse codebook. Exploded
    * (cell, position) aggregation: shuffles (cells × dims) rows, never
    * collects vectors to the driver. */
  def centroids(df: DataFrame, cellCol: String, vecCol: String): DataFrame =
    df.select(col(cellCol).as("_cell"), posexplode(col(vecCol)).as(Seq("_pos", "_v")))
      .groupBy("_cell", "_pos")
      .agg(avg("_v").as("_avg"))
      .groupBy("_cell")
      .agg(
        transform(
          array_sort(collect_list(struct(col("_pos"), col("_avg")))),
          x => x.getField("_avg")).as("_centroid"))

  /** IVF-style ANN: rank cells by query→centroid cosine, scan only the top
    * `nProbe` cells, then exact top-k within them. */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String, cellCol: String,
      queryId: Long, k: Int, nProbe: Int = 2): DataFrame = {
    val cents = centroids(df, cellCol, vecCol)
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("_q"))
    val probed = cents.crossJoin(broadcast(q))
      .select(col("_cell"), cosine(col("_centroid"), col("_q")).as("_csim"))
      .orderBy(col("_csim").desc, col("_cell"))
      .limit(nProbe)
      .select("_cell")
    val cands = df.filter(col(idCol) =!= queryId)
      .join(broadcast(probed), col(cellCol) === col("_cell"))
      .crossJoin(broadcast(q))
    topK(
      cands.select(col(idCol), cosine(col(vecCol), col("_q")).as("_sim")),
      idCol, k)
  }
}
