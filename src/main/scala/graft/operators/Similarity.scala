package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * North-star extension (not in the reference). Cosine is computed in double
  * precision with Catalyst higher-order functions (`zip_with` + `aggregate`)
  * — codegen'd, no UDF, deterministic summation order.
  *
  * Scale path: [[bruteForceTopK]] is a single broadcast of the query vector +
  * one pass (correct baseline at any scale, O(n·d) work but embarrassingly
  * parallel); [[ivfTopKOneShot]] and [[lshTopKOneShot]] prune the scan to one coarse cell /
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
    * Ties broken by id for determinism. NaN similarities (zero vectors —
    * cosine is 0/0) are excluded: Spark sorts NaN ABOVE every real double,
    * so one zero vector would otherwise be the "nearest" neighbor of
    * everything. */
  private def topK(sims: DataFrame, idCol: String, k: Int): DataFrame =
    sims.filter(col("_sim").isNotNull && !isnan(col("_sim")))
      .orderBy(col("_sim").desc, col(idCol))
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

  /** Fused codegen L2 distance ([[graft.functions.VecL2Dist]]) — the third
    * metric of the retrieval family (cosine = direction, MIPS = magnitude,
    * L2 = position), and the one PCA's centered rotation preserves. */
  def l2Dist(a: Column, b: Column): Column =
    graft.functions.ArrayKernels.vecL2Dist(a, b)

  /** Exact top-k EUCLIDEAN neighbors of `queryId` (nearest = smallest
    * distance; ties to the lowest id; null/mismatched vectors excluded).
    * Same one-row broadcast + distributed partial top-k shape as
    * [[bruteForceTopK]]. Output: `(<idCol>, dist)`, dist rounded 6 dp. */
  def bruteForceL2TopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("_q"))
    df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), l2Dist(col(vecCol), col("_q")).as("_d"))
      .filter(col("_d").isNotNull)
      .orderBy(col("_d").asc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("_d"), 6).as("dist"))
  }

  /** Batch exact L2 top-k — the euclidean form of [[bruteForceBatch]], same
    * broadcast-queries shape and probe contract `(q_id, rank, <idCol>,
    * dist)` (rank 1 = nearest), so [[recallAtK]] consumes it unchanged. */
  def bruteForceL2Batch(
      df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, excludeSelf: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cands = df.crossJoin(broadcast(
      queries.select(col(qIdCol).as("_q_id"), col(qVecCol).as("_q_v"))))
    val kept = if (excludeSelf) cands.filter(col(idCol) =!= col("_q_id")) else cands
    val dists = kept
      .select(col("_q_id"), col(idCol), l2Dist(col(vecCol), col("_q_v")).as("_d"))
      .filter(col("_d").isNotNull)
    TopK.perGroup(dists, Seq("_q_id"), Seq(col("_d").asc, col(idCol).asc), k)
      .select(
        col("_q_id").as("q_id"), col("rank").cast("long").as("rank"),
        col(idCol), round(col("_d"), 6).as("dist"))
  }

  /** PCA-compressed retrieval audit: recall@k of exact L2 search in
    * `dims`-dimensional PCA space against exact L2 search in the original
    * space, for a query sample — prices the d→dims compression the same way
    * [[recallAtK]] prices an IVF probe or s12 prices SQ8. L2 is the right
    * metric because a centered rotation preserves pairwise euclidean
    * distances EXACTLY: at `dims = d` recall is identically 1 (spec-pinned),
    * and truncation error grows only with the discarded eigenvalue mass.
    *
    * Cost: one [[Pca.fit]] corpus pass, one projection pass (codegen
    * kernel), two sample-sized broadcast probe scans. Output:
    * `(q_id, recall)` per sampled query. */
  def pcaL2Recall(
      df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      dims: Int, k: Int): DataFrame = {
    val model = Pca.fit(df, vecCol, dims)
    val proj = Pca.project(df, vecCol, model, "_pv")
      .where(col("_pv").isNotNull)
    val qProj = Pca.project(
        queries.select(col(qIdCol).as("_qq"), col(qVecCol).as("_qv")),
        "_qv", model, "_pq")
      .where(col("_pq").isNotNull)
    val exact = bruteForceL2Batch(
      df, idCol, vecCol, queries, qIdCol, qVecCol, k, excludeSelf = true)
    val approx = bruteForceL2Batch(
      proj, idCol, "_pv", qProj, "_qq", "_pq", k, excludeSelf = true)
    recallAtK(exact, approx, idCol)
  }

  /** Exact top-k MAXIMUM-INNER-PRODUCT neighbors of `queryId` — the
    * retrieval objective when magnitudes carry signal (recommender /
    * learned-retrieval scores), where cosine's normalization is wrong: a
    * long vector pointing roughly at the query should beat a unit vector
    * pointing exactly at it. Same one-row broadcast + distributed
    * partial-top-k shape as [[bruteForceTopK]]. */
  def bruteForceMipsTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("_q"))
    val sims = df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), dot(col(vecCol), col("_q")).as("_sim"))
    topK(sims, idCol, k)
  }

  /** Norm-augmentation MIPS→cosine reduction (the public asymmetric
    * transform of Bachrach et al. / Shrivastava-Li): append
    * `sqrt(M² − ‖x‖²)` to every corpus vector, where `M` is the corpus max
    * norm — every augmented vector then has constant norm `M`, and for a
    * query padded with a literal 0 ([[mipsQueryPad]]),
    * `cos(aug(x), pad(q)) = ⟨x,q⟩ / (M·‖q‖)` — MONOTONE in the inner
    * product. The entire cosine ANN stack ([[buildIvfIndexAuto]] /
    * [[probeIvf]] / [[probeLsh]] / the SQ8 ladder) becomes a MIPS index
    * with no new operator: build on the augmented corpus, probe with
    * padded queries, rerank exactly with [[bruteForceMipsTopK]] semantics
    * if full precision matters.
    *
    * Shape: one corpus pass for the one-row max-norm broadcast, one
    * map-side projection for the append — no shuffle, no UDF. The max
    * vector's own slack is clamped at 0 (float roundoff would otherwise
    * feed sqrt a `-1e-7`).
    *
    * Output: `(idCol, vecCol)` with `vecCol` REPLACED by the augmented
    * `array<double>` (d+1 dims). */
  def augmentForMips(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxNorm = df.agg(max(l2Norm(col(vecCol))).as("_m"))
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(maxNorm))
      .select(
        col(idCol),
        concat(
          transform(col(vecCol), x => x.cast("double")),
          array(sqrt(greatest(
            col("_m") * col("_m") - dot(col(vecCol), col(vecCol)),
            lit(0.0))))).as(vecCol))
  }

  /** Query-side companion of [[augmentForMips]]: pad with a literal 0 so
    * the appended corpus dimension never contributes to the product. */
  def mipsQueryPad(v: Column): Column =
    concat(transform(v, x => x.cast("double")), array(lit(0.0)))

  /** Metadata-FILTERED exact k-NN — "filtered vector search": top-k among
    * only the corpus rows satisfying `pred` (label slice, source slice,
    * license tier…). PRE-filter semantics: the predicate lands in the scan
    * stage before any similarity math (Catalyst pushes it to the parquet
    * reader when it names scannable columns), so the result is the exact
    * top-k OF THE FILTERED SUBSET — not post-filter, which ranks first,
    * drops after, and silently returns fewer than k whenever the global
    * neighbors are mostly disallowed. */
  def bruteForceTopKFiltered(
      df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, pred: Column): DataFrame = {
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("_q"))
    val sims = df.filter(pred && col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("_q")).as("_sim"))
    topK(sims, idCol, k)
  }

  /** Filtered ANN probe over a prebuilt [[IvfIndex]]: top-k restricted to
    * an ALLOW-LIST of corpus ids (the composable form of a metadata
    * predicate — the caller derives `allowed` from any predicate over any
    * table, the probe never needs the metadata columns inside the index).
    * The allow-list is applied as a LEFT SEMI join on the probed cells
    * BEFORE ranking — pre-filter semantics like
    * [[bruteForceTopKFiltered]], so a query returns k allowed neighbors
    * (cells permitting) even when its unfiltered top-k is entirely
    * disallowed. AQE broadcasts the semi join while the allow-list is
    * small and falls back to a shuffle semi when it is half the corpus —
    * both correct; the probed-cell subset, not the full corpus, is what
    * gets filtered either way. */
  def probeIvfFiltered(
      index: IvfIndex, queries: DataFrame, qIdCol: String, qVecCol: String,
      allowed: DataFrame, allowedIdCol: String,
      k: Int, nProbe: Int = 2, excludeSelf: Boolean = false,
      broadcastProbes: Boolean = true, guardBroadcast: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val allowKeys = allowed.select(col(allowedIdCol).as(index.idCol))
    val filteredIndex = index.copy(
      assigned = index.assigned.join(allowKeys, Seq(index.idCol), "left_semi"))
    probeIvf(
      filteredIndex, queries, qIdCol, qVecCol, k, nProbe, excludeSelf,
      broadcastProbes, guardBroadcast)
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
    * bucket 0, and [[lshTopKOneShot]] would degrade to a full scan of bucket 0 with
    * no error — fail fast instead (one `size` compare per row, negligible
    * next to the `nPlanes × dims` projection). */
  def lshBucket(
      vec: Column, nPlanes: Int, dims: Int, planeOffset: Int = 0): Column = {
    val bits = (0 until nPlanes).map { p =>
      val plane = typedLit((0 until dims).map(i => planeComponent(planeOffset + p, i)))
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
    * is small (the scale/recall trade ANN makes).
    *
    * Convenience ONE-SHOT — the name is the warning: builds a throwaway
    * [[LshIndex]] for this single query, paying a full corpus
    * bucket-assignment pass. For repeated or batched retrieval, build once
    * with [[buildLshIndex]] (+ [[LshIndex.persisted]] / [[saveLshIndex]])
    * and probe with [[probeLsh]] — per-query cost is then
    * probe-proportional. */
  def lshTopKOneShot(
      df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nPlanes: Int = 8, dims: Int = 64): DataFrame = {
    val index = buildLshIndex(df, idCol, vecCol, nPlanes, dims)
    // guardBroadcast = false: the query frame is a single-id filter (≤ 1
    // row by construction) — the head-count job would scan the corpus
    // lineage to find it
    probeLsh(index, df.filter(col(idCol) === queryId), idCol, vecCol, k,
        excludeSelf = true, guardBroadcast = false)
      .select(col(idCol), col("sim"))
  }

  /** @deprecated renamed: the short name hid that every call pays a full
    * corpus bucket-assignment pass. */
  @deprecated("use lshTopKOneShot, or buildLshIndex + probeLsh for repeated retrieval", "0.1.0")
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nPlanes: Int = 8, dims: Int = 64): DataFrame =
    lshTopKOneShot(df, idCol, vecCol, queryId, k, nPlanes, dims)

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
    * `nProbe` cells, then exact top-k within them.
    *
    * Convenience ONE-SHOT — the name is the warning: builds a throwaway
    * [[IvfIndex]] for this single query, paying a full corpus centroid
    * pass. For repeated or batched retrieval, build once with
    * [[buildIvfIndex]] (+ [[IvfIndex.persisted]] / [[saveIvfIndex]]) and
    * probe with [[probeIvf]] — per-query cost is then
    * probe-proportional. */
  def ivfTopKOneShot(
      df: DataFrame, idCol: String, vecCol: String, cellCol: String,
      queryId: Long, k: Int, nProbe: Int = 2): DataFrame = {
    val index = buildIvfIndex(df, idCol, vecCol, col(cellCol))
    // guardBroadcast = false: single-id query frame, see lshTopKOneShot
    probeIvf(index, df.filter(col(idCol) === queryId), idCol, vecCol, k,
        nProbe, excludeSelf = true, guardBroadcast = false)
      .select(col(idCol), col("sim"))
  }

  /** @deprecated renamed: the short name hid that every call pays a full
    * corpus centroid pass. */
  @deprecated("use ivfTopKOneShot, or buildIvfIndex + probeIvf for repeated retrieval", "0.1.0")
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String, cellCol: String,
      queryId: Long, k: Int, nProbe: Int = 2): DataFrame =
    ivfTopKOneShot(df, idCol, vecCol, cellCol, queryId, k, nProbe)

  // ---- Materialized ANN indexes: build once, probe many -------------------
  //
  // Real retrieval is build-once / probe-many: the expensive corpus passes
  // (codebook construction, per-vector cell/bucket assignment) happen ONCE at
  // index-build time; each probe touches only the codebook (tiny, broadcast)
  // plus the candidate cells/buckets it selects. At 100 TB the alternative —
  // recomputing assignments inside every query, as the one-shot ivfTopKOneShot/
  // lshTopKOneShot wrappers do — costs a full corpus scan per query, i.e. MORE than
  // brute force.

  /** A built IVF index.
    *
    * @param codebook one row per cell: `(_cell, _centroid: array<double>)` —
    *                 tiny (∝ nCells), broadcast into every probe
    * @param assigned the corpus with its cell assignment:
    *                 `(idCol, vecCol, _cell)` — the probe-side scan is pruned
    *                 to the probed `_cell` values
    */
  final case class IvfIndex(
      codebook: DataFrame, assigned: DataFrame, idCol: String, vecCol: String) {
    /** Pin both frames in executor storage and materialize them now, so the
      * first probe doesn't pay the build. Returns `this`. */
    def persisted(): IvfIndex = {
      codebook.persist(); assigned.persist()
      codebook.count(); assigned.count()
      this
    }
    def unpersisted(): IvfIndex = {
      codebook.unpersist(); assigned.unpersist(); this
    }
  }

  /** A built sign-LSH index: the corpus with its bucket id attached
    * (`idCol, vecCol, _bucket`). Plane geometry rides along so probes hash
    * queries with the identical matrix. */
  final case class LshIndex(
      buckets: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int, dims: Int) {
    def persisted(): LshIndex = { buckets.persist(); buckets.count(); this }
    def unpersisted(): LshIndex = { buckets.unpersist(); this }
  }

  /** Build an IVF index from an existing coarse-cell expression (a cluster
    * label, a [[graft.operators.Dedup.assignNearestCentroid]] `_cell`, a
    * partition key…). One corpus pass for the codebook (exploded
    * (cell, position) aggregate — shuffles cells × dims rows, never vectors
    * to the driver); the assignment itself is a projection. */
  def buildIvfIndex(
      df: DataFrame, idCol: String, vecCol: String, cellCol: Column): IvfIndex = {
    val assigned = df.select(col(idCol), col(vecCol), cellCol.as("_cell"))
    IvfIndex(centroids(assigned, "_cell", vecCol), assigned, idCol, vecCol)
  }

  /** Build an IVF index with LEARNED cells when no natural coarse label
    * exists: deterministic hash-seeded cells (`xxhash64(id) mod nCells`)
    * refined by `iters` rounds of Lloyd reassignment
    * ([[graft.operators.Dedup.assignNearestCentroid]] — broadcast codebook,
    * zero data-side exchange per round). Deterministic: no RNG, ties to the
    * lowest cell. */
  def buildIvfIndexAuto(
      df: DataFrame, idCol: String, vecCol: String, nCells: Int,
      iters: Int = 2): IvfIndex = {
    require(nCells > 0, s"nCells must be positive, got $nCells")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var assigned = df.select(
      col(idCol), col(vecCol),
      pmod(xxhash64(col(idCol)), lit(nCells.toLong)).as("_cell"))
    // each round is materialized before the next reads it — lazily chained,
    // round i's centroid aggregate would recompute rounds 1..i-1's argmax
    // fold over the whole corpus (O(iters²) corpus passes); persisting makes
    // the build exactly `iters` passes. Intermediates release as soon as the
    // next round lands; the FINAL assignment stays persisted and is owned by
    // the returned index (IvfIndex.unpersisted()).
    var prev: Option[DataFrame] = None
    (1 to iters).foreach { _ =>
      assigned = Dedup.assignNearestCentroid(assigned, idCol, vecCol, "_cell")
        .persist()
      assigned.count()
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(assigned)
    }
    IvfIndex(centroids(assigned, "_cell", vecCol), assigned, idCol, vecCol)
  }

  /** Full k-means (Lloyd) clustering over an embedding column — the
    * clustering READOUT (topic bucketing, SemDeDup partitions, mixture
    * design), distinct from [[buildIvfIndexAuto]] which keeps the index
    * (and seeds from xxhash64, which a SQL oracle can't replay).
    * Deterministic end to end: seeding is `hash56(id) mod k` (the
    * md5-derived engine-portable idiom), each of the `iters` hard E-steps
    * is [[graft.operators.Dedup.assignNearestCentroid]] (per-cell
    * element-wise-mean centroids rounded 6 dp, cosine argmax rounded 6 dp,
    * ties to the lowest cell). Returns `(idCol, cluster)` for every input
    * vector; a cell that loses all members simply stops existing (standard
    * Lloyd on hash seeding — no re-spawn heuristic to keep both engines
    * bit-identical).
    *
    * Scale shape: each round is ONE corpus pass — the codebook is a k-row
    * aggregate collapsed to a single broadcast array row, assignment is a
    * per-row fold (no exchange, no sort, rows never move), and rounds are
    * eager-materialized so the build is exactly `iters` passes instead of
    * the O(iters²) a lazy chain would recompute. The returned label frame
    * is localCheckpoint-materialized so every vector-carrying intermediate
    * is released before the caller sees it. */
  def kmeansClusters(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 2): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var assigned = df.select(
      col(idCol), col(vecCol),
      pmod(Dedup.hash56(col(idCol).cast("string")), lit(k.toLong)).as("_cell"))
    var prev: Option[DataFrame] = None
    (1 to iters).foreach { _ =>
      assigned = Dedup.assignNearestCentroid(assigned, idCol, vecCol, "_cell")
        .persist()
      assigned.count()
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(assigned)
    }
    val out = assigned
      .select(col(idCol), col("_cell").as("cluster"))
      .localCheckpoint(true)
    prev.foreach(_.unpersist(blocking = false))
    out
  }

  /** Build a sign-LSH index: one corpus pass assigning every vector its
    * `nPlanes`-bit bucket. */
  def buildLshIndex(
      df: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int = 8, dims: Int = 64): LshIndex =
    LshIndex(
      df.select(
        col(idCol), col(vecCol),
        lshBucket(col(vecCol), nPlanes, dims).as("_bucket")),
      idCol, vecCol, nPlanes, dims)

  /** A multi-table (OR-amplified) sign-LSH index: `nTables` independent
    * plane sets; a pair is a candidate if it shares a bucket in ANY table —
    * recall = 1-(1-p^planes)^tables instead of single-table p^planes, the
    * standard cure for sign-LSH's low recall, paid for with nTables×
    * corpus replication in the index (rows carry their full bucket array so
    * probes can first-match-dedup without a shuffle). */
  final case class LshMultiIndex(
      buckets: DataFrame, idCol: String, vecCol: String,
      nTables: Int, nPlanes: Int, dims: Int) {
    def persisted(): LshMultiIndex = { buckets.persist(); buckets.count(); this }
    def unpersisted(): LshMultiIndex = { buckets.unpersist(); this }
  }

  /** Build an OR-amplified LSH index: table t uses planes
    * `[t·nPlanes, (t+1)·nPlanes)` of the same deterministic md5-derived
    * matrix, so every engine (and the DuckDB oracle) reproduces all tables
    * exactly. One corpus pass; the index holds nTables rows per vector. */
  def buildLshIndexMulti(
      df: DataFrame, idCol: String, vecCol: String,
      nTables: Int, nPlanes: Int = 8, dims: Int = 64): LshMultiIndex = {
    require(nTables >= 1, s"nTables must be >= 1, got $nTables")
    val bks = array((0 until nTables).map(t =>
      lshBucket(col(vecCol), nPlanes, dims, t * nPlanes)): _*)
    LshMultiIndex(
      df.select(col(idCol), col(vecCol), bks.as("_bks"))
        .select(
          col(idCol), col(vecCol), col("_bks"),
          posexplode(col("_bks")).as(Seq("_table", "_bucket"))),
      idCol, vecCol, nTables, nPlanes, dims)
  }

  /** Batch probe of a multi-table LSH index. Candidates are generated per
    * (table, bucket) equi-join; a pair matching in several tables is kept
    * ONLY in its first agreeing table ([[graft.functions.ArrayKernels
    * .firstEqualIndex]] over the two bucket arrays — exact dedup with an
    * nTables-element compare instead of a distinct shuffle, the d02 band
    * trick). Same output contract and skew discipline as [[probeLsh]]. */
  def probeLshMulti(
      index: LshMultiIndex, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, excludeSelf: Boolean = false,
      broadcastProbes: Boolean = true, guardBroadcast: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes0 = queries
      .select(col(qIdCol).as("_q_id"), col(qVecCol).as("_q_v"))
      .withColumn("_q_bks", array((0 until index.nTables).map(t =>
        lshBucket(col("_q_v"), index.nPlanes, index.dims, t * index.nPlanes)): _*))
      .select(
        col("_q_id"), col("_q_v"), col("_q_bks"),
        posexplode(col("_q_bks")).as(Seq("_table", "_bucket")))
    val probes =
      if (wantBroadcast(queries, broadcastProbes, guardBroadcast)) broadcast(probes0) else probes0
    val cands = index.buckets.join(probes, Seq("_table", "_bucket"))
      .filter(graft.functions.ArrayKernels.firstEqualIndex(
        col("_q_bks"), col("_bks")) === col("_table") + 1)
    finishProbe(cands, index.idCol, index.vecCol, k, excludeSelf)
  }

  /** EXACT batch k-NN — the correctness baseline the approximate probes are
    * measured against, with the same output contract as [[probeIvf]]:
    * `(q_id, rank, <idCol>, sim)`. Queries broadcast against one full
    * corpus pass (O(queries × corpus) cosine work, embarrassingly parallel,
    * zero corpus exchange), finished by the skew-safe two-pass top-k. Use
    * for modest query batches or recall audits; the indexed probes are the
    * scale path. */
  def bruteForceBatch(
      df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, excludeSelf: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    finishProbe(
      df.crossJoin(broadcast(
        queries.select(col(qIdCol).as("_q_id"), col(qVecCol).as("_q_v")))),
      idCol, vecCol, k, excludeSelf)
  }

  // ---- Embedding-space data quality ---------------------------------------

  /** Per-label centroid outliers — the embedding-space mislabel detector:
    * rows whose vector sits FARTHEST (lowest cosine) from their own label's
    * mean vector are the likely labeling errors / noise samples a curation
    * pipeline reviews or drops.
    *
    * Plan: one exploded (label, position) aggregate for the centroids
    * ([[centroids]] — shuffles labels × dims rows, never vectors to the
    * driver), the label-sized codebook broadcast back onto the corpus,
    * cosine kernel map-side, then the skew-safe two-pass bottom-k per label
    * ([[TopK.perGroup]]) — a million-row label cannot funnel into one
    * window task.
    *
    * Output: `(labelCol, rank, <idCol>, sim)` — rank 1 = farthest from its
    * own centroid, sim rounded to 6 dp, ties to the lowest id. */
  def labelOutliers(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val assigned = df.select(col(idCol), col(vecCol), col(labelCol).as("_cell"))
    val sims = assigned
      .join(broadcast(centroids(assigned, "_cell", vecCol)), Seq("_cell"))
      .select(
        col("_cell"), col(idCol),
        cosine(col(vecCol), col("_centroid")).as("_sim"))
    TopK.perGroup(sims, Seq("_cell"), Seq(col("_sim").asc, col(idCol).asc), k)
      .select(
        col("_cell").as(labelCol), col("rank").cast("long").as("rank"),
        col(idCol), round(col("_sim"), 6).as("sim"))
  }

  /** Simplified silhouette (cosine-distance variant) — the clustering-quality
    * score a pipeline reads before trusting a SemDeDup/IVF partition of the
    * corpus: per row `a = 1 − cos(x, own centroid)`,
    * `b = 1 − max_other cos(x, centroid_c)` (nearest FOREIGN centroid), and
    * `s = (b − a) / max(a, b)` (the Hruschka et al. simplified form —
    * centroid distances instead of all-pairs, which is what makes it
    * computable at corpus scale at all; the classic all-pairs form is
    * O(n²) per cluster). Output: one row per cluster,
    * `(<clusterCol>, n, mean_sil)` — `n` counts the SCORED rows and
    * `mean_sil` averages exactly those (6 dp), so the pair is internally
    * consistent; a cluster whose rows are all unscorable (null vectors, or
    * no foreign centroid) reports `(0, null)`.
    *
    * Plan: the (clusters × dims) centroid aggregate, the cluster-sized
    * codebook broadcast-cross-joined onto the corpus (rows × clusters —
    * meant for codebook-sized clusterings, same contract as the IVF
    * codebook), one conditional (id)-group fold splitting own vs foreign
    * similarity, then the per-cluster mean. No window, no all-pairs.
    *
    * Conventions: a single-cluster input has no foreign centroid → every
    * row unscorable → `(0, null)`. A singleton cluster's member sits AT its
    * centroid (a = 0) and
    * scores s = 1 — the simplified form's behavior, kept (not the classic
    * form's s = 0) so both engines replay one formula. `max(a,b) = 0`
    * (duplicate centroids) → s = 0 explicitly. */
  def simplifiedSilhouette(
      df: DataFrame, idCol: String, vecCol: String,
      clusterCol: String): DataFrame = {
    val assigned = df.select(
      col(idCol).as("_id"), col(vecCol).as("_v"), col(clusterCol).as("_cl"))
    val perRow = assigned
      .crossJoin(broadcast(
        centroids(assigned, "_cl", "_v")
          .select(col("_cell"), col("_centroid"))))
      .select(
        col("_id"), col("_cl"),
        (col("_cl") === col("_cell")).as("_own"),
        cosine(col("_v"), col("_centroid")).as("_sim"))
      .groupBy("_id", "_cl")
      .agg(
        max(when(col("_own"), col("_sim"))).as("_own_sim"),
        max(when(!col("_own"), col("_sim"))).as("_foreign_sim"))
      .select(
        col("_cl"),
        ((lit(1.0) - col("_own_sim")).as("_a")),
        ((lit(1.0) - col("_foreign_sim")).as("_b")))
      .select(
        col("_cl"),
        // explicit null-out FIRST: Spark's (and DuckDB's) greatest() skips
        // nulls, so without this a single-cluster point sitting exactly at
        // its centroid (a=0, b=null) would score 0.0 instead of the
        // documented unscorable-null
        when(col("_a").isNull || col("_b").isNull, lit(null).cast("double"))
          .when(greatest(col("_a"), col("_b")) === 0.0, lit(0.0))
          .otherwise((col("_b") - col("_a")) / greatest(col("_a"), col("_b")))
          .as("_s"))
    perRow.groupBy(col("_cl").as(clusterCol))
      .agg(
        count(col("_s")).as("n"),
        stableRound(avg(col("_s")), 6).as("mean_sil"))
  }

  /** Hard-negative mining for contrastive training: for every query row,
    * the top-`k` most similar corpus vectors carrying a DIFFERENT label.
    * Candidates come from the label-cell IVF view of the corpus — rank the
    * OTHER labels' centroids by query cosine and scan only the top `nProbe`
    * foreign cells — so per-query work is probe-proportional, never the
    * all-pairs cross-label product. The label exclusion happens on the
    * tiny broadcast codebook BEFORE candidates are generated, not as a
    * post-filter on the joined candidate set.
    *
    * Same plan shape, skew discipline, and output contract as [[probeIvf]]:
    * `(q_id, rank, <idCol>, sim)`.
    *
    * NULL labels: a query with no label has no "own" cell, so EVERY cell is
    * foreign to it (the `coalesce` below — a plain `=!=` would go null,
    * drop all its probe cells, and silently erase the query from the
    * output). Corpus rows with a NULL label are excluded from candidates by
    * construction: null never equi-joins on `_cell`. */
  def hardNegatives(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, qLabelCol: String,
      k: Int, nProbe: Int = 2, broadcastProbes: Boolean = true,
      guardBroadcast: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val index = buildIvfIndex(df, idCol, vecCol, col(labelCol))
    val scored = queries
      .select(
        col(qIdCol).as("_q_id"), col(qVecCol).as("_q_v"),
        col(qLabelCol).as("_q_lbl"))
      .crossJoin(broadcast(index.codebook))
      .filter(coalesce(col("_cell") =!= col("_q_lbl"), lit(true)))
      .select(
        col("_q_id"), col("_q_v"), col("_cell"),
        cosine(col("_centroid"), col("_q_v")).as("_csim"))
    val probes0 = TopK.perGroup(
        scored, Seq("_q_id"), Seq(col("_csim").desc, col("_cell").asc), nProbe)
      .select("_q_id", "_q_v", "_cell")
    val probes =
      if (wantBroadcast(queries, broadcastProbes, guardBroadcast)) broadcast(probes0) else probes0
    finishProbe(
      index.assigned.join(probes, Seq("_cell")), idCol, vecCol, k,
      excludeSelf = false)
  }

  /** Nearest-cell assignment of `df`'s vectors against a FROZEN codebook:
    * the codebook collapses to ONE broadcast row of cell-sorted
    * (cell, centroid) structs and the argmax is a per-row fold — no exchange
    * of the data rows, no corpus pass (the zero-shuffle shape of
    * [[graft.operators.Dedup.assignNearestCentroid]], but against a GIVEN
    * codebook instead of one refit from the data). Cosine is 6dp
    * stable-rounded before the compare, ties to the lowest cell — mirror in
    * SQL as `ROUND(cos + 1e-9, 6)` ranked `DESC, cell`. */
  def assignToCodebook(
      codebook: DataFrame, df: DataFrame, idCol: String, vecCol: String): DataFrame =
    foldAssign(
      df, idCol, vecCol,
      codebook.select(col("_cell"), col("_centroid").as("_c")))

  /** The shared broadcast-argmax fold behind [[assignToCodebook]] and
    * [[graft.operators.Dedup.assignNearestCentroid]]: `cells` is a
    * `(_cell, _c: array<double>)` frame (rounded or not — the CALLER owns
    * the rounding contract its oracle mirrors); it collapses to one
    * broadcast row of cell-sorted structs and every `df` row folds over it
    * keeping the best (6dp-stable-rounded cosine, lowest cell on ties) —
    * no exchange, no sort, no group-by on the data side. */
  private[operators] def foldAssign(
      df: DataFrame, idCol: String, vecCol: String, cells: DataFrame): DataFrame = {
    // cell-sorted so the fold's strict `>` keeps the LOWEST cell on rounded
    // ties (mirrors ORDER BY cs DESC, cell)
    val cb = cells.agg(
      array_sort(collect_list(struct(col("_cell"), col("_c")))).as("_cb"))
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cb))
      .withColumn("_best",
        aggregate(
          col("_cb"),
          struct(
            lit(-2.0).as("_s"),
            element_at(col("_cb"), 1).getField("_cell").as("_cell")),
          (acc, x) =>
            graft.operators.let(
              stableRound(cosine(col(vecCol), x.getField("_c")), 6)) { s =>
              when(s > acc.getField("_s"),
                struct(s.as("_s"), x.getField("_cell").as("_cell")))
                .otherwise(acc)
            }))
      .select(col(idCol), col(vecCol), col("_best").getField("_cell").as("_cell"))
  }

  /** Ingestion-time index maintenance: append new vectors to an existing IVF
    * index WITHOUT a corpus pass — each new vector is assigned its cell by
    * the frozen codebook ([[assignToCodebook]], broadcast fold, rows never
    * move). The codebook is not refit — standard IVF practice: recall
    * degrades only as the data distribution drifts; rebuild with
    * [[buildIvfIndex]] / [[buildIvfIndexAuto]] when it does. */
  def extendIvfIndex(index: IvfIndex, newDf: DataFrame): IvfIndex =
    IvfIndex(
      index.codebook,
      index.assigned.unionByName(
        assignToCodebook(index.codebook, newDf, index.idCol, index.vecCol)),
      index.idCol, index.vecCol)

  /** [[extendIvfIndex]] for LSH: new rows hash map-side with the index's
    * plane matrix — extension is a pure projection, and the extended index
    * is IDENTICAL to a fresh [[buildLshIndex]] over the union (the planes
    * are deterministic). */
  def extendLshIndex(index: LshIndex, newDf: DataFrame): LshIndex =
    LshIndex(
      index.buckets.unionByName(
        newDf.select(
          col(index.idCol), col(index.vecCol),
          lshBucket(col(index.vecCol), index.nPlanes, index.dims).as("_bucket"))),
      index.idCol, index.vecCol, index.nPlanes, index.dims)

  /** Queries above this head-count fall back from the broadcast probe join
    * to the shuffle join even when `broadcastProbes = true` — a
    * million-query probe frame (vectors included) would blow the broadcast,
    * and the caller asking to broadcast usually means "my batch is small"
    * rather than "OOM the driver if it isn't". The check is a bounded
    * `limit(n+1).count()` — it stops reading once n+1 rows surface, BUT it
    * still executes the query frame's full lineage when matches are scarce
    * (a selective filter over a large table finds < n+1 rows only after
    * scanning everything). That is one extra pass over the QUERY lineage
    * per probe call — so callers that already know the batch is bounded
    * (the one-shot single-id wrappers, streaming micro-batches) pass
    * `guardBroadcast = false` and skip the job entirely; batch callers with
    * a lazy, selective query frame should pre-materialize it (persist) if
    * they probe repeatedly. */
  val maxBroadcastProbeQueries: Long = 100000L

  private def wantBroadcast(
      queries: DataFrame, requested: Boolean, guard: Boolean): Boolean =
    requested && (!guard ||
      queries.limit(maxBroadcastProbeQueries.toInt + 1).count() <= maxBroadcastProbeQueries)

  /** Batch IVF probe: top-`k` corpus neighbors for EVERY query row, in one
    * job — no per-query driver loop.
    *
    * Plan shape: queries × broadcast codebook (∝ queries·nCells narrow rows)
    * → per-query top-`nProbe` cells via the skew-safe two-pass rank
    * ([[TopK.perGroup]]) → equi-join with the assigned corpus on `_cell`
    * (probe side broadcast by default — query batches are normally ≪ corpus;
    * set `broadcastProbes = false` for query sets too large to broadcast and
    * the join shuffles both sides by `_cell` instead — a POPULAR cell in
    * that regime is a skewed sort-merge partition, which AQE's skew-join
    * splitting subdivides on the corpus side: input skew, unlike the
    * join-OUTPUT explosion the dedup band joins must dodge by hand) →
    * cosine kernel → per-query top-k, again two-pass rank so a hot cell
    * cannot straggle.
    *
    * Output: `(q_id, rank, <idCol>, sim)`, sim rounded to 6 dp, rank 1-based
    * per query, ties broken by corpus id.
    *
    * @param excludeSelf drop corpus rows whose id equals the query id
    *                    (self-retrieval when queries come from the corpus) */
  def probeIvf(
      index: IvfIndex, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nProbe: Int = 2, excludeSelf: Boolean = false,
      broadcastProbes: Boolean = true, guardBroadcast: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val scored = queries
      .select(col(qIdCol).as("_q_id"), col(qVecCol).as("_q_v"))
      .crossJoin(broadcast(index.codebook))
      .select(
        col("_q_id"), col("_q_v"), col("_cell"),
        cosine(col("_centroid"), col("_q_v")).as("_csim"))
    val probes0 = TopK.perGroup(
        scored, Seq("_q_id"), Seq(col("_csim").desc, col("_cell").asc), nProbe)
      .select("_q_id", "_q_v", "_cell")
    val probes =
      if (wantBroadcast(queries, broadcastProbes, guardBroadcast)) broadcast(probes0) else probes0
    finishProbe(
      index.assigned.join(probes, Seq("_cell")),
      index.idCol, index.vecCol, k, excludeSelf)
  }

  /** Batch LSH probe: top-`k` same-bucket neighbors for every query row.
    * Queries are hashed with the index's plane matrix (map-side, no corpus
    * pass) and joined on `_bucket`; same probe-side broadcast default and
    * skew-safe top-k as [[probeIvf]]. A query whose bucket is empty yields
    * no rows (the recall trade LSH makes). */
  def probeLsh(
      index: LshIndex, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, excludeSelf: Boolean = false,
      broadcastProbes: Boolean = true, guardBroadcast: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes0 = queries.select(
      col(qIdCol).as("_q_id"), col(qVecCol).as("_q_v"),
      lshBucket(col(qVecCol), index.nPlanes, index.dims).as("_bucket"))
    val probes =
      if (wantBroadcast(queries, broadcastProbes, guardBroadcast)) broadcast(probes0) else probes0
    finishProbe(
      index.buckets.join(probes, Seq("_bucket")),
      index.idCol, index.vecCol, k, excludeSelf)
  }

  /** Shared probe tail: optional self-filter, cosine kernel, two-pass
    * per-query top-k. NaN similarities are dropped BEFORE ranking — Spark
    * orders NaN above every real double, so a single zero vector in a
    * probed cell/bucket would otherwise outrank the true neighbor of every
    * query that touches it (and, via [[bruteForceBatch]], silently poison
    * the recall audit's ground truth too). NULL similarities (null-coded
    * corrupt vectors from [[sq8EncodeExpr]], length-mismatched pairs) are
    * dropped explicitly too: Spark's `isnan(null)` is FALSE, so `!isnan`
    * alone would let nulls through to fill trailing ranks when k exceeds
    * the real candidate count. */
  private def finishProbe(
      cands: DataFrame, idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean): DataFrame = {
    val kept = if (excludeSelf) cands.filter(col(idCol) =!= col("_q_id")) else cands
    val sims = kept
      .select(
        col("_q_id"), col(idCol), cosine(col(vecCol), col("_q_v")).as("_sim"))
      .filter(col("_sim").isNotNull && !isnan(col("_sim")))
    TopK.perGroup(sims, Seq("_q_id"), Seq(col("_sim").desc, col(idCol).asc), k)
      .select(
        col("_q_id").as("q_id"), col("rank").cast("long").as("rank"),
        col(idCol), round(col("_sim"), 6).as("sim"))
  }

  /** Persist an IVF index as tables: the corpus assignment BUCKETED on
    * `_cell` ([[graft.sources.Sinks.writeBucketed]]) so every future probe's
    * candidate join is exchange-free on the corpus side, the codebook as a
    * plain table. `numBuckets` ≈ corpus bytes / 128 MB. */
  def saveIvfIndex(index: IvfIndex, name: String, numBuckets: Int): Unit = {
    graft.sources.Sinks.writeBucketed(
      index.assigned, s"${name}_assigned", Seq("_cell"), numBuckets)
    index.codebook.write.mode("overwrite").saveAsTable(s"${name}_codebook")
  }

  def loadIvfIndex(
      spark: SparkSession, name: String, idCol: String, vecCol: String): IvfIndex =
    IvfIndex(
      spark.table(s"${name}_codebook"), spark.table(s"${name}_assigned"),
      idCol, vecCol)

  /** [[saveIvfIndex]] for LSH: the bucket assignment bucketed on `_bucket`,
    * PLUS a one-row `_meta` table carrying the plane geometry — an index
    * loaded with the wrong nPlanes/dims would hash queries with a different
    * plane matrix and silently return wrong (mostly empty) neighbors, so
    * the geometry travels with the data and [[loadLshIndex]] takes none. */
  def saveLshIndex(index: LshIndex, name: String, numBuckets: Int): Unit = {
    graft.sources.Sinks.writeBucketed(
      index.buckets, s"${name}_buckets", Seq("_bucket"), numBuckets)
    index.buckets.sparkSession
      .sql(s"SELECT ${index.nPlanes} AS n_planes, ${index.dims} AS dims")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  def loadLshIndex(
      spark: SparkSession, name: String, idCol: String, vecCol: String): LshIndex = {
    val meta = spark.table(s"${name}_meta").head()
    LshIndex(
      spark.table(s"${name}_buckets"), idCol, vecCol,
      meta.getAs[Int]("n_planes"), meta.getAs[Int]("dims"))
  }

  /** Per-dimension corpus statistics of an embedding column — the
    * monitoring / whitening signal (a collapsed dimension shows up as
    * near-zero variance; a drifted encoder as a moved mean; a broken
    * normalizer as out-of-range min/max). Returns
    * `(dim, n, mean, variance, vmin, vmax)` with mean/variance rounded to
    * 6dp (population variance — mirror `var_pop` in oracles); min/max are
    * exact element values, identical bits on any engine.
    *
    * Shape: `posexplode` → hash aggregate on the dimension index. The
    * group-key cardinality IS the dimensionality (tiny), so every partial
    * aggregate collapses map-side and the shuffle moves
    * `O(dims × partitions)` rows regardless of corpus size — at 100 TB this
    * is scan-bound, and a hot dimension key cannot exist (every dimension
    * appears exactly once per row). */
  def dimensionStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "_v")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(
        count(lit(1)).as("n"),
        stableRound(avg(col("_v")), 6).as("mean"),
        stableRound(var_pop(col("_v")), 6).as("variance"),
        min(col("_v")).as("vmin"),
        max(col("_v")).as("vmax"))

  /** Recall@k audit: per-query fraction of the EXACT top-k
    * ([[bruteForceBatch]]) that an approximate probe recovered. Both inputs
    * carry the shared probe contract `(q_id, rank, <idCol>, sim)`; the audit
    * joins them on `(q_id, <idCol>)` — two queries×k frames, so the audit
    * itself costs nothing at any corpus scale beyond the probes that
    * produced its inputs. The denominator is the query's ACTUAL ground-truth
    * size (≤ k — a query can have fewer than k legal neighbors); queries
    * with an empty ground truth are absent.
    *
    * This is the acceptance gate for every approximate index (IVF cells /
    * nProbe, LSH planes / tables, SQ8): run it on a query sample after a
    * build, alert when mean recall drifts. Output: `(q_id, recall)`,
    * recall ∈ [0, 1] rounded to 6 dp. */
  def recallAtK(exact: DataFrame, approx: DataFrame, idCol: String): DataFrame =
    exact.select(col("q_id"), col(idCol))
      .join(
        approx.select(col("q_id"), col(idCol), lit(1).as("_hit")),
        Seq("q_id", idCol), "left")
      .groupBy("q_id")
      .agg(round(count(col("_hit")) / count(lit(1)), 6).as("recall"))

  /** Close the [[recallAtK]] audit loop: pick the smallest probe width that
    * reaches `targetRecall` mean recall@k on a QUERY SAMPLE, by doubling
    * search over nProbe (1, 2, 4, … capped at `maxNProbe`). Returns
    * `(nProbe, achievedRecall)` — the last probe width tried and its
    * measured recall; if the cap is hit below target, callers see that in
    * the returned recall rather than an exception (an under-target index
    * is a capacity decision, not an error).
    *
    * Cost model (why this scales): ground truth is ONE [[bruteForceBatch]]
    * corpus pass over the sample (sample-sized broadcast, corpus scanned
    * once), then ≤ log₂(maxNProbe) probe runs, each touching only probed
    * cells. Everything is sample-proportional — production probe volume
    * never enters. The driver-side loop holds only two scalars per
    * iteration. Run it after every index (re)build and alert on drift,
    * per the [[recallAtK]] contract. */
  def tuneNProbe(
      index: IvfIndex, sampleQueries: DataFrame, qIdCol: String,
      qVecCol: String, k: Int, targetRecall: Double,
      maxNProbe: Int = 64, excludeSelf: Boolean = false): (Int, Double) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(targetRecall > 0 && targetRecall <= 1,
      s"targetRecall must be in (0, 1], got $targetRecall")
    require(maxNProbe >= 1, s"maxNProbe must be >= 1, got $maxNProbe")
    // ground truth computed once and pinned: every doubling step re-reads
    // it, and without the persist each step would re-pay the corpus scan
    val exact = bruteForceBatch(
      index.assigned, index.idCol, index.vecCol,
      sampleQueries, qIdCol, qVecCol, k, excludeSelf).persist()
    try {
      exact.count()
      def meanRecall(nProbe: Int): Double = {
        val approx = probeIvf(
          index, sampleQueries, qIdCol, qVecCol, k, nProbe, excludeSelf)
        val r = recallAtK(exact, approx, index.idCol)
          .agg(avg(col("recall"))).head()
        // an empty ground truth (no sample query has any legal neighbor)
        // is vacuously satisfied — any nProbe is as good as any other
        if (r.isNullAt(0)) 1.0 else r.getDouble(0)
      }
      var nProbe = 1
      var recall = meanRecall(nProbe)
      while (recall < targetRecall && nProbe < maxNProbe) {
        nProbe = math.min(nProbe * 2, maxNProbe)
        recall = meanRecall(nProbe)
      }
      (nProbe, recall)
    } finally { exact.unpersist(); () }
  }

  // ---- SQ8 scalar quantization: 1 byte per dimension ----------------------
  //
  // The standard compressed-residency trade for vector search at corpus
  // scale (FAISS's SQ8): each dimension is affinely mapped to an 8-bit code
  // using per-dimension corpus (min, max) bounds. A float32 64-dim corpus
  // shrinks 4× (100 TB of embeddings → 25 TB of codes), which is the
  // difference between an index that fits executor storage and one that
  // doesn't. Probes are ASYMMETRIC (ADC): the query stays full-precision and
  // only the corpus side is reconstructed from codes, so quantization error
  // enters once, not twice.

  /** True when the double element is NaN or ±Infinity. A corrupt embedding
    * must not poison the index: the raw probe paths already drop such
    * vectors (their cosine is NaN, filtered before ranking), so the SQ8
    * path mirrors that — non-finite VALUES are ignored by the bounds
    * aggregate and a vector containing one is null-coded
    * ([[sq8EncodeExpr]]), which the shared probe tail drops the same way. */
  private def nonFinite(x: Column): Column =
    isnan(x) || x === Double.PositiveInfinity || x === Double.NegativeInfinity

  /** Per-dimension quantization bounds of an embedding column as ONE row
    * `(_mins: array<double>, _exts: array<double>)` in dimension order
    * (`ext = max − min`) — tiny, broadcast into every encode/decode. One
    * corpus pass with the same dims-key aggregate shape as
    * [[dimensionStats]]: shuffle ∝ dims × partitions, never corpus size.
    * Non-finite elements are excluded (min/max ignore nulls), so one
    * corrupt vector cannot blow a dimension's extent to NaN/∞ and silently
    * empty every probe. */
  def sq8Bounds(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("_pos", "_v0")))
      .select(col("_pos"),
        when(nonFinite(col("_v0")), lit(null)).otherwise(col("_v0")).as("_v"))
      .groupBy("_pos")
      .agg(min("_v").as("_mn"), max("_v").as("_mx"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("_pos"), col("_mn")))),
          x => x.getField("_mn")).as("_mins"),
        transform(
          array_sort(collect_list(struct(col("_pos"), col("_mx"), col("_mn")))),
          x => x.getField("_mx") - x.getField("_mn")).as("_exts"))

  /** SQ8 code of `vec` under `(mins, exts)` bound arrays:
    * `round(255·(x−min)/ext)` clamped to [0, 255] (the clamp only bites for
    * vectors OUTSIDE the corpus bounds the index was built from), stored
    * −128-offset so the element type is a true 1-byte `tinyint`. A
    * zero-extent (constant) dimension codes to 0 and reconstructs exactly.
    * A vector with ANY non-finite element codes to NULL — its decode and
    * cosine are null, and the probe tail's ranking filter drops it, exactly
    * as the raw paths drop the same vector via its NaN cosine (without
    * this, `greatest(0, NaN)=NaN` then `least(255, NaN)=255` would
    * fabricate a finite near-max reconstruction for corrupt data). */
  private[graft] def sq8EncodeExpr(
      vec: Column, mins: Column, exts: Column): Column = {
    val v = vec.cast("array<double>")
    when(exists(v, nonFinite), lit(null).cast("array<tinyint>"))
      .otherwise(transform(v, (x, i) => {
        val mn = element_at(mins, i + 1)
        val ext = element_at(exts, i + 1)
        (when(ext === 0.0, lit(0.0))
          .otherwise(
            least(lit(255.0), greatest(lit(0.0), round((x - mn) * lit(255.0) / ext))))
          - lit(128.0)).cast("tinyint")
      }))
  }

  /** Inverse of [[sq8EncodeExpr]]: `min + code·ext/255` per element, as
    * `array<double>`. Mirror in DuckDB as
    * `mns[i+1] + round((v[i+1]-mns[i+1])*255.0/exts[i+1]) * exts[i+1]/255.0`
    * (same left-associated order, so doubles agree bit-for-bit). */
  private[graft] def sq8DecodeExpr(
      code: Column, mins: Column, exts: Column): Column =
    transform(code, (c, i) => {
      val mn = element_at(mins, i + 1)
      val ext = element_at(exts, i + 1)
      mn + (c.cast("double") + lit(128.0)) * ext / lit(255.0)
    })

  /** A built SQ8 index: the corpus as 1-byte codes plus the one-row bounds
    * frame needed to reconstruct them. `codes` is `(idCol, _code:
    * array<tinyint>)` — 4× smaller than the float32 corpus it encodes. */
  final case class Sq8Index(bounds: DataFrame, codes: DataFrame, idCol: String) {
    def persisted(): Sq8Index = {
      bounds.persist(); codes.persist()
      bounds.count(); codes.count()
      this
    }
    def unpersisted(): Sq8Index = {
      bounds.unpersist(); codes.unpersist(); this
    }
  }

  /** Build an SQ8 index: one corpus pass for the bounds ([[sq8Bounds]]),
    * then encoding is a per-row projection under the broadcast bounds row —
    * no second exchange. */
  def buildSq8Index(df: DataFrame, idCol: String, vecCol: String): Sq8Index = {
    val bounds = sq8Bounds(df, vecCol)
    val codes = df.crossJoin(broadcast(bounds))
      .select(
        col(idCol),
        sq8EncodeExpr(col(vecCol), col("_mins"), col("_exts")).as("_code"))
    Sq8Index(bounds, codes, idCol)
  }

  /** Batch probe over the compressed corpus: exact cosine top-`k` against
    * SQ8-RECONSTRUCTED vectors for every query row (asymmetric — queries
    * stay full-precision). Same output contract and skew-safe top-k as
    * [[probeIvf]]: `(q_id, rank, <idCol>, sim)`.
    *
    * This is [[bruteForceBatch]] at ¼ the scan bytes: O(queries × corpus)
    * cosine work, zero corpus exchange, candidates decoded on the fly
    * map-side. For candidate PRUNING on top of compression, compose with a
    * coarse cell via [[buildSq8IvfIndex]]/[[probeSq8Ivf]]. Same broadcast
    * safety valve as the sibling probes: a query batch past
    * [[maxBroadcastProbeQueries]] falls back to a partitioned cartesian
    * instead of OOMing the forced broadcast. */
  def probeSq8(
      index: Sq8Index, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, excludeSelf: Boolean = false,
      broadcastProbes: Boolean = true, guardBroadcast: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val decoded = index.codes.crossJoin(broadcast(index.bounds))
      .select(
        col(index.idCol),
        sq8DecodeExpr(col("_code"), col("_mins"), col("_exts")).as("_rv"))
    val probes0 = queries.select(col(qIdCol).as("_q_id"), col(qVecCol).as("_q_v"))
    val probes =
      if (wantBroadcast(queries, broadcastProbes, guardBroadcast)) broadcast(probes0)
      else probes0
    finishProbe(
      decoded.crossJoin(probes),
      index.idCol, "_rv", k, excludeSelf)
  }

  /** An IVF index whose corpus residency is SQ8 codes: `assigned` is
    * `(idCol, _code, _cell)` (¼ the bytes of [[IvfIndex.assigned]]), the
    * codebook keeps full-precision centroids (∝ nCells — negligible), and
    * the bounds row rides along for probe-time reconstruction. This is the
    * shape that actually holds at 100 TB: candidates pruned to `nProbe`
    * cells AND the resident corpus compressed 4×. */
  final case class Sq8IvfIndex(
      codebook: DataFrame, bounds: DataFrame, assigned: DataFrame, idCol: String) {
    def persisted(): Sq8IvfIndex = {
      codebook.persist(); bounds.persist(); assigned.persist()
      codebook.count(); bounds.count(); assigned.count()
      this
    }
    def unpersisted(): Sq8IvfIndex = {
      codebook.unpersist(); bounds.unpersist(); assigned.unpersist(); this
    }
  }

  /** Build the compressed IVF index from an existing coarse-cell expression
    * (same contract as [[buildIvfIndex]]): one pass for the centroid
    * codebook, one for the bounds, encoding as a projection. */
  def buildSq8IvfIndex(
      df: DataFrame, idCol: String, vecCol: String, cellCol: Column): Sq8IvfIndex = {
    val raw = df.select(col(idCol), col(vecCol), cellCol.as("_cell"))
    val bounds = sq8Bounds(raw, vecCol)
    val assigned = raw.crossJoin(broadcast(bounds))
      .select(
        col(idCol),
        sq8EncodeExpr(col(vecCol), col("_mins"), col("_exts")).as("_code"),
        col("_cell"))
    Sq8IvfIndex(centroids(raw, "_cell", vecCol), bounds, assigned, idCol)
  }

  /** Batch IVF probe over the compressed corpus: cell selection exactly as
    * [[probeIvf]] (query × broadcast codebook → top-`nProbe` cells via the
    * skew-safe two-pass rank), then the `_cell` equi-join scans only the
    * probed cells' CODES and reconstructs them map-side before the cosine
    * kernel. Quantization error enters only on the corpus side (ADC). */
  def probeSq8Ivf(
      index: Sq8IvfIndex, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nProbe: Int = 2, excludeSelf: Boolean = false,
      broadcastProbes: Boolean = true, guardBroadcast: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val scored = queries
      .select(col(qIdCol).as("_q_id"), col(qVecCol).as("_q_v"))
      .crossJoin(broadcast(index.codebook))
      .select(
        col("_q_id"), col("_q_v"), col("_cell"),
        cosine(col("_centroid"), col("_q_v")).as("_csim"))
    val probes0 = TopK.perGroup(
        scored, Seq("_q_id"), Seq(col("_csim").desc, col("_cell").asc), nProbe)
      .select("_q_id", "_q_v", "_cell")
    val probes =
      if (wantBroadcast(queries, broadcastProbes, guardBroadcast)) broadcast(probes0) else probes0
    val cands = index.assigned.join(probes, Seq("_cell"))
      .crossJoin(broadcast(index.bounds))
      .select(
        col("_q_id"), col("_q_v"), col(index.idCol),
        sq8DecodeExpr(col("_code"), col("_mins"), col("_exts")).as("_rv"))
    finishProbe(cands, index.idCol, "_rv", k, excludeSelf)
  }

  /** Single-query convenience over [[buildSq8Index]]/[[probeSq8]] (the
    * oracle entry). For repeated retrieval build the index once. */
  def sq8TopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame =
    probeSq8(
      buildSq8Index(df, idCol, vecCol),
      df.filter(col(idCol) === queryId), idCol, vecCol, k, excludeSelf = true,
      guardBroadcast = false)
      .select(col(idCol), col("sim"))

  /** Single-query convenience over [[buildSq8IvfIndex]]/[[probeSq8Ivf]]. */
  def sq8IvfTopK(
      df: DataFrame, idCol: String, vecCol: String, cellCol: String,
      queryId: Long, k: Int, nProbe: Int = 2): DataFrame =
    probeSq8Ivf(
      buildSq8IvfIndex(df, idCol, vecCol, col(cellCol)),
      df.filter(col(idCol) === queryId), idCol, vecCol, k, nProbe,
      excludeSelf = true, guardBroadcast = false)
      .select(col(idCol), col("sim"))

  // ---- 1-bit sign quantization: Hamming retrieval -------------------------
  //
  // The extreme end of the compressed-residency ladder (float32 → SQ8 4× →
  // sign bits 32×): keep only each dimension's SIGN, packed into 64-bit
  // words, and retrieve by Hamming distance — two xor+popcount per word per
  // candidate, the cheapest full-scan retrieval kernel there is. Standard
  // role at corpus scale: the SHORTLIST stage of a funnel (Hamming scan →
  // exact re-rank of the survivors, see [[rerankExact]]), since sign-only
  // similarity is coarse by construction.

  /** Sign bits of a `dims`-dim vector packed into BIGINT words, 32 bits per
    * word: bit j of word w is set when element 32w+j ≥ 0 (NaN compares ≥ 0
    * in both Spark and DuckDB, so corrupt elements degrade to a wrong BIT,
    * never a wrong TYPE). 32 bits per word — not 64 — keeps every set bit
    * out of the sign position, so the DuckDB mirror can build the identical
    * words with `1::BIGINT << j` and no overflow semantics in sight. */
  private[graft] def signPackExpr(vec: Column, dims: Int): Column = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val v = vec.cast("array<double>")
    val words = (dims + 31) / 32
    array((0 until words).map { w =>
      val lo = w * 32
      val hi = math.min(dims, lo + 32)
      (lo until hi).map { i =>
        when(element_at(v, i + 1) >= 0, lit(1L << (i - lo))).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }: _*)
  }

  /** Hamming distance between two equal-length packed-word arrays:
    * Σ popcount(xorᵢ). */
  private[graft] def hammingExpr(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** A built sign index: the corpus as packed sign words — 1 bit per
    * dimension at rest (a 64-dim float32 corpus shrinks 32×, 100 TB →
    * ~3 TB), probed by Hamming distance. */
  final case class SignIndex(bits: DataFrame, idCol: String, dims: Int) {
    def persisted(): SignIndex = { bits.persist(); bits.count(); this }
    def unpersisted(): SignIndex = { bits.unpersist(); this }
  }

  /** Build the sign index: a pure projection — no corpus aggregate at all
    * (sign needs no corpus statistics, unlike [[sq8Bounds]]). */
  def buildSignIndex(
      df: DataFrame, idCol: String, vecCol: String, dims: Int): SignIndex =
    SignIndex(
      df.select(col(idCol), signPackExpr(col(vecCol), dims).as("_bits")),
      idCol, dims)

  /** Batch Hamming top-`k` over the sign index: query vectors are packed
    * map-side (no corpus pass) and broadcast against one scan of the packed
    * corpus; per-query top-k via the skew-safe two-pass rank, NEAREST
    * first (ascending distance), ties to the lowest corpus id. Output:
    * `(q_id, rank, <idCol>, hamming)` — hamming is integral, so this probe
    * has no floating-point parity concerns at all. Same broadcast safety
    * valve as the sibling probes. */
  def probeSign(
      index: SignIndex, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, excludeSelf: Boolean = false,
      broadcastProbes: Boolean = true, guardBroadcast: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes0 = queries.select(
      col(qIdCol).as("_q_id"),
      signPackExpr(col(qVecCol), index.dims).as("_q_bits"))
    val probes =
      if (wantBroadcast(queries, broadcastProbes, guardBroadcast)) broadcast(probes0)
      else probes0
    val cands = index.bits.crossJoin(probes)
    val kept =
      if (excludeSelf) cands.filter(col(index.idCol) =!= col("_q_id")) else cands
    val scored = kept.select(
      col("_q_id"), col(index.idCol),
      hammingExpr(col("_bits"), col("_q_bits")).as("_ham"))
    TopK.perGroup(scored, Seq("_q_id"), Seq(col("_ham").asc, col(index.idCol).asc), k)
      .select(
        col("_q_id").as("q_id"), col("rank").cast("long").as("rank"),
        col(index.idCol), col("_ham").as("hamming"))
  }

  /** Single-query convenience over [[buildSignIndex]]/[[probeSign]] (the
    * oracle entry). For repeated retrieval build the index once. */
  def signTopK(
      df: DataFrame, idCol: String, vecCol: String, dims: Int,
      queryId: Long, k: Int): DataFrame =
    probeSign(
      buildSignIndex(df, idCol, vecCol, dims),
      df.filter(col(idCol) === queryId), idCol, vecCol, k,
      excludeSelf = true, guardBroadcast = false)
      .select(col(idCol), col("hamming"))

  // ---- Two-stage rerank funnel --------------------------------------------

  /** Exact re-rank tail of a retrieval funnel: take any per-query shortlist
    * `(\_q_id, <idCol>)` — from a Hamming scan, an IVF probe, a prefix-dim
    * pass, anything — attach the FULL-precision corpus vectors by id, and
    * finish with exact cosine top-`k`. Cost ∝ queries × shortlist, never
    * corpus size; the shortlist join is the only exchange. */
  def rerankExact(
      df: DataFrame, idCol: String, vecCol: String,
      shortlist: DataFrame, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes = broadcast(queries.select(
      col(qIdCol).as("_q_id"), col(qVecCol).as("_q_v")))
    val cands = shortlist.select(col("_q_id"), col(idCol))
      .join(df.select(col(idCol), col(vecCol).as("_v_full")), Seq(idCol))
      .join(probes, Seq("_q_id"))
    finishProbe(cands, idCol, "_v_full", k, excludeSelf = false)
  }

  /** Two-stage retrieval funnel on dimension PREFIXES (the
    * Matryoshka-embedding discipline: a prefix of the dimensions is itself
    * a usable lower-resolution embedding): stage 1 scores every corpus
    * vector against the query on the first `prefixDims` dimensions only and
    * keeps a per-query `shortlist`; stage 2 re-ranks the shortlist with
    * exact full-dimension cosine ([[rerankExact]]). The corpus-proportional
    * work drops to `prefixDims/dims` of brute force (at rest, store the
    * prefix as its own column and the stage-1 scan reads only those bytes);
    * full-precision cost is ∝ queries × shortlist. Self-matches are
    * excluded in stage 1. Output: the probe contract
    * `(q_id, rank, <idCol>, sim)`. */
  def rerankTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, prefixDims: Int, shortlist: Int,
      broadcastProbes: Boolean = true, guardBroadcast: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(prefixDims >= 1, s"prefixDims must be >= 1, got $prefixDims")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val probes0 = queries.select(
      col(qIdCol).as("_q_id"), col(qVecCol).as("_q_v"))
    val probes =
      if (wantBroadcast(queries, broadcastProbes, guardBroadcast)) broadcast(probes0)
      else probes0
    val coarse = df.select(col(idCol), col(vecCol).as("_v"))
      .crossJoin(probes)
      .filter(col(idCol) =!= col("_q_id"))
      .select(
        col("_q_id"), col(idCol),
        cosine(
          slice(col("_v"), 1, prefixDims),
          slice(col("_q_v"), 1, prefixDims)).as("_csim"))
      .filter(col("_csim").isNotNull && !isnan(col("_csim")))
    val short = TopK.perGroup(
        coarse, Seq("_q_id"), Seq(col("_csim").desc, col(idCol).asc), shortlist)
      .select(col("_q_id"), col(idCol))
    rerankExact(df, idCol, vecCol, short, queries, qIdCol, qVecCol, k)
  }

  /** Maximal-Marginal-Relevance diversified re-ranking (Carbonell &
    * Goldstein 1998): greedily pick `k` results from the exact top-`poolSize`
    * cosine pool, each pick maximizing
    * `λ·sim(q, d) − (1−λ)·max_{s∈picked} sim(d, s)` — relevance traded
    * against redundancy with what is already selected. This is the
    * retrieval-side twin of d09's semantic dedup: d09 prunes near-dups from
    * the CORPUS once; MMR prunes them from each RESULT LIST, which is what
    * a few-shot/RAG example selector actually needs (k near-identical
    * passages waste the whole context budget).
    *
    * Scale shape: the corpus is touched exactly once (the [[bruteForceTopK]]
    * pool probe — swap in an IVF probe at scale, the contract only needs
    * (id, sim, vector) rows); everything after runs on the ≤ poolSize pool
    * and its ≤ poolSize² pairwise sims, both eager-materialized. The greedy
    * loop is inherently sequential (each pick changes the next argmax — this
    * is s23/s24's iteration-ladder discipline): k bounded rounds, each a
    * pool-sized argmax fold via one-row broadcast struct-max — NO driver
    * collect anywhere. Scores and pair-sims are rounded 6 dp at every stage
    * boundary, ties break to the lowest id, so the trajectory is
    * engine-replayable ([[mmrSql]] generates the unrolled oracle). */
  def mmrRerank(
      df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      poolSize: Int, k: Int, lambda: Double): DataFrame = {
    require(poolSize >= 1 && k >= 1 && k <= poolSize,
      s"need 1 <= k <= poolSize, got k=$k poolSize=$poolSize")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = df.sparkSession
    val pool = bruteForceTopK(df, idCol, vecCol, queryId, poolSize)
      .join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .localCheckpoint(true)
    val a = pool.select(col(idCol).as("_a"), col(vecCol).as("_va"))
    val b = pool.select(col(idCol).as("_b"), col(vecCol).as("_vb"))
    val pairSims = a.join(b, col("_a") =!= col("_b"))
      .select(col("_a"), col("_b"),
        round(cosine(col("_va"), col("_vb")), 6).as("_psim"))
      .localCheckpoint(true)
    var state = pool
      .select(col(idCol), col("sim"), lit(0.0).as("_maxsel"))
      .localCheckpoint(true)
    val picks = Seq.newBuilder[DataFrame]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      if (state.isEmpty) { exhausted = true }
      else {
        val scored = state.withColumn("_score", stableRound(
          lit(lambda) * col("sim") - lit(1.0 - lambda) * col("_maxsel"), 6))
        val pick = scored
          .agg(max(struct(col("_score"), (-col(idCol)).as("_nid"))).as("_m"))
          .select(
            col("_m._score").as("_pscore"), (-col("_m._nid")).as("_pid"))
        picks += scored.join(broadcast(pick), col(idCol) === col("_pid"))
          .select(
            lit(r).as("rank"), col(idCol), col("_pscore").as("mmr_score"))
        state = scored.crossJoin(broadcast(pick))
          .where(col(idCol) =!= col("_pid"))
          .join(pairSims,
            col(idCol) === col("_a") && col("_pid") === col("_b"), "left")
          .select(col(idCol), col("sim"),
            greatest(col("_maxsel"), coalesce(col("_psim"), lit(0.0)))
              .as("_maxsel"))
          .localCheckpoint(true)
        r += 1
      }
    }
    picks.result() match {
      case Seq() => spark.emptyDataFrame
        .select(lit(0).as("rank"), lit(0L).as(idCol),
          lit(0.0).as("mmr_score")).limit(0)
      case ps => ps.reduce(_ unionByName _)
    }
  }

  /** GENERATED DuckDB oracle for [[mmrRerank]] — `k` unrolled greedy
    * rounds over the same pool/pair-sim/argmax trajectory with the same
    * 6 dp stage-boundary rounding and lowest-id tie-breaks. */
  def mmrSql(queryId: Long, poolSize: Int, k: Int, lambda: Double): String = {
    val lam = lambda
    val oneMinus = 1.0 - lambda
    def round(r: Int): String = {
      val prev = r - 1
      s"""sc$r AS (SELECT vec_id, ROUND(CAST($lam AS DOUBLE) * sim - CAST($oneMinus AS DOUBLE) * maxsel + 1e-9, 6) AS score
         |          FROM s$prev),
         |pk$r AS (SELECT vec_id, score FROM
         |          (SELECT vec_id, score,
         |                  row_number() OVER (ORDER BY score DESC, vec_id) AS rn
         |           FROM sc$r) WHERE rn = 1),
         |s$r AS (SELECT s.vec_id, s.sim,
         |               GREATEST(s.maxsel, coalesce(ps.psim, 0)) AS maxsel
         |        FROM s$prev s JOIN pk$r ON TRUE
         |        LEFT JOIN ps ON ps.a_id = s.vec_id AND ps.b_id = pk$r.vec_id
         |        WHERE s.vec_id <> pk$r.vec_id)""".stripMargin
    }
    val rounds = (1 to k).map(round).mkString(",\n")
    val finals = (1 to k)
      .map(r => s"SELECT CAST($r AS INTEGER) AS rank, vec_id, score AS mmr_score FROM pk$r")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = $queryId),
       |pool AS (SELECT e.vec_id,
       |                ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim, e.v
       |         FROM e, q WHERE e.vec_id <> $queryId
       |         ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id
       |         LIMIT $poolSize),
       |ps AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |              ROUND(list_cosine_similarity(a.v, b.v), 6) AS psim
       |       FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
       |s0 AS (SELECT vec_id, sim, CAST(0.0 AS DOUBLE) AS maxsel FROM pool),
       |$rounds
       |SELECT rank, vec_id, mmr_score FROM ($finals) ORDER BY rank""".stripMargin
  }

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix, md5-derived so
    * any engine reproduces it from the (seed, i, j) strings alone —
    * `sign(i, j) = +1 iff md5("seed_i_j")'s top-56-bit value is even`
    * (the [[Dedup.hash56]] convention; DuckDB mirror:
    * `('0x' || substr(md5(...), 1, 14))::UBIGINT % 2`). Row `j` holds
    * output dimension j's signs over input positions `i = 1..dims`
    * (1-based, matching `element_at`/list indexing). */
  def jlSignMatrix(dims: Int, outDim: Int, seed: String): Array[Array[Double]] = {
    require(dims >= 1 && outDim >= 1, s"dims/outDim must be >= 1")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, dims) { (j, i0) =>
      val hex = md.digest(s"${seed}_${i0 + 1}_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(14)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }
  }

  /** Johnson–Lindenstrauss signed random projection (Achlioptas ±1 form):
    * append `outCol = (Σᵢ v[i]·sign(i,j)) / √outDim` for j = 0..outDim−1 —
    * the cheap, data-independent d→k compression of the residency ladder
    * (PCA s18 learns the rotation from the data in one Gram pass; JL needs
    * NO pass at all, preserving pairwise L2 within 1±ε for
    * k = O(ln n / ε²) regardless of the data). Use it when the corpus is
    * too young or too churned to fit PCA against, or as the pre-rotation
    * before sign/SQ8 quantization.
    *
    * Scale shape: the matrix is k×d signs GENERATED driver-side (zero
    * corpus passes, zero shuffle) and baked into the plan, so projection
    * is map-only math — at 100 TB it pipelines into whatever scan already
    * reads the vectors. The default path is the
    * [[graft.functions.SignedProject]] codegen kernel (one primitive
    * double loop per vector); `useKernel = false` keeps the equivalent
    * higher-order-function tower (interpreted, k×d boxed evaluations per
    * vector — the parity spec pins the two bit-equal, and the measured
    * gap is in SCALE.md). Projected coordinates are 6dp-rounded
    * (stage-boundary discipline), so downstream distances are computed on
    * identical numbers in any engine. */
  def jlProject(
      df: DataFrame, vecCol: String, dims: Int, outDim: Int, seed: String,
      outCol: String = "jl_vec", useKernel: Boolean = true): DataFrame = {
    val signs = jlSignMatrix(dims, outDim, seed)
    val scale = math.sqrt(outDim.toDouble)
    if (useKernel)
      df.withColumn(outCol, graft.functions.ArrayKernels.signedProject(
        col(vecCol), signs.flatten, outDim, scale))
    else {
      val signLit = array(signs.map(r => array(r.map(lit(_)): _*)): _*)
      df.withColumn(outCol,
        transform(sequence(lit(0), lit(outDim - 1)), j =>
          stableRound(
            aggregate(sequence(lit(1), lit(dims)), lit(0.0), (acc, i) =>
              acc + element_at(col(vecCol), i).cast("double") *
                element_at(element_at(signLit, j + 1), i)) / lit(scale), 6)))
    }
  }

  /** S30 — graded-relevance ranking metrics: nDCG@k, MRR@k, AP@k per query,
    * the retrieval-quality evaluation next to [[recallAtK]]'s binary overlap
    * (recall cannot see ORDER or GRADE; these can). Standard definitions:
    * DCG = Σ (2^rel − 1)/log2(rank+1) over the top k; nDCG = DCG/IDCG
    * (null when the query has no relevant docs); MRR = 1/rank of the first
    * relevant in the top k (0 if none); AP@k = Σ_{rel hits} P@i / min(R, k)
    * (TREC convention, null when R = 0).
    *
    * Scale shape: everything is (queries × k)-sized after the rank filter —
    * the one window orders ≤ k rows per query. The IDEAL ranking never
    * sorts the corpus: IDCG comes CLOSED-FORM from per-grade counts (grades
    * desc, cumulative fill of the k slots, explode ≤ k positions per
    * query). `relevance` carries only rel > 0 judgments (absent = 0, the
    * judgment-file convention); retrieved docs without judgments gain 0.
    *
    * @param retrieved `(qCol, idCol, rankCol)` — rank 1-based, dense per
    *                  query ([[bruteForceBatch]]'s shape)
    * @param relevance `(qCol, idCol, relCol)` — integer grades > 0
    */
  def rankingMetrics(
      retrieved: DataFrame, relevance: DataFrame, qCol: String,
      idCol: String, rankCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val rel = relevance
      .select(col(qCol), col(idCol), col(relCol).cast("long").as("_rel"))
      .where(col("_rel") > 0)
    val r = retrieved.where(col(rankCol) <= k)
      .select(col(qCol), col(idCol), col(rankCol).cast("long").as("_rk"))
      .join(rel, Seq(qCol, idCol), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(0L)))
    val w = Window.partitionBy(qCol).orderBy(col("_rk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perQ = r
      .withColumn("_cumrel",
        sum(when(col("_rel") > 0, 1L).otherwise(0L)).over(w))
      .groupBy(col(qCol))
      .agg(
        sum((pow(lit(2.0), col("_rel")) - lit(1.0)) / log2(col("_rk") + 1))
          .as("_dcg"),
        min(when(col("_rel") > 0, col("_rk"))).as("_fr"),
        sum(when(col("_rel") > 0, col("_cumrel").cast("double") / col("_rk"))
          .otherwise(0.0)).as("_apnum"))
    val relStats = rel.groupBy(col(qCol)).agg(count(lit(1)).as("n_rel"))
    val wg = Window.partitionBy(qCol).orderBy(col("_rel").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ideal = rel
      .groupBy(col(qCol), col("_rel"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_before", coalesce(sum(col("_c")).over(wg), lit(0L)))
      .withColumn("_take",
        greatest(lit(0L), least(col("_c"), lit(k.toLong) - col("_before"))))
      .where(col("_take") > 0)
      .withColumn("_pos",
        explode(sequence(col("_before") + 1, col("_before") + col("_take"))))
      .groupBy(col(qCol))
      .agg(sum((pow(lit(2.0), col("_rel")) - lit(1.0)) / log2(col("_pos") + 1))
        .as("_idcg"))
    perQ
      .join(relStats, Seq(qCol), "left")
      .join(ideal, Seq(qCol), "left")
      .select(
        col(qCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        stableRound(col("_dcg") / col("_idcg"), 6).as(s"ndcg_at_$k"),
        stableRound(coalesce(lit(1.0) / col("_fr"), lit(0.0)), 6)
          .as(s"mrr_at_$k"),
        stableRound(
          col("_apnum") /
            when(col("n_rel").isNotNull,
              least(col("n_rel"), lit(k.toLong)).cast("double")), 6)
          .as(s"ap_at_$k"))
  }
}
