package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the ANN compression step beyond SQ8: split
  * every vector into `m` contiguous subvectors, Lloyd-fit a tiny codebook
  * of `k` centroids PER SUBSPACE, and store each vector as its `m` code
  * ids. At `m=8, k=256` a 768-float vector becomes 8 bytes — 384×
  * smaller — which is what makes a 100 TB embedding corpus probe-able
  * from memory at all: queries scan the CODES (asymmetric distance
  * computation, ADC: per-query distance table of `m × k` entries, doc
  * distance = sum of table lookups), never the raw floats. Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011.
  *
  * North-star extension (no reference analog; complements the engine's
  * IVF/LSH/SQ8 family — IVF prunes WHICH vectors to score, PQ shrinks
  * WHAT a score costs). Everything is engine-portable and deterministic:
  * md5-seeded cells ([[Dedup.hash56]] mod k, the [[Similarity
  * .kmeansClusters]] seeding), hard E-steps on 6dp-stable-rounded L2
  * distances with ties to the lowest cell, 6dp-rounded centroid
  * components at every round boundary — so a DuckDB oracle unrolls the
  * whole trajectory (fit, codes, ADC ranking) and hash-matches it.
  *
  * Scale shape: [[fit]] is `iters` corpus passes, each ONE pass — the
  * M-step is a map-side-combined (sub, cell, pos) mean (shuffle ∝
  * m × k × subDim, never rows), the E-step a broadcast-codebook fold
  * (rows never move); rounds are eager-materialized so the build is
  * exactly `iters` passes, not the O(iters²) a lazy chain would
  * recompute. [[encode]] is one pass emitting m small ints per row.
  * [[adcTopK]] joins the per-query `m × k` distance table (broadcast)
  * against the codes — cost ∝ queries × corpus × m table lookups on
  * m-int rows, finished by the skew-safe two-pass top-k; raw vectors are
  * touched only to build the query's table. */
object Pq {

  /** A fitted PQ codebook: `cents` = `(_sub, _cell, _c)` — m × k rows,
    * centroid components 6dp-rounded. */
  final case class Codebook(cents: DataFrame, m: Int, k: Int, subDim: Int) {
    def persisted(): Codebook = { cents.persist(); cents.count(); this }
    def unpersisted(): Codebook = { cents.unpersist(); this }
  }

  /** `(idCol, _sub, _sv)` — one row per (vector, subspace), subvector cast
    * to double. Rows with a null vector are dropped (they can carry no
    * code); a short vector yields short subvectors, which the L2 kernel
    * nulls out and [[assign]] then rejects loudly. */
  private def subVectors(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    df.where(col(vecCol).isNotNull)
      .select(
        col(idCol),
        posexplode(array((0 until m).map(s =>
          transform(
            slice(col(vecCol), s * subDim + 1, subDim), _.cast("double"))): _*))
          .as(Seq("_sub", "_sv")))

  /** M-step: per (subspace, cell) centroid = element-wise mean of member
    * subvectors, components 6dp-rounded (the cross-engine round boundary). */
  private def centroids(assigned: DataFrame): DataFrame =
    assigned
      .select(
        col("_sub"), col("_cell"), posexplode(col("_sv")).as(Seq("_pos", "_x")))
      .groupBy("_sub", "_cell", "_pos")
      .agg(avg("_x").as("_mu"))
      .groupBy("_sub", "_cell")
      .agg(
        transform(
          array_sort(
            collect_list(struct(col("_pos"), stableRound(col("_mu"), 6).as("_mu")))),
          x => x.getField("_mu")).as("_c"))

  /** E-step: nearest centroid WITHIN the row's subspace — broadcast fold
    * over the (sub, cell)-sorted codebook, strict `<` on the 6dp-rounded
    * L2 distance so rounded ties keep the LOWEST cell (mirrors
    * `row_number() OVER (ORDER BY d, cell)`). A null distance (short /
    * null subvector) assigns no cell and is rejected loudly rather than
    * encoded arbitrarily. */
  private def assign(sub: DataFrame, cents: DataFrame, idCol: String): DataFrame = {
    val cb = cents.agg(
      array_sort(collect_list(struct(col("_sub"), col("_cell"), col("_c"))))
        .as("_cb"))
    sub.crossJoin(broadcast(cb))
      .withColumn("_best",
        aggregate(
          filter(col("_cb"), x => x.getField("_sub") === col("_sub")),
          struct(lit(Double.MaxValue).as("_d"), lit(-1L).as("_cell")),
          (acc, x) =>
            graft.operators.let(
              stableRound(Similarity.l2Dist(col("_sv"), x.getField("_c")), 6)) { d =>
              when(d < acc.getField("_d"),
                struct(d.as("_d"), x.getField("_cell").as("_cell")))
                .otherwise(acc)
            }))
      .select(
        col(idCol), col("_sub"), col("_sv"),
        when(col("_best").getField("_cell") === -1L,
          raise_error(concat(
            lit("PQ assign: no centroid reachable for id "),
            col(idCol).cast("string"),
            lit(" subspace "), col("_sub").cast("string"),
            lit(" (null or short subvector?)"))).cast("long"))
          .otherwise(col("_best").getField("_cell")).as("_cell"))
  }

  /** Lloyd-fit the per-subspace codebooks: md5-seeded cells, then `iters`
    * (M-step, E-step) rounds; the returned codebook is the LAST M-step's
    * centroids (the [[Similarity.kmeansClusters]] trajectory, per
    * subspace). `dims` must equal `m * subDim` of the input vectors.
    * The returned codebook's `cents` frame comes back PERSISTED (the fit
    * loop materialized it eagerly; every downstream encode/probe reuses
    * it) — release it with [[Codebook.unpersisted]] when done. */
  def fit(
      df: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int, iters: Int = 2): Codebook = {
    require(m >= 1 && k >= 2, s"need m >= 1 subspaces and k >= 2 codes, got $m/$k")
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val subDim = dims / m
    val sub = subVectors(df, idCol, vecCol, m, subDim)
    var assigned = sub.withColumn(
      "_cell", pmod(Dedup.hash56(col(idCol).cast("string")), lit(k.toLong)))
    var cents: DataFrame = null
    var prev: Option[DataFrame] = None
    (1 to iters).foreach { _ =>
      val c = centroids(assigned).persist()
      c.count() // eager: exactly `iters` corpus passes, not O(iters^2)
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(c)
      cents = c
      assigned = assign(sub, c, idCol)
    }
    Codebook(cents, m, k, subDim)
  }

  /** One corpus pass emitting each vector's code word: `(idCol, _codes)`,
    * an m-element array ordered by subspace — the m-int (at k ≤ 256,
    * m-byte) representation every ADC probe scans instead of the raw
    * floats. */
  def encode(df: DataFrame, idCol: String, vecCol: String, cb: Codebook): DataFrame =
    assign(subVectors(df, idCol, vecCol, cb.m, cb.subDim), cb.cents, idCol)
      .groupBy(col(idCol))
      .agg(
        transform(
          array_sort(collect_list(struct(col("_sub"), col("_cell")))),
          x => x.getField("_cell")).as("_codes"))

  /** ADC top-k: for each query, build the `m × k` table of 6dp-rounded
    * subspace distances to every centroid (broadcast — it is tiny), score
    * every encoded doc as the sum of its m squared table entries, and
    * keep the k nearest (ties to the lowest doc id). Output: `(q_id,
    * rank, <idCol>, adc_dist2)` with rank 1 = nearest — the approximate
    * mirror of [[Similarity.bruteForceL2Batch]]'s contract (squared
    * because ADC sums per-subspace squared distances; monotone in L2, so
    * the ranking is what matters). The corpus side touches ONLY
    * `(id, _codes)` rows. */
  def adcTopK(
      cb: Codebook, codes: DataFrame, idCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dt = subVectors(queries, qIdCol, qVecCol, cb.m, cb.subDim)
      .select(col(qIdCol).as("_q_id"), col("_sub"), col("_sv"))
      .join(cb.cents, Seq("_sub"))
      .select(
        col("_q_id"), col("_sub"), col("_cell"),
        stableRound(Similarity.l2Dist(col("_sv"), col("_c")), 6).as("_d"))
    val scored = codes
      .select(col(idCol), posexplode(col("_codes")).as(Seq("_sub", "_cell")))
      .join(broadcast(dt), Seq("_sub", "_cell"))
      .groupBy(col("_q_id"), col(idCol))
      .agg(stableRound(sum(col("_d") * col("_d")), 6).as("_dist2"))
    TopK.perGroup(scored, Seq("_q_id"), Seq(col("_dist2").asc, col(idCol).asc), k)
      .select(
        col("_q_id").as("q_id"), col("rank").cast("long").as("rank"),
        col(idCol), col("_dist2").as("adc_dist2"))
  }

  /** IVF-PQ — the FAISS-standard pairing of the engine's two ANN halves,
    * composed: IVF prunes WHICH vectors to score (coarse cells, probe the
    * `nProbe` nearest by query→centroid L2), PQ shrinks WHAT a score
    * costs (ADC over m-int codes). At 100 TB this is the only shape that
    * holds: scan ∝ probed-cell members, bytes ∝ codes — neither the raw
    * floats nor the full corpus is ever touched per query ([[adcTopK]]
    * alone still scans every code row; [[Similarity.sq8IvfTopK]] prunes
    * but pays 1-byte-per-DIM residency, PQ is 1-int-per-SUBSPACE).
    *
    * Inputs: a fitted [[Codebook]] + `(id, _codes)` rows ([[encode]]),
    * the coarse membership `(id, cellCol)` and its
    * [[Similarity.centroids]] frame, and a query frame. Output:
    * `(q_id, rank, <idCol>, adc_dist2)` — [[adcTopK]]'s contract, so
    * [[Similarity.recallAtK]] audits it unchanged against the exact
    * baseline. Deterministic: coarse distances 6dp-stable-rounded with
    * ties to the lowest cell, ADC ties to the lowest id — the trajectory
    * an oracle replays.
    *
    * Shape: coarse routing is a broadcast of the cell-centroid frame
    * (cells × dims — tiny) crossed with queries + the skew-safe two-pass
    * top-nProbe; candidate restriction is an equi-join of codes against
    * the probed (query, member) frame; scoring is the broadcast
    * distance-table lookup-sum. No corpus-wide scan, no window over the
    * corpus, no driver collect. */
  def ivfPqTopK(
      cb: Codebook, codes: DataFrame, idCol: String,
      cells: DataFrame, cellCol: String, cents: DataFrame,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val qd = queries.select(col(qIdCol).as("_q_id"), col(qVecCol).as("_qv"))
    val cellDist = qd.crossJoin(broadcast(cents))
      .select(
        col("_q_id"), col("_cell"),
        stableRound(Similarity.l2Dist(col("_qv"), col("_centroid")), 6)
          .as("_cd"))
    val probed = TopK
      .perGroup(cellDist, Seq("_q_id"),
        Seq(col("_cd").asc, col("_cell").asc), nProbe)
      .select(col("_q_id"), col("_cell"))
    val members = probed
      .join(cells.select(col(idCol), col(cellCol).as("_cell")), Seq("_cell"))
      .select(col("_q_id"), col(idCol))
    val dt = subVectors(queries, qIdCol, qVecCol, cb.m, cb.subDim)
      .select(col(qIdCol).as("_q_id"), col("_sub"), col("_sv"))
      .join(cb.cents, Seq("_sub"))
      .select(
        col("_q_id"), col("_sub"), col("_cell"),
        stableRound(Similarity.l2Dist(col("_sv"), col("_c")), 6).as("_d"))
    val scored = codes
      .join(members, Seq(idCol))
      .select(
        col("_q_id"), col(idCol),
        posexplode(col("_codes")).as(Seq("_sub", "_cell")))
      .join(broadcast(dt), Seq("_q_id", "_sub", "_cell"))
      .groupBy(col("_q_id"), col(idCol))
      .agg(stableRound(sum(col("_d") * col("_d")), 6).as("_dist2"))
    TopK.perGroup(scored, Seq("_q_id"), Seq(col("_dist2").asc, col(idCol).asc), k)
      .select(
        col("_q_id").as("q_id"), col("rank").cast("long").as("rank"),
        col(idCol), col("_dist2").as("adc_dist2"))
  }
}
