package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over an edge list — the graph-centrality rank a
  * data pipeline uses to weight sources/domains by link authority (the
  * CommonCrawl-style "rank the hosts, then sample training data by rank"
  * step), and a natural companion to the connected-components family in
  * [[Dedup]] (components answer "which docs are the same?", rank answers
  * "which node matters?"). Beyond the reference's surface (its joins are
  * dimension enrichment, `dod-etl/.../eventProcessor` scope) — north-star
  * extension like the rest of this package.
  *
  * Design for 100 TB (the standard join-aggregate PageRank, the same
  * data movement GraphX's Pregel emits per superstep):
  *   - edges are normalized once (optionally symmetrized), joined with their
  *     out-degree, hash-partitioned by `src` and PERSISTED — the edge table,
  *     the corpus-sized side, is shuffled exactly once for the whole run.
  *   - each iteration shuffles only the RANK table (one row per node —
  *     orders of magnitude smaller than edges) to the edge partitioning,
  *     joins, and aggregates contributions by `dst` (map-side combined).
  *     Iterations are materialized stepwise (persist + count) exactly like
  *     [[Similarity.buildIvfIndexAuto]]'s Lloyd rounds — lazily chaining k
  *     iterations would replay rounds 1..i-1 under round i (O(k²) passes)
  *     and grow an unplannably deep lineage.
  *   - a fixed iteration count (not a convergence loop) keeps the run
  *     deterministic and oracle-mirrorable; 3-10 iterations is the standard
  *     operating range for rank-as-a-feature.
  *
  * Semantics: teleport `(1-d)/N` + damped in-neighbor mass `d·Σ r(u)/deg(u)`.
  * Nodes are the distinct `src` values after normalization; on a DIRECTED
  * graph, sink nodes (no out-edges) appear only as `dst` and their mass
  * LEAKS (ranks no longer sum to 1) — the documented simple variant. Pass
  * `undirected = true` (the default) to symmetrize first: every node then
  * has out-edges, mass is conserved, and the fixpoint is the classic
  * degree-biased stationary distribution. */
object GraphRank {

  /** Run `iters` PageRank iterations over `edges` (columns `srcCol`,
    * `dstCol`; self-loops and duplicate edges are dropped; null endpoints
    * dropped). Output: `(node, rank_norm)` where `rank_norm = rank · N`
    * (average 1.0 — scale-free, so 6-dp rounding keeps meaningful digits at
    * any graph size; multiply by 1/N for the probability form). */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      undirected: Boolean = true): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(damping >= 0 && damping < 1, s"pageRank: damping in [0,1), got $damping")
    val raw = edges
      .select(col(srcCol).cast("string").as("_src"), col(dstCol).cast("string").as("_dst"))
      .where(col("_src").isNotNull && col("_dst").isNotNull && col("_src") =!= col("_dst"))
    val dedup =
      (if (undirected)
        raw.unionAll(raw.select(col("_dst").as("_src"), col("_src").as("_dst")))
      else raw).distinct()
    // ONE edge shuffle for the whole run (round-17 optimization): the
    // previous form paid the distinct exchange PLUS a degree groupBy
    // exchange PLUS a repartition(_src) exchange of the joined adjacency —
    // three corpus-sized shuffles before the first iteration. The degree is
    // a per-_src count, so after the single repartition(_src) it is a keyed
    // window over exactly that partitioning (no new exchange, no join, no
    // broadcast build); values are identical to the join form. The window
    // is keyed (never global), so a hot node serializes only its own key
    // group — same contract as the old groupBy.
    val bysrc = org.apache.spark.sql.expressions.Window.partitionBy("_src")
    val adj = dedup.repartition(col("_src"))
      .withColumn("_deg", count(lit(1)).over(bysrc))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // distinct _src values read off the _src-partitioned cache — the
    // groupBy reuses adj's partitioning (zero exchange)
    val nodes = adj.select(col("_src").as("_node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val teleport = (1.0 - damping) / n

    var ranks = nodes.select(col("_node"), lit(1.0 / n).as("_rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    var prev = ranks
    (1 to iters).foreach { _ =>
      val contrib = adj
        .join(ranks.withColumnRenamed("_node", "_src"), Seq("_src"))
        .groupBy(col("_dst"))
        .agg(sum(col("_rank") / col("_deg")).as("_m"))
      // left join back onto the node set: a node nobody links to still holds
      // its teleport mass (directed-graph case; symmetrized graphs always match)
      ranks = nodes
        .join(contrib.withColumnRenamed("_dst", "_node"), Seq("_node"), "left")
        .select(col("_node"),
          (lit(teleport) + lit(damping) * coalesce(col("_m"), lit(0.0))).as("_rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      ranks.count()
      prev.unpersist(blocking = false)
      prev = ranks
    }
    val out = ranks.select(
      col("_node").as("node"),
      stableRound(col("_rank") * n, 6).as("rank_norm"))
    adj.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    // final ranks stay persisted and are owned by the returned frame (same
    // contract as IvfIndex.assignments)
    out
  }
}
