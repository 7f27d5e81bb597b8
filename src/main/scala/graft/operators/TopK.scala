package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-k rows per group, scale-safe under group skew.
  *
  * The textbook form — `row_number() over (partition by group order by s)`
  * then `filter rank <= k` — puts each group's ENTIRE row set through one
  * task's sort: a hot group (one language owning 90% of a 100 TB corpus)
  * becomes a job-length straggler, the same shape as the as-of hot key
  * ([[AsOfJoin.asOfBucketed]]) and the quantile value buffer
  * ([[Quantiles.exactGrouped]]). This is the two-pass fix:
  *
  *  1. LOCAL top-k within (group, input partition): a window over the
  *     (group, partition-id) slice — never larger than one input partition —
  *     discards everything below rank k. Survivors per group ≤ k × partitions.
  *  2. GLOBAL top-k over the survivors: the same window partitioned by group
  *     alone, now over ≤ k × partitions rows per group instead of the group's
  *     full cardinality.
  *
  * Correct because a row outside its partition's local top-k cannot be in the
  * global top-k (k better rows exist in that partition alone). Exact for any
  * `sortCols`, including ties — give a total order (tie-break column) for
  * deterministic output, as the oracle-checked queries do.
  *
  * Cost: two exchanges (by (group, pid), then by group), both balanced; the
  * global pass moves ≤ k × partitions rows per group. The single-window form
  * is one exchange but unbounded per-task; prefer this form whenever group
  * sizes are data-dependent.
  */
object TopK {

  /** Top `k` rows per `groupCols` under `sortCols` (give a total order for
    * determinism). Adds `rank` (1-based within group). */
  def perGroup(
      df: DataFrame, groupCols: Seq[String], sortCols: Seq[Column],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    perGroupImpl(df, groupCols, sortCols, lit(k.toLong))
  }

  /** The two-pass rank with a PER-ROW k expression (constant within each
    * group — e.g. a per-stratum quota joined on beforehand). The local prune
    * stays exact for any group-constant k: a row below local rank k_g in one
    * partition has k_g better rows there alone. */
  private def perGroupImpl(
      df: DataFrame, groupCols: Seq[String], sortCols: Seq[Column],
      kExpr: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    val gCols = groupCols.map(col)
    val local = Window
      .partitionBy(gCols :+ col("_tk_pid"): _*)
      .orderBy(sortCols: _*)
    val global = Window.partitionBy(gCols: _*).orderBy(sortCols: _*)
    df.withColumn("_tk_pid", spark_partition_id())
      .withColumn("_tk_lrk", row_number().over(local))
      .filter(col("_tk_lrk") <= kExpr)
      .withColumn("rank", row_number().over(global))
      .filter(col("rank") <= kExpr)
      .drop("_tk_pid", "_tk_lrk")
  }

  /** The hash-threshold for a Bernoulli-by-hash `rate`: a row whose
    * [[Dedup.hash56]] key hash falls below it is in the sample. Exposed so
    * a SQL oracle (or another engine) can inline the SAME integer literal
    * rather than re-deriving it from a float. */
  def hashThreshold(rate: Double): Long = {
    require(rate > 0.0 && rate <= 1.0, s"rate must be in (0, 1], got $rate")
    (rate * (1L << 56).toDouble).toLong
  }

  /** Deterministic Bernoulli-by-hash sample: keep rows whose
    * `hash56(key) < threshold(rate)` — a MAP-ONLY filter (zero shuffle,
    * composes with any downstream aggregate), stable across runs, engines
    * and partitionings, and MERGEABLE by construction: the sample of a
    * union is the union of samples, and samples at rate r nest inside
    * samples at any r' > r (subsample by tightening the threshold, never
    * by resampling). The uniform-hash sample is what bounds a 100 TB
    * quantile/profile pass at rate × corpus rows — see
    * [[Quantiles.exactGrouped]] applied to this output (q64). */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(Dedup.hash56(key.cast("string")) < lit(hashThreshold(rate)))

  /** Deterministic stratified sample: `k` rows per stratum, selected by
    * md5-hash order of `idCol` (stable across runs, engines, and
    * partitionings — the same selection DuckDB computes from the same
    * data). Use for train/eval carve-outs where per-stratum sizes must be
    * exact; for fraction-based splits see
    * [[TextAnalysis.deterministicSplit]], which needs no shuffle at all. */
  def stratifiedSample(
      df: DataFrame, strataCols: Seq[String], idCol: String, k: Int): DataFrame =
    perGroup(
      df, strataCols,
      Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc), k)

  /** Deterministic WEIGHTED mixture sampling — the domain-reweighting step
    * of corpus curation (take 30% of web, 100% of books, 5% of logs…).
    * Per-stratum quota `k_s = ceil(fraction_s × n_s)` where `fraction` is
    * any expression over the strata columns; rows are selected in md5-hash
    * order of `idCol`, so the selection is stable across runs, engines, and
    * physical layout.
    *
    * Scale shape: stratum counts are one hash aggregate (tiny — ∝ strata
    * cardinality) broadcast back onto the rows; selection is the same
    * two-pass skew-safe rank as [[perGroup]] with the per-stratum quota as
    * the cut, so one giant stratum cannot serialize a task's sort. */
  def weightedStratifiedSample(
      df: DataFrame, strataCols: Seq[String], idCol: String,
      fraction: Column): DataFrame = {
    require(strataCols.nonEmpty, "strataCols must be non-empty")
    val gCols = strataCols.map(col)
    val quotas = df.groupBy(gCols: _*)
      .agg(count(lit(1)).as("_tk_n"))
      .withColumn("_tk_k", ceil(col("_tk_n") * fraction).cast("long"))
      .drop("_tk_n")
    perGroupImpl(
      df.join(broadcast(quotas), strataCols),
      strataCols,
      Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc),
      col("_tk_k")).drop("_tk_k")
  }

  /** Temperature-scaled sampling weights per group — the multilingual /
    * multi-domain rebalancing step (the XLM-R `α`-smoothing): a group with
    * token share `p_i` is sampled with probability
    * `q_i = p_i^α / Σ_j p_j^α`; `α < 1` up-samples the tail, `α = 1` keeps
    * the natural distribution. The output `boost = q/p` is the per-group
    * over/under-sampling factor a sampler like
    * [[weightedStratifiedSample]] consumes as its fraction.
    *
    * Shape: ONE corpus pass (a map-side-combined hash aggregate, ∝ group
    * cardinality); everything after operates on the tiny group table with
    * one-row broadcast totals — never a second pass, never a driver
    * collect. Output: `(groupCol, n_docs, n_tokens, p, q, boost)`,
    * rates stable-rounded to 6 dp. */
  def temperatureWeights(
      df: DataFrame, groupCol: String, sizeCol: Column,
      alpha: Double): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(sizeCol).as("_nt"))
    temperatureFromMass(g, col("_nt"), alpha)
      .select(
        col(groupCol), col("n_docs"), col("_nt").cast("long").as("n_tokens"),
        col("p"), col("q"), col("boost"))
  }

  /** The temperature normalization over an ALREADY-aggregated per-group
    * mass table — the reusable core of [[temperatureWeights]] for callers
    * whose mass is not a plain `sum(sizeCol)` (c06 feeds a soft-dedup ×
    * DSIR-tilted DECIMAL mass). Appends `p = mass/Σmass`,
    * `q = p^α / Σ p^α`, `boost = q/p` (6 dp) to `agg`'s columns; totals
    * are one-row broadcasts, nothing rescans whatever produced `agg`. */
  def temperatureFromMass(
      agg: DataFrame, massCol: Column, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val tot = agg.agg(sum(massCol).as("_tot"))
    val p = agg.crossJoin(broadcast(tot))
      .withColumn("_p", massCol.cast("double") / col("_tot").cast("double"))
      .withColumn("_pa", pow(col("_p"), alpha))
    val z = p.agg(sum("_pa").as("_z"))
    p.crossJoin(broadcast(z))
      .withColumn("p", stableRound(col("_p"), 6))
      .withColumn("q", stableRound(col("_pa") / col("_z"), 6))
      .withColumn("boost", stableRound((col("_pa") / col("_z")) / col("_p"), 6))
      .drop("_tot", "_p", "_pa", "_z")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, A-ES): row `i` gets priority `ln(u_i) / w_i` with
    * `u_i` uniform on (0,1); the `n` largest priorities are exactly an
    * n-sample without replacement with inclusion probability proportional
    * to weight. The per-row randomness is md5-derived from `idCol` (the
    * same engine-portable idiom as [[stratifiedSample]]): the top 14 hex
    * chars as a 56-bit integer, `u = (h + 0.5) / 2^56` — never 0, so
    * `ln` is finite. Rows with non-positive or null weight are excluded
    * (they have zero inclusion probability by definition).
    *
    * Priorities are continuous 56-bit randoms, so cross-engine `ln` ulp
    * differences cannot realistically reorder the cut (unlike score ties,
    * which [[stratifiedSample]]'s discrete ranks must tie-break); `id`
    * remains the formal tie-break. Scale shape: one scan + per-partition
    * top-n (`TakeOrderedAndProject`) — no global sort, no shuffle of the
    * corpus, driver merge ∝ n × partitions.
    *
    * Output: `(idCol, weightCol, samp_key)` for the `n` sampled rows,
    * `samp_key` 6 dp. */
  /** The A-ES priority `ln(u)/w` with md5-derived `u` — shared by the batch
    * sampler and [[graft.streaming.StreamingSample]] so batch and stream
    * draw BIT-IDENTICAL keys (the property that makes the streaming top-n
    * merge equal the batch sample over everything seen). */
  private[graft] def aesKey(id: Column, weight: Column): Column = {
    val u = (graft.functions.ArrayKernels.hash56(id.cast("string"))
      .cast("double") + 0.5) / math.pow(2.0, 56)
    log(u) / weight.cast("double")
  }

  def weightedSampleNoReplacement(
      df: DataFrame, idCol: String, weightCol: String, n: Int): DataFrame = {
    require(n >= 1, s"sample size n must be >= 1, got $n")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        aesKey(col(idCol), col(weightCol)).as("_sk"))
      .orderBy(col("_sk").desc, col(idCol))
      .limit(n)
      .select(col(idCol), col(weightCol), stableRound(col("_sk"), 6).as("samp_key"))
  }

  /** Rank an ALREADY-BOUNDED frame (a retriever's top-k output: ≤ k rows
    * by construction) by `(scoreCol desc, idCol asc)` WITHOUT a window: the
    * rows collapse into ONE sorted struct array (the foldAssign collapse
    * discipline) and `posexplode` re-emits them with their 1-based
    * position. The textbook constant-partition window spelling constant-
    * folds into WindowExec's unpartitioned single-task path — harmless at
    * k rows but indistinguishable in the logs from a genuine scale bug, so
    * the bench keeps its zero-`No Partition Defined` invariant instead.
    * Output: `(idCol, scoreCol, rank)` (rank matches `row_number` over the
    * same total order). Use ONLY on frames bounded by construction — this
    * materializes the whole frame as one array row. */
  def rankBounded(df: DataFrame, idCol: String, scoreCol: String): DataFrame =
    df.agg(array_sort(collect_list(struct(
        (-col(scoreCol)).as("_ns"), col(idCol).as("_id")))).as("_arr"))
      .select(posexplode(col("_arr")).as(Seq("_p", "_r")))
      .select(
        col("_r._id").as(idCol),
        (-col("_r._ns")).as(scoreCol),
        (col("_p") + 1).cast("int").as("rank"))

  /** Reciprocal-rank fusion (Cormack-Clarke-Buettcher 2009) — the standard
    * hybrid-retrieval merge: given several rankings of the same id space
    * (BM25, dense ANN, recency…), each list contributes `1/(c + rank)` for
    * every id it ranks, absent ids contribute nothing, and the fused
    * ordering is by the summed score. Rank-based, so the input scores
    * never need calibration against each other — the reason RRF is the
    * production default for lexical+vector fusion. `c = 60` is the
    * published constant.
    *
    * Inputs are top-k lists (each already bounded by its retriever's k),
    * so every frame here is k-sized: the union, the per-id fold, and the
    * final `TakeOrderedAndProject` are all trivially small at any corpus
    * scale — the heavy lifting happened inside the retrievers. Ties in
    * the fused score break on id.
    *
    * Output: `(idCol, n_lists, rrf)` top-`k` rows, rrf 6 dp. */
  def reciprocalRankFusion(
      rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, c: Double = 60.0): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 1, s"k must be >= 1, got $k")
    require(c >= 0, s"c must be >= 0, got $c")
    rankings
      .map(_.select(col(idCol), col(rankCol).cast("double").as("_rk")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lists"),
        stableRound(sum(lit(1.0) / (lit(c) + col("_rk"))), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
