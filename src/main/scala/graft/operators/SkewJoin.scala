package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[SkewJoin.autoJoin]]'s routing verdict — returned WITH the join so a
  * pipeline can log/pin why a plan was chosen. `topKeyShareLb` is the
  * Misra-Gries LOWER bound on the hottest key's share of the big side
  * (an MG weight can only undercount), so a `salted` verdict is never
  * triggered by sketch error — only suppressed by it, the safe
  * direction: a missed borderline skew degrades to AQE's runtime
  * handling, while a false positive would replicate the small side for
  * nothing. */
final case class JoinDecision(
    route: String, smallRows: Long, bigRows: Long, topKeyShareLb: Double,
    nSalts: Int)

/** Salted equi-join for pathological key skew.
  *
  * AQE's skew-join splitting already handles most skew at runtime (it splits
  * oversized SORT-MERGE partitions by input bytes), but two cases escape it:
  * a skewed SHUFFLE_HASH/broadcast-ineligible join where one build key
  * dominates, and pipelines that disable AQE (e.g. fixed partitioning
  * contracts for downstream `mapPartitions` state). Salting is the explicit,
  * planner-independent fix: the big side's hot keys spread over `nSalts`
  * subpartitions, the small side replicates `nSalts`× so every subpartition
  * still finds its match. Shuffle of the big side is unchanged in bytes but
  * max-task size drops ~`nSalts`×; the small side pays an `nSalts`×
  * replication (keep it the DIMENSION side).
  *
  * The salt is `pmod(xxhash64(monotonically_increasing_id()), n)` — derived
  * from row identity, not the join key (same-key rows MUST spread) and not
  * `rand()` (non-deterministic under task retry, which can duplicate or drop
  * rows in a recomputed partition; xxhash64 of the partition-stable id is
  * retry-stable within a job).
  */
object SkewJoin {

  /** Inner/left equi-join `big ⋈ small` on `keys`, with the big side salted
    * `nSalts` ways. Result columns = `big.*` ++ (`small.*` minus keys),
    * exactly like `big.join(small, keys, joinType)`.
    *
    * @param joinType "inner" or "left" (the salt trick preserves exactly
    *                 these; right/full would need the salt on the other side)
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      nSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    require(Set("inner", "left").contains(joinType),
      s"saltedJoin supports inner/left, got $joinType")
    val SALT = "_graft_salt"
    val salted = big.withColumn(
      SALT, pmod(xxhash64(monotonically_increasing_id()), lit(nSalts)))
    val replicated = small.withColumn(
      SALT, explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ SALT, joinType).drop(SALT)
  }

  /** The KB-sized big-side statistic [[autoJoin]] consumes: an MG-`k`
    * summary of the CONCATENATED join key under one constant group
    * (`_sj_g = 0`), built once by a statistics-maintenance pass — batch
    * here, or incrementally via [[graft.streaming.StreamingMg]]'s
    * attach + [[Mg.merge]] — and then read by every join that touches
    * the table. Key components are INJECTIVELY encoded (length-prefixed
    * `v<len>|<value>`, null → `n` — the Experiment.poissonBootstrap seed
    * encoding, round-15 advice): distinct composite keys can never
    * collide to one MG item (concat_ws would drop nulls and merge
    * ('a',null)/(null,'a'), inflating `topKeyShareLb` past the true
    * top-key share and breaking the documented lower-bound invariant).
    *
    * STATE-FORMAT BREAK (round 16): summaries persisted under the old
    * ``-joined encoding are NOT mergeable with this one — the same
    * logical key encodes to two distinct MG items, splitting its weight
    * and deflating `topKeyShareLb` (bound stays valid, results stay
    * correct; only the salted-route trigger degrades). Rebuild persisted
    * / streaming MG state rather than Mg.merge-ing across encodings. */
  /** The injective composite-key encoding every MG key summary uses
    * (length-prefixed `v<len>|<value>`, null → `n`): distinct composite
    * keys can never collide to one MG item. Shared by [[keyFreqSummary]]
    * and [[graft.sources.GraftTable]]'s per-file summaries so persisted
    * and ad-hoc state stay mergeable. */
  def encodedKey(keys: Seq[String]): org.apache.spark.sql.Column =
    concat_ws(":", keys.map { c =>
      val s = col(c).cast("string")
      when(s.isNull, lit("n"))
        .otherwise(concat(lit("v"), length(s).cast("string"),
          lit("|"), s))
    }: _*)

  def keyFreqSummary(
      df: DataFrame, keys: Seq[String], k: Int = 64): DataFrame = {
    require(keys.nonEmpty, "keyFreqSummary: no key columns")
    Mg.summarize(
      // the constant group derives from data (pmod(length, 1)) so the
      // optimizer cannot strip it from the MG truncation's window spec
      // and trip the no-partition warning (the Kll.estimate precedent);
      // the window orders ≤ distinct-key rows, not the corpus
      df.withColumn("_sj_key", encodedKey(keys))
        .withColumn("_sj_g", pmod(length(col("_sj_key")), lit(1))),
      Seq("_sj_g"), "_sj_key", k)
  }

  /** The routing decision from statistics ALONE — reads two KB-sized
    * frames (an MG key summary ≤ k rows, a one-row small-side count) and
    * never scans a corpus; this is the q52/q85/q89 planner-statistics
    * family acting as an optimizer instead of a report. `smallRowCount`
    * is any one-row frame with a BIGINT `n` column — `Σ n_rows` of a
    * [[Layout.fileManifest]] / [[graft.streaming.StreamingManifest]] is
    * the zero-cost source on a managed table.
    *
    * Routes, in priority order:
    *  - `broadcast` — small side fits the declared row budget: hash join
    *    with no shuffle of the big side at all (dominates everything).
    *  - `salted`    — hottest big-side key ≥ `skewShare` (MG lower
    *    bound): one shuffle partition would hold ≥ that share of the
    *    corpus, the case AQE's byte-splitting cannot fix for
    *    SHUFFLE_HASH/aggregating consumers — spread it `nSalts` ways.
    *  - `shuffle`   — the default plain exchange-both-sides equi-join. */
  def decide(
      bigKeyMg: DataFrame, smallRowCount: DataFrame,
      broadcastRowLimit: Long, skewShare: Double,
      nSalts: Int): JoinDecision = {
    require(broadcastRowLimit >= 0, "broadcastRowLimit must be >= 0")
    require(skewShare > 0.0 && skewShare <= 1.0,
      s"skewShare must be in (0, 1], got $skewShare")
    require(nSalts >= 2, s"nSalts must be >= 2, got $nSalts")
    // one pass over the ≤ k+1-row state: the top weight comes from the
    // item rows, but the group total comes from the `_item IS NULL`
    // sentinel row — which exists precisely so that an all-ties input
    // whose truncation legitimately empties the item set still reports
    // its true n (round-15 advice: estimate()'s item rows alone would
    // yield bigRows=0 on a non-empty corpus — misleading metadata)
    val est = bigKeyMg
      .agg(max(when(col("_item").isNotNull, col("_w"))).as("_top"),
        max(when(col("_item").isNull, col("_n"))).as("_n"))
      .collect()(0)
    val bigRows = if (est.isNullAt(1)) 0L else est.getLong(1)
    val top = if (est.isNullAt(0)) 0L else est.getLong(0)
    val smallRows = smallRowCount.select(col("n").cast("long"))
      .collect()(0).getLong(0)
    val share = if (bigRows == 0L) 0.0 else top.toDouble / bigRows
    val route =
      if (smallRows <= broadcastRowLimit) "broadcast"
      else if (share >= skewShare) "salted"
      else "shuffle"
    JoinDecision(route, smallRows, bigRows, share,
      if (route == "salted") nSalts else 1)
  }

  /** Statistics-routed equi-join (round-14 verdict task 2): [[decide]]
    * picks the route, the matching physical form runs, and the decision
    * rides along as metadata. All three routes are RESULT-EQUIVALENT to
    * `big.join(small, keys, joinType)` (spec-pinned — broadcast is a
    * planner hint, salting is the [[saltedJoin]] identity); the router
    * only chooses the shuffle geometry. */
  def autoJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      bigKeyMg: DataFrame, smallRowCount: DataFrame,
      broadcastRowLimit: Long = 1000000L, skewShare: Double = 0.2,
      nSalts: Int = 16,
      joinType: String = "inner"): (DataFrame, JoinDecision) = {
    val d = decide(bigKeyMg, smallRowCount, broadcastRowLimit, skewShare,
      nSalts)
    val joined = d.route match {
      case "broadcast" => big.join(broadcast(small), keys, joinType)
      case "salted" => saltedJoin(big, small, keys, d.nSalts, joinType)
      case _ => big.join(small, keys, joinType)
    }
    (joined, d)
  }

  /** ZERO-PASS routing (round-16 verdict task 4): [[autoJoin]] where the
    * big side's MG key summary and the small side's row count both come
    * from the tables' persisted `_graft_manifest/` sidecars
    * ([[graft.sources.GraftTable.keyFreqSummary]] /
    * [[graft.sources.GraftTable.rowCount]]) — the decide phase reads
    * planner state ONLY (KB-sized sidecar parquet + a driver literal),
    * never either corpus. The big table must have been written/adopted
    * with an MG sidecar for exactly `keys`; both sides open through
    * [[graft.sources.Sources.graftTable]], so the routed join's scans
    * are ALSO manifest-pruned by any downstream filter. Note: both
    * opened frames carry their own `file_id` partition column — select
    * the output columns you need rather than `*` where the two sides'
    * file ids would collide. */
  def autoJoinFromManifest(
      spark: org.apache.spark.sql.SparkSession,
      bigDir: String, smallDir: String, keys: Seq[String],
      broadcastRowLimit: Long = 1000000L, skewShare: Double = 0.2,
      nSalts: Int = 16,
      joinType: String = "inner"): (DataFrame, JoinDecision) = {
    val bigMg = graft.sources.GraftTable.keyFreqSummary(spark, bigDir, keys)
    val smallN = spark.createDataFrame(
      Seq(Tuple1(graft.sources.GraftTable.rowCount(spark, smallDir))))
      .toDF("n")
    val big = graft.sources.Sources.graftTable(spark, bigDir)
    val small = graft.sources.Sources.graftTable(spark, smallDir)
    autoJoin(big, small, keys, bigMg, smallN, broadcastRowLimit,
      skewShare, nSalts, joinType)
  }
}
