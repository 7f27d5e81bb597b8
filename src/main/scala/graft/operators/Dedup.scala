package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for large-scale training-data pipelines: exact,
  * normalized-hash, MinHash+LSH, SimHash, and blocked n-gram Jaccard.
  *
  * Not present in the reference (its only dedup is last-offset-per-key
  * compaction, `…/dodetl/imtu/InMemoryTableUpdater.scala:129-171` — see
  * [[Compaction]]); these extend the engine per the north-star scope.
  *
  * Scale design: every candidate-generation step is an equi-join on a hash
  * bucket (LSH band, SimHash chunk, blocking key) — never an all-pairs
  * comparison — so the shuffle is proportional to candidate pairs, not n².
  * Verification filters compare the RAW score against the threshold and only
  * round in the final projection, mirroring the oracles' WHERE-on-raw /
  * SELECT-rounded structure (a raw score inside [t-5e-7, t) must fail on both
  * engines identically).
  */
/** A lazily-built pair frame plus OWNERSHIP of the intermediate frames the
  * builder persisted: materialize `result` (action), then [[close]] to
  * release the caches. The `*Managed` variants return this so a pipeline
  * running many dedups in one session controls exactly when each call's
  * caches release; the plain entry points use [[releaseOnFirstUse]], which
  * releases them automatically after the caller's first action. */
final case class ManagedPairs(result: DataFrame, cached: Seq[DataFrame]) {
  /** Unpersist the intermediates (blocking, so `getPersistentRDDs` is clean
    * on return). Actions on `result` after close recompute from source. */
  def close(): Unit = cached.foreach(_.unpersist(blocking = true))

  /** Self-releasing form — the plain (unmanaged) entry points' default: a
    * one-shot `QueryExecutionListener` unpersists the intermediates right
    * after the FIRST completed query execution that READ them (matched by
    * cache-entry identity, so unrelated queries don't trigger it) —
    * typically the caller's materializing action. A long-lived session
    * therefore cannot accumulate dedup caches (the round-4 advice).
    * Further actions on the frame recompute from source — correct, just
    * uncached; callers that materialize repeatedly should hold the
    * [[graft.operators.Dedup.minHashLshPairsManaged]] form and [[close]]
    * when done. */
  def releaseOnFirstUse(): DataFrame = {
    val spark = result.sparkSession
    val targets = cached
      .flatMap(c => ManagedPairs.cacheScans(c.queryExecution.executedPlan))
      .toSet
    if (targets.isEmpty) close() // defensive: nothing ended up cached
    else {
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
        private def maybeRelease(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
          if (ManagedPairs.cacheScans(qe.executedPlan).exists(targets.contains) &&
            done.compareAndSet(false, true)) {
            cached.foreach(_.unpersist(blocking = false))
            spark.listenerManager.unregister(this)
          }
        override def onSuccess(
            funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = maybeRelease(qe)
        override def onFailure(
            funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = maybeRelease(qe)
      }
      spark.listenerManager.register(listener)
    }
    result
  }
}

object ManagedPairs {
  /** The cache entries (by `CachedRDDBuilder` identity) a physical plan
    * scans — recursing through AQE wrappers (AdaptiveSparkPlanExec and the
    * materialized QueryStageExec leaves), whose inner plans are not
    * TreeNode children. */
  private def cacheScans(plan: org.apache.spark.sql.execution.SparkPlan): Seq[AnyRef] =
    plan.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq[AnyRef](s.relation.cacheBuilder)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        cacheScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        cacheScans(q.plan)
    }.flatten
}

object Dedup {

  /** Corpus-size gate for the candidate/attach join strategy shared by
    * [[minHashLshPairs]]/[[ngramJaccardPairs]]/[[embeddingNearDupPairs]].
    *
    * At or below this many documents, the whole per-doc payload frame
    * (hashed shingles / token hashes / vectors — roughly 0.25–4 KB per doc,
    * so ≤ ~64k docs ≈ ≤ ~256 MB) is explicitly `broadcast()` into the
    * candidate and attach joins. The candidate join's stream side then keeps
    * its uniform ingest partitioning — a hot block's pairs are emitted
    * across ALL stream tasks, not concentrated in one — so the per-pair
    * kernels pipeline in the same stage with NO repartition and no extra
    * exchanges (one stage end-to-end after the payload cache).
    *
    * Above it, payloads cannot broadcast: the block join shuffles by block
    * key, which DOES concentrate each block's n² pair emission in one task —
    * AQE cannot split skewed join OUTPUT, only input bytes — so the scale
    * discipline applies: emit narrow (id, id) rows, then attach payloads via
    * SHUFFLE_HASH joins whose id-key exchanges redistribute the pairs (each
    * doc's candidate count is bounded by the banding/blocking), and run the
    * kernels at full parallelism.
    *
    * This is the strategy decision AQE cannot make (it never sees output
    * explosion), made with the stats that predict it: corpus size AND the
    * measured in-memory payload bytes (from the cached relation's stats —
    * free once the cache is materialized). Both gates must pass: a 50k-doc
    * corpus of megabyte texts must NOT be force-broadcast just because its
    * doc count is small. */
  val defaultMaxBroadcastDocs: Long = 64 * 1024

  /** Byte cap for the direct (broadcast) strategy — measured against the
    * cached payload frame's stats, well under Spark's 8 GB broadcast limit
    * and sized for 1000-executor fan-out cost. */
  val defaultMaxBroadcastBytes: Long = 256L << 20

  /** The direct/narrow decision for a MATERIALIZED (persisted + counted)
    * payload frame: doc count within `maxDocs` AND the cached relation's
    * measured size within [[defaultMaxBroadcastBytes]]. */
  private def broadcastable(cached: DataFrame, nDocs: Long, maxDocs: Long): Boolean =
    nDocs <= maxDocs &&
      cached.queryExecution.optimizedPlan.stats.sizeInBytes <= defaultMaxBroadcastBytes

  /** Exact full-row dedup — a hash aggregation over all columns. */
  def exact(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Whitespace-collapse + lowercase normalization. */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Group documents by md5 of normalized text; emit one row per distinct
    * normalized text with the canonical (minimum) id and duplicate count. */
  def byNormalizedText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(normalizeText(col(textCol))).as("text_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("canonical_id"))

  /** Cross-source duplicate-overlap matrix: for every unordered source
    * pair, how many normalized-text hashes appear in BOTH sources, and the
    * Jaccard of the two sources' distinct-hash sets — the crawl-slice
    * diagnostic for "which feeds are re-crawling each other" (run it before
    * deciding which source to drop or down-weight).
    *
    * Plan: one distinct over `(source, hash)` (shuffle ∝ distinct pairs,
    * combiner-absorbed), a hash-keyed self-join whose per-hash output is
    * bounded by sources² (sources are few by construction — the join cannot
    * explode the way a doc-pair join can), and a sources²-sized pair frame
    * carrying the set sizes. Pairs with ZERO overlap are present (a
    * monitoring matrix with silently missing cells reads as "no overlap"
    * for the wrong reason). Output:
    * `(source_a, source_b, n_shared, jaccard)`, `source_a < source_b`. */
  def sourceOverlap(df: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val h = df.select(
        col(srcCol).as("_src"), md5(normalizeText(col(textCol))).as("_h"))
      .distinct()
    val sizes = h.groupBy("_src").agg(count(lit(1)).as("_n"))
    val inter = h.as("a")
      .join(h.as("b"), col("a._h") === col("b._h") && col("a._src") < col("b._src"))
      .groupBy(col("a._src").as("source_a"), col("b._src").as("source_b"))
      .agg(count(lit(1)).as("_shared"))
    val pairs = sizes.as("x")
      .join(sizes.as("y"), col("x._src") < col("y._src"))
      .select(
        col("x._src").as("source_a"), col("y._src").as("source_b"),
        col("x._n").as("_na"), col("y._n").as("_nb"))
    pairs.join(inter, Seq("source_a", "source_b"), "left")
      .select(
        col("source_a"), col("source_b"),
        coalesce(col("_shared"), lit(0L)).as("n_shared"),
        round(
          coalesce(col("_shared"), lit(0L))
            / (col("_na") + col("_nb") - coalesce(col("_shared"), lit(0L))),
          6).as("jaccard"))
  }

  /** Distinct character k-gram shingles of the normalized text. `let`-bound
    * so the regex normalization runs once per row, not once per shingle. */
  def charShingles(c: Column, k: Int): Column =
    graft.functions.ArrayKernels.charShingles(normalizeText(c), k)

  /** Shingle set hashed to longs (sorted distinct) — every downstream
    * MinHash/Jaccard step operates on these 8-byte values instead of carrying
    * the raw k-char strings through the shuffles (the round-1 profile showed
    * the string arrays dominating d02's cost). Jaccard on the hashed sets
    * equals Jaccard on the string sets up to 2^-64 collision odds. Native
    * kernel ([[graft.functions.ShingleHashes]]): one primitive pass per doc. */
  def hashedShingles(c: Column, k: Int): Column =
    graft.functions.ArrayKernels.shingleHashes(normalizeText(c), k)

  /** MinHash signature from pre-hashed shingles: one fused primitive pass
    * ([[graft.functions.MinHashSig]]) instead of `numHashes` interpreted
    * `transform`s. */
  def minHashSignature(shingleHashes: Column, numHashes: Int): Column =
    graft.functions.ArrayKernels.minHashSig(shingleHashes, numHashes)

  /** LSH band keys: hash `rows`-sized slices of the signature. Shared
    * with the soak/profiling tools (private[graft]) so their candidate
    * counters can never desynchronize from the production banding. */
  private[graft] def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(lit(b), slice(sig, b * rows + 1, rows))): _*)

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * shingle → hash-to-long → minhash → band → bucket-equi-join → verify.
    * Returns `(a_id, b_id, jaccard)` for candidate pairs whose exact
    * hashed-shingle-set Jaccard is ≥ `threshold`. Band-bucket join keys are
    * `(band_index, band_hash)`, so candidates shuffle by bucket; the
    * verification join pulls shingle-hash sets only for surviving candidates.
    *
    * Output is PROBABILISTICALLY complete, not guaranteed-exact: a true pair
    * can be missed by (a) LSH banding — caught with p = 1-(1-j^rows)^bands,
    * ≈ 0.9999 at j = 0.5 for the default 32 bands × 2 rows — and (b) the 4σ
    * signature-agreement pre-filter (≈ 3e-5 per pair). Every EMITTED pair's
    * Jaccard is exact. On the driver testdata the output matches the exact
    * all-pairs DuckDB oracle.
    *
    * The hashed-shingle and signature frames are persisted (each feeds the
    * banding branch and both sides of a verification join, and Spark does not
    * share common subplans across join branches). The plain entry point
    * releases them automatically after the caller's first action
    * ([[ManagedPairs.releaseOnFirstUse]]); use [[minHashLshPairsManaged]] to
    * control the release point when materializing repeatedly.
    */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.5,
      maxBroadcastDocs: Long = defaultMaxBroadcastDocs,
      uniformPairRepartition: Boolean = false,
      stagedAttach: Boolean = false): DataFrame =
    minHashLshPairsManaged(
      df, idCol, textCol, shingleK, numHashes, bands, threshold,
      maxBroadcastDocs, uniformPairRepartition,
      stagedAttach).releaseOnFirstUse()

  /** [[minHashLshPairs]] with cache ownership — see [[ManagedPairs]].
    *
    * `stagedAttach` is the SCRATCH-BOUND regime's knob (round-15 verdict
    * task 7): the default single-stage shape exchanges the candidate
    * stream with verification payloads attached (~0.8 KB/row — measured
    * as THE scratch consumer once the stream outgrows the page cache,
    * SCALE.md addendum 2; an intermediate distinct-first variant still
    * ENOSPC'd at 20x). The staged shape never exchanges the candidate
    * stream at all: BYTE-FOLDED signatures (64 B/doc) ride the banded
    * frames through the doc-sized (band, bucket) exchange, the 4-sigma
    * agreement filter runs fused inside the band join's emission
    * (byte-fold agreement over-counts with p = 1/256 per lane, so a
    * SUPERSET passes — conservative-keep), and only the near-real
    * survivors are distinct'd and shingle-verified. Same emitted pair
    * set (spec-pinned in both broadcast and shuffle_hash modes); the
    * trade is per-pair compute inside the band join (a hot bucket
    * serializes its agreement checks) for candidate-exchange scratch
    * that no longer exists — measured in SCALE.md's 30x leg.
    * `uniformPairRepartition` has no effect in staged mode: there is no
    * candidate-stream exchange left for it to balance. */
  def minHashLshPairsManaged(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.5,
      maxBroadcastDocs: Long = defaultMaxBroadcastDocs,
      uniformPairRepartition: Boolean = false,
      stagedAttach: Boolean = false): ManagedPairs = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    // Repartition at ingest: a small-file source (one parquet file ⇒ one
    // partition) would otherwise serialize shingle hashing, signature
    // computation, AND the band join's row emission on a single task — the
    // per-doc kernels and the join probe inherit this partitioning.
    val par0 = df.sparkSession.sparkContext.defaultParallelism
    val base = df.repartition(par0)
      .select(
        col(idCol).as("_id"),
        hashedShingles(col(textCol), shingleK).as("_hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sigs = base.select(
        col("_id"), minHashSignature(col("_hs"), numHashes).as("_sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Materialize the caches once (both join branches then read cached
    // blocks) and learn the corpus size — the [[defaultMaxBroadcastDocs]]
    // strategy gate.
    val nDocs = sigs.count()
    val direct = broadcastable(base, nDocs, maxBroadcastDocs)
    // Narrow-mode attaches hint SHUFFLE_HASH: the build side is the per-doc
    // payload frame (bounded per partition by the shuffle partition count);
    // sort-merge would instead SORT the candidate-pair stream — hundreds of
    // millions of rows — once per attach (measured 23× the CPU of the hash
    // attach at 4× replication).
    def attach(f: DataFrame): DataFrame =
      if (direct) broadcast(f) else f.hint("shuffle_hash")
    val sigsK = sigs.select(
      col("_id"), col("_sig"), bandKeys(col("_sig"), bands, rows).as("_bks"))
    // The band-bucket self-join carries ONLY (id, band, bandHash). When the
    // join shuffles by bucket, hot band-hash buckets expand n² pairs in ONE
    // join task (AQE cannot see output explosion, only input bytes), so any
    // non-trivial per-pair compute placed inside this join would serialize
    // on the hot task. Keeping the join rows narrow makes the hot task pure
    // row emission. In direct (broadcast) mode the build side is broadcast,
    // the stream side keeps its uniform ingest partitioning, and the hot-task
    // problem does not arise at all.
    val banded = sigsK.select(
      col("_id"),
      posexplode(col("_bks")).as(Seq("_band", "_bh")))
    val a = banded.select(col("_id").as("a_id"), col("_band"), col("_bh"))
    val b = banded.select(
      col("_id").as("b_id"), col("_band").as("_band2"), col("_bh").as("_bh2"))
    // band join build side: broadcast in direct mode; in narrow mode leave
    // it UNHINTED — bucket keys are the skewed ones, and AQE's skew-join
    // splitting works on the sort-merge plan it picks there
    val candRaw = a.join(
        if (direct) broadcast(b) else b,
        col("_band") === col("_band2") && col("_bh") === col("_bh2") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("_band"))
    // Narrow mode: the SHUFFLE_HASH attach joins below each exchange the
    // candidate stream by a single id key, and banding bounds how many
    // candidates any one document contributes, so those exchanges stay
    // balanced on their own (measured max/med ≤ 1.05 at 16× candidate
    // growth) — an additional up-front repartition by (a_id, b_id) would be
    // a third full exchange of the largest stream in the pipeline whose
    // uniform distribution the very next join discards. It remains
    // available (`uniformPairRepartition`) as a backstop for corpora where
    // one id dominates the candidate set beyond what banding bounds.
    // Direct mode: candidates are already uniform over the stream tasks —
    // the attaches broadcast and the whole path below is ONE pipelined
    // stage. Per-pair work either way:
    //  * first-match dedup: a pair matching in k bands appears k times; keep
    //    only the row whose _band is the FIRST agreeing band — exact dedup
    //    with a 32-element compare instead of a 16M-row shuffle distinct.
    //  * signature-agreement pre-filter: the fraction of agreeing minhash
    //    positions estimates Jaccard with σ = sqrt(j(1-j)/H); rejecting
    //    candidates more than 4σ below the threshold (p ≈ 3e-5 of dropping a
    //    true pair) keeps the exact-verification join to near-real pairs
    //    (profiled at sf0.1: 16M band matches → 2.9M after both filters →
    //    256 real).
    val par = df.sparkSession.sparkContext.defaultParallelism
    val sigCut =
      math.max(0.0, threshold - 4.0 * math.sqrt(threshold * (1 - threshold) / numHashes))
    val firstMatch =
      graft.functions.ArrayKernels.firstEqualIndex(col("_bks_a"), col("_bks_b"))
    val agree =
      graft.functions.ArrayKernels.agreeCount(col("_sig_a"), col("_sig_b"))
    // Single-stage attach (default): both payloads in one pair of joins —
    // fastest while the exchanged stream fits the page cache; the
    // `stagedAttach` branch below is the scratch-bound alternative (see
    // the method doc). The shuffle_hash-hinted attaches exchange the
    // candidate stream by the single id key — uniform unless one document
    // dominates the candidate set, which the banding bounds.
    val cand0 =
      if (!direct && uniformPairRepartition)
        candRaw.repartition(par, col("a_id"), col("b_id"))
      else candRaw
    val cand =
      if (stagedAttach) {
        // staged (the scratch-bound shape): the candidate stream is NEVER
        // exchanged. Byte-folded signatures (64 B/doc) ride the banded
        // frames through the (band, bucket) exchange — doc-sized, not
        // candidate-sized — so the agreement filter runs FUSED inside the
        // band join's emission, and only its survivors (near-real pairs)
        // reach a distinct. Exactness: equal minhash longs have equal
        // byte folds, so folded agreement can only OVER-count (p = 1/256
        // per position) — a superset passes, and the exact-Jaccard
        // verification below emits the identical final pair set
        // (spec-pinned against the single-stage shape). Trade, stated in
        // the method doc: per-pair compute sits inside the band join, so
        // a hot bucket serializes its n^2 agreement checks on one task —
        // the exact cost the single-stage shape avoids — in exchange for
        // eliminating the candidate-stream exchanges that bind scratch.
        // second, WIDER minhash family for the fused filter only: 4x the
        // lanes quarter the estimator sigma, so the same 4-sigma recall
        // guarantee cuts at j-hat >= t - 4*sqrt(t(1-t)/256) (0.375 at
        // t = 0.5) instead of 0.25 — measured ~50x fewer pairs reach the
        // set-payload verify on template-heavy corpora, which is where
        // the scratch actually went (the j in [0.25, t) population, not
        // the k-fold duplicates)
        val filterHashes = 256
        val cut2 = math.max(0.0, threshold -
          4.0 * math.sqrt(threshold * (1 - threshold) / filterHashes))
        val sg8 = (sc: Column) => transform(sc,
          x => (x.bitwiseAND(lit(255L)) - 128).cast("byte"))
        val sigsW = base.select(col("_id"),
          sg8(minHashSignature(col("_hs"), filterHashes)).as("_sgw"))
        val bandedS = sigsK.join(sigsW, Seq("_id")).select(
          col("_id"), sg8(col("_sig")).as("_sg8"), col("_sgw"),
          posexplode(col("_bks")).as(Seq("_band", "_bh")))
        val aS = bandedS.select(col("_id").as("a_id"),
          col("_sg8").as("_sg8_a"), col("_sgw").as("_sgw_a"),
          col("_band"), col("_bh"))
        val bS = bandedS.select(col("_id").as("b_id"),
          col("_sg8").as("_sg8_b"), col("_sgw").as("_sgw_b"),
          col("_band").as("_band2"), col("_bh").as("_bh2"))
        def agreeOf(a: Column, b: Column) =
          size(filter(zip_with(a, b, (x, y) => x === y), hit => hit))
        // never broadcast here, even in direct mode: the banded frame
        // carries ~340 B of folded lanes per row (32 rows/doc) — ~30-50x
        // the bytes the broadcastable() gate was calibrated for, so a
        // corpus just under the gate could blow the broadcast limit; the
        // shuffle the plain join pays is doc-sized either way
        aS.join(bS,
            col("_band") === col("_band2") && col("_bh") === col("_bh2") &&
              col("a_id") < col("b_id"))
          // cheap 64-lane cut first (drops the bulk), wide 256-lane cut
          // second (drops the j in [0.25, 0.375) template band)
          .filter(agreeOf(col("_sg8_a"), col("_sg8_b")) >=
            lit(sigCut * numHashes))
          .filter(agreeOf(col("_sgw_a"), col("_sgw_b")) >=
            lit(cut2 * filterHashes))
          .select("a_id", "b_id").distinct()
      }
      else cand0
        .join(attach(sigsK.select(
          col("_id").as("a_id"), col("_sig").as("_sig_a"), col("_bks").as("_bks_a"))),
          Seq("a_id"))
        .join(attach(sigsK.select(
          col("_id").as("b_id"), col("_sig").as("_sig_b"), col("_bks").as("_bks_b"))),
          Seq("b_id"))
        .filter(firstMatch === col("_band") + 1)
        .filter(agree >= lit(sigCut * numHashes))
        .select("a_id", "b_id")
    val withSets = cand
      .join(attach(base.select(col("_id").as("a_id"), col("_hs").as("_hs_a"))), Seq("a_id"))
      .join(attach(base.select(col("_id").as("b_id"), col("_hs").as("_hs_b"))), Seq("b_id"))
    // Thresholded merge ([[graft.functions.SortedJaccardGeq]]): exact Jaccard
    // for pairs that can reach the threshold, early-exit -1 for the rest —
    // the emitted set is identical to the full-merge formulation (and the
    // DuckDB oracle), the bail only skips provably-failing suffixes.
    val jacc = graft.functions.ArrayKernels
      .sortedJaccardGeq(col("_hs_a"), col("_hs_b"), threshold)
    val out = withSets
      .filter(jacc >= threshold)
      .select(col("a_id"), col("b_id"), round(jacc, 6).as("jaccard"))
    ManagedPairs(out, Seq(base, sigs))
  }

  /** 56-bit token hash both engines can compute identically: the top 14 hex
    * chars of md5 parsed base-16 (DuckDB mirror:
    * `('0x' || substr(md5(t), 1, 14))::UBIGINT`). 56 bits so the value fits a
    * signed long on both sides and splits evenly into 8 blocking chunks. */
  def hash56(c: Column): Column =
    graft.functions.ArrayKernels.hash56(c)

  /** 56-bit SimHash over whitespace tokens: per-bit majority vote of token
    * hash56 values, folded into one long. Pure Catalyst higher-order
    * functions (no UDF); md5-based so the DuckDB oracle reproduces it
    * bit-for-bit. (At larger corpora swap hash56 for xxhash64 + 64 bits —
    * same shape, no oracle.) */
  def withSimHash(df: DataFrame, textCol: String, out: String = "simhash"): DataFrame =
    df.withColumn(
      out,
      graft.functions.ArrayKernels.simHash56(
        split(normalizeText(col(textCol)), " ")))

  /** SimHash near-dup pairs: block on exact-matching 7-bit chunks — a pair
    * within Hamming distance 7 of a 56-bit hash must agree on at least one of
    * the eight chunks (pigeonhole), so candidate recall is GUARANTEED for
    * `maxHamming` ≤ 7 and the output is exactly the all-pairs result.
    *
    * A pair agreeing on k chunks is produced by k of the eight chunk joins;
    * instead of a full shuffle `distinct`, each duplicate is eliminated AT
    * EMISSION by keeping only the row whose chunk index is the FIRST index
    * where the two hashes agree — pure bit arithmetic on the xor of the two
    * hashes that are already in the join output (no payload, no extra
    * shuffle). */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 7): DataFrame = {
    require(maxHamming <= 7, "8x7-bit chunk blocking only guarantees recall to Hamming 7")
    val hashed = withSimHash(df.select(col(idCol).as("_id"), col(textCol)), textCol)
    val chunks = hashed.select(
      col("_id"), col("simhash"),
      posexplode(array((0 until 8).map(i =>
        shiftright(col("simhash"), 7 * i).bitwiseAND(lit(0x7FL))): _*))
        .as(Seq("_chunk_idx", "_chunk")))
    val a = chunks.select(
      col("_id").as("a_id"), col("simhash").as("a_hash"),
      col("_chunk_idx"), col("_chunk"))
    val b = chunks.select(
      col("_id").as("b_id"), col("simhash").as("b_hash"),
      col("_chunk_idx").as("_ci2"), col("_chunk").as("_c2"))
    // Chunk i agrees iff bits [7i, 7i+7) of a_hash^b_hash are all zero; the
    // first agreeing index is a constant-size when-chain over the xor value.
    val xorHash = col("a_hash").bitwiseXOR(col("b_hash"))
    val firstAgree = (7 to 0 by -1).foldLeft(lit(-1)) { (acc, i) =>
      when(shiftright(xorHash, 7 * i).bitwiseAND(lit(0x7FL)) === 0, lit(i))
        .otherwise(acc)
    }
    a.join(
        b,
        col("_chunk_idx") === col("_ci2") && col("_chunk") === col("_c2") &&
          col("a_id") < col("b_id"))
      .filter(col("_chunk_idx") === firstAgree)
      .select(
        col("a_id"), col("b_id"),
        bit_count(xorHash).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Blocked word-set Jaccard: candidate pairs come only from the same
    * `(blocking cols)` group (the classic blocking trick — at 100 TB the
    * block key bounds the quadratic blow-up), Jaccard computed exactly on
    * distinct lowercase tokens.
    *
    * Same skew discipline as [[minHashLshPairs]], gated by
    * [[defaultMaxBroadcastDocs]]: on a broadcastable corpus the block join's
    * build side and the payload attaches broadcast, candidates stay uniform
    * over the stream tasks, and the merge-intersect kernel pipelines with no
    * repartition. Beyond broadcast size, the block self-join carries only
    * `(id, token-count, block key)` — a hot block expands its pairs as pure
    * row emission; token-hash payloads attach through SHUFFLE_HASH joins
    * whose id-key exchanges redistribute the pairs before the kernel runs
    * (AQE cannot split a skewed join's output, only its input bytes; an
    * extra up-front pair-id repartition is opt-in). The token-count carried
    * through the join powers a lossless length-ratio prune: jaccard ≥ t
    * implies min(|A|,|B|) ≥ t·max(|A|,|B|).
    *
    * `base` is persisted (it feeds the block join and both payload-attach
    * sides); the plain entry point releases it after the caller's first
    * action ([[ManagedPairs.releaseOnFirstUse]]) — use
    * [[ngramJaccardPairsManaged]] to control the release point. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockingCols: Seq[Column], threshold: Double,
      maxBroadcastDocs: Long = defaultMaxBroadcastDocs,
      uniformPairRepartition: Boolean = false): DataFrame =
    ngramJaccardPairsManaged(
      df, idCol, textCol, blockingCols, threshold, maxBroadcastDocs,
      uniformPairRepartition).releaseOnFirstUse()

  /** [[ngramJaccardPairs]] with cache ownership — see [[ManagedPairs]]. */
  def ngramJaccardPairsManaged(
      df: DataFrame, idCol: String, textCol: String,
      blockingCols: Seq[Column], threshold: Double,
      maxBroadcastDocs: Long = defaultMaxBroadcastDocs,
      uniformPairRepartition: Boolean = false): ManagedPairs = {
    // Token SETS are sorted-distinct 64-bit hashes: set Jaccard is
    // hash-invariant, the arrays are 8-byte-element primitives (vs UTF8
    // strings), and the merge-scan intersect kernel replaces per-pair
    // `array_intersect` hash tables.
    val toks = graft.functions.ArrayKernels
      .sortedTokenHashes(split(lower(col(textCol)), "\\s+"))
    val par = df.sparkSession.sparkContext.defaultParallelism
    val base = df.repartition(par)
      .select(
        (col(idCol).as("_id") +: toks.as("_toks") +:
          blockingCols.zipWithIndex.map { case (c, i) => c.as(s"_blk$i") }): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = base.count() // materialize the cache + the strategy gate
    val direct = broadcastable(base, nDocs, maxBroadcastDocs)
    val blkKeys = blockingCols.indices.map(i => s"_blk$i")
    val lengthPrune =
      least(col("_na"), col("_nb")) >= lit(threshold) * greatest(col("_na"), col("_nb"))
    val cand = if (direct) {
      // direct mode: token payloads ride the block join itself — one
      // broadcast hash join, zero attach probes, kernel pipelined
      val aF = base.select(
        (col("_id").as("a_id") +: size(col("_toks")).as("_na") +:
          col("_toks").as("_ta") +: blkKeys.map(col)): _*)
      val bF = base.select(
        (col("_id").as("b_id") +: size(col("_toks")).as("_nb") +:
          col("_toks").as("_tb") +: blkKeys.map(col)): _*)
      aF.join(broadcast(bF), blkKeys)
        .filter(col("a_id") < col("b_id"))
        .filter(lengthPrune)
    } else {
      val narrow = base.select(
        (col("_id") +: size(col("_toks")).as("_n") +: blkKeys.map(col)): _*)
      val a = narrow.select(
        (col("_id").as("a_id") +: col("_n").as("_na") +: blkKeys.map(col)): _*)
      val b = narrow.select(
        (col("_id").as("b_id") +: col("_n").as("_nb") +: blkKeys.map(col)): _*)
      // shuffle_hash attach: build the per-doc payload map, never sort the
      // candidate-pair stream; the attaches themselves exchange by id (see
      // [[minHashLshPairsManaged]] on why an up-front pair repartition is
      // off by default)
      val raw = a.join(b, blkKeys)
        .filter(col("a_id") < col("b_id"))
        .filter(lengthPrune)
        .select("a_id", "b_id")
      (if (uniformPairRepartition) raw.repartition(par, col("a_id"), col("b_id"))
       else raw)
        .join(base.select(col("_id").as("a_id"), col("_toks").as("_ta"))
          .hint("shuffle_hash"), Seq("a_id"))
        .join(base.select(col("_id").as("b_id"), col("_toks").as("_tb"))
          .hint("shuffle_hash"), Seq("b_id"))
    }
    val jacc = graft.functions.ArrayKernels
      .sortedJaccardGeq(col("_ta"), col("_tb"), threshold)
    val out = cand
      .filter(jacc >= threshold)
      .select(col("a_id"), col("b_id"), round(jacc, 6).as("jacc"))
    ManagedPairs(out, Seq(base))
  }

  /** Embedding-cosine near-duplicates, blocked on a coarse bucket column
    * (IVF-style: compare only within the same coarse cell).
    *
    * Skew discipline as in [[minHashLshPairs]]/[[ngramJaccardPairs]], gated
    * by [[defaultMaxBroadcastDocs]]: broadcastable corpora pipeline the cell
    * join + [[graft.functions.VecCosine]] in one stage; beyond broadcast
    * size the cell self-join emits narrow `(a_id, b_id)` rows only, vectors
    * attach through SHUFFLE_HASH joins whose id-key exchanges redistribute
    * the pairs before the kernel runs, so one hot cell cannot serialize the
    * per-pair compute on one task.
    * `base` is persisted and auto-released after the first action (see
    * [[ngramJaccardPairs]]); [[embeddingNearDupPairsManaged]] owns it. */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, blockCol: String,
      threshold: Double,
      maxBroadcastDocs: Long = defaultMaxBroadcastDocs,
      uniformPairRepartition: Boolean = false): DataFrame =
    embeddingNearDupPairsManaged(
      df, idCol, vecCol, blockCol, threshold, maxBroadcastDocs,
      uniformPairRepartition).releaseOnFirstUse()

  /** [[embeddingNearDupPairs]] with cache ownership — see [[ManagedPairs]]. */
  def embeddingNearDupPairsManaged(
      df: DataFrame, idCol: String, vecCol: String, blockCol: String,
      threshold: Double,
      maxBroadcastDocs: Long = defaultMaxBroadcastDocs,
      uniformPairRepartition: Boolean = false): ManagedPairs = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val base = df.repartition(par)
      .select(col(idCol).as("_id"), col(vecCol).as("_v"), col(blockCol).as("_blk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = base.count() // materialize the cache + the strategy gate
    val direct = broadcastable(base, nDocs, maxBroadcastDocs)
    // see [[minHashLshPairsManaged]] on the narrow-mode shuffle_hash hint
    def attach(f: DataFrame): DataFrame =
      if (direct) broadcast(f) else f.hint("shuffle_hash")
    val narrow = base.select(col("_id"), col("_blk"))
    // cell join build side: broadcast in direct mode, unhinted in narrow
    // (cell keys are the skewed ones — leave them to AQE's skew splitting)
    val bCell = narrow.select(col("_id").as("b_id"), col("_blk"))
    val candRaw = narrow.select(col("_id").as("a_id"), col("_blk"))
      .join(if (direct) broadcast(bCell) else bCell, Seq("_blk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
    val cand0 =
      if (!direct && uniformPairRepartition)
        candRaw.repartition(par, col("a_id"), col("b_id"))
      else candRaw
    val cand = cand0
      .join(attach(base.select(col("_id").as("a_id"), col("_v").as("_va"))), Seq("a_id"))
      .join(attach(base.select(col("_id").as("b_id"), col("_v").as("_vb"))), Seq("b_id"))
    val sim = Similarity.cosine(col("_va"), col("_vb"))
    val out = cand
      .filter(sim >= threshold)
      .select(col("a_id"), col("b_id"), round(sim, 6).as("sim"))
    ManagedPairs(out, Seq(base))
  }

  /** Connected components over a near-dup pair frame — the cluster-assignment
    * step that turns pairwise matches into dedup groups (keep one canonical
    * doc per cluster). Returns `(idCol, cluster_id)` for EVERY node in
    * `nodes`; singletons map to themselves; `cluster_id` = the minimum id in
    * the component.
    *
    * Algorithm: iterative min-label propagation — each round every node
    * takes `min(own label, min(neighbor labels))`; converges in O(graph
    * diameter) rounds. Each round is two shuffles (edge×label join + min
    * agg), and the label frame is `localCheckpoint`ed per round so lineage
    * stays one round deep (a 20-round loop would otherwise stack 40 joins
    * into one plan). Dedup components are shallow (near-dup clusters are
    * cliques or near-cliques from the same candidate buckets), so rounds
    * ≈ 2-3 in practice; the `maxIter` guard stops adversarial chains.
    * 100 TB: per-round shuffle ∝ |edges| — for graphs where diameter is the
    * bottleneck, swap in large-star/small-star (Kiveris et al., "Connected
    * Components in MapReduce"); the interface stays the same. */
  def connectedComponents(
      nodes: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val fwd = pairs.select(col(aCol).as("_src"), col(bCol).as("_dst"))
    val edges = fwd
      .unionByName(fwd.select(col("_dst").as("_src"), col("_src").as("_dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    // each round's labels frame is localCheckpoint'ed (lineage stays one
    // round deep) and EXPLICITLY released once superseded — checkpointed
    // RDD blocks are not freed by Dataset.unpersist and would otherwise
    // pin one full label-set per round until GC
    def releaseLabels(df: DataFrame): Unit = releaseCheckpointed(df)
    var labels = nodes
      .select(col(idCol).as("_id"), col(idCol).as("_label"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges
        .join(labels, edges("_dst") === labels("_id"))
        .groupBy(col("_src"))
        .agg(min(col("_label")).as("_nmin"))
      // the change flag rides the SAME projection (old and new label are
      // both in scope here) — a separate next-vs-labels join to count
      // changes would add a full extra shuffle per round
      val newLabel =
        least(labels("_label"), coalesce(col("_nmin"), labels("_label")))
      val next = labels
        .join(nbrMin, labels("_id") === nbrMin("_src"), "left")
        .select(
          labels("_id"), newLabel.as("_label"),
          (newLabel < labels("_label")).as("_chg"))
        .localCheckpoint(true)
      changed = next.filter(col("_chg")).count()
      releaseLabels(labels)
      labels = next.drop("_chg")
      iter += 1
    }
    edges.unpersist(blocking = false)
    // an unconverged exit would silently return WRONG cluster ids (far ends
    // of a >maxIter-diameter chain keep non-minimal labels) — fail instead
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — the pair graph has diameter > " +
        s"$maxIter; raise maxIter or use a star-contraction variant")
    labels.select(col("_id").as(idCol), col("_label").as("cluster_id"))
  }

  /** [[connectedComponents]] with a BOUNDED driver fast path for graphs
    * that are small BY CONSTRUCTION — the streaming clustering attach's
    * per-trigger mini graph (batch ids + matched cluster reps: ∝ batch,
    * never the corpus). The distributed fold's per-round
    * persist/localCheckpoint overhead is the right price on a corpus graph
    * and pure waste on a thousand-node one; below the bound this collects
    * the (long-typed) graph and runs min-rooted union-find — identical
    * min-id labels, equality spec-pinned — and above it, or for non-long
    * ids, delegates unchanged. The collect is size-capped by the counts it
    * just took (the 64-row-sample discipline: bounded by design, not by
    * hope). */
  def connectedComponentsBounded(
      nodes: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxDriverEdges: Long = 500000L): DataFrame = {
    // the fast path must be SEMANTICALLY invisible, so it only engages
    // when every collected value really is a long (pair columns included —
    // an int-typed pair frame would pass a nodes-only check and then CCE
    // in getLong, while the distributed join would have cast it silently)
    val allLong = Seq(
      nodes.schema(idCol).dataType,
      pairs.schema(aCol).dataType, pairs.schema(bCol).dataType)
      .forall(_ == org.apache.spark.sql.types.LongType)
    if (!allLong)
      return connectedComponents(nodes, idCol, pairs, aCol, bCol)
    val n = nodes.select(col(idCol)).persist(StorageLevel.MEMORY_AND_DISK)
    val p = pairs.select(col(aCol), col(bCol)).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (n.count() + p.count() > maxDriverEdges)
        connectedComponents(n, idCol, p, aCol, bCol)
      else {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        // min-rooted union: the smaller root absorbs — the invariant that
        // makes the final root per set its minimum member id
        def union(a: Long, b: Long): Unit = {
          val (ra, rb) = (find(a), find(b))
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        val ids = n.collect().map(_.getLong(0))
        val known = ids.toSet
        ids.foreach(i => parent.getOrElseUpdate(i, i))
        // a pair endpoint absent from `nodes` relays nothing — the
        // distributed fold's label join drops such edges, and label-parity
        // between the two paths is the operator's contract
        p.collect().foreach { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          if (known(a) && known(b)) union(a, b)
        }
        val spark = nodes.sparkSession
        import spark.implicits._
        ids.toSeq.map(i => (i, find(i))).toDF(idCol, "cluster_id")
      }
    } finally { n.unpersist(blocking = false); p.unpersist(blocking = false) }
  }

  /** Release the `localCheckpoint` RDD blocks backing a superseded frame —
    * checkpointed blocks are not freed by `Dataset.unpersist` and would
    * otherwise pin one full frame per loop round until GC. Safe only when
    * nothing live recomputes THROUGH the released frame (every round's
    * output here is itself checkpointed, i.e. self-rooted). */
  private def releaseCheckpointed(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Connected components via alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — same contract as [[connectedComponents]], but
    * converges in O(log² n) rounds INDEPENDENT of graph diameter, where
    * min-label propagation needs O(diameter) rounds. Use this when dedup
    * graphs chain (each doc near-dups its neighbor — crawl snapshots,
    * versioned wiki dumps); propagation remains marginally cheaper per
    * round for the shallow near-clique graphs LSH usually emits.
    *
    * Per round: large-star points every node's larger neighbors at its
    * minimum reachable node, small-star re-points the smaller ones — each
    * phase is one grouped min + one equi-join + one distinct, all keyed
    * shuffles ∝ |edges|, no driver-side state. Rounds end when the edge-set
    * fingerprint (count + two independent hash sums) is stable; the final
    * star forest is then validated EXACTLY — every input pair must land in
    * one cluster — so a fingerprint collision cannot return a wrong answer.
    */
  def connectedComponentsAlternating(
      nodes: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    val origPairs = pairs
      .select(col(aCol).as("_pa"), col(bCol).as("_pb"))
      .filter(col("_pa") =!= col("_pb"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // canonical edge frame: (_hi > _lo), deduped
    var edges = origPairs
      .select(
        greatest(col("_pa"), col("_pb")).as("_hi"),
        least(col("_pa"), col("_pb")).as("_lo"))
      .distinct()
      .localCheckpoint(true)

    // bit_xor (not sum): overflow-free under ANSI mode at any edge count,
    // order-independent, and exact as a SET fingerprint because the edge
    // frame is deduped (duplicate cancellation can't occur)
    def fingerprint(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(
        count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(_hi, _lo))"), lit(0L)),
        coalesce(expr("bit_xor(xxhash64(_lo, 17, _hi))"), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    // large-star: per node u, m = min(N(u) ∪ {u}); connect each neighbor
    // v > u to m. Operates on the bidirectional view.
    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.select(col("_hi").as("_u"), col("_lo").as("_v"))
        .unionByName(e.select(col("_lo").as("_u"), col("_hi").as("_v")))
      val mins = bidir.groupBy("_u")
        .agg(least(min(col("_v")), col("_u")).as("_m"))
      bidir.filter(col("_v") > col("_u"))
        .join(mins, Seq("_u"))
        .select(col("_v").as("_hi"), col("_m").as("_lo"))
        .distinct()
    }

    // small-star: per node u over its SMALLER neighbors N< (canonical frame
    // is already (hi=u, lo∈N<)), m = min(N< ∪ {u}) = min(N<); connect u and
    // every other small neighbor to m.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("_hi").agg(min(col("_lo")).as("_m"))
      e.join(mins, Seq("_hi"))
        .filter(col("_lo") =!= col("_m"))
        .select(col("_lo").as("_hi"), col("_m").as("_lo"))
        .unionByName(mins.select(col("_hi"), col("_m").as("_lo")))
        .distinct()
    }

    var fp = fingerprint(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nfp = fingerprint(next)
      releaseCheckpointed(edges)
      edges = next
      converged = nfp == fp
      fp = nfp
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsAlternating did not converge in $maxIter rounds " +
        "— raise maxIter (expected O(log² n) rounds)")

    // star forest -> labels; nodes absent from any pair are singletons
    val labels = edges.groupBy(col("_hi").as("_id"))
      .agg(min(col("_lo")).as("_label"))
    val out = nodes.select(col(idCol).as("_id"))
      .join(labels, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("_label"), col("_id")).as("cluster_id"))
      .localCheckpoint(true)

    // exact soundness check (immune to fingerprint collisions): every input
    // pair must connect two nodes of the SAME cluster. Over-merging is
    // impossible by construction (stars only ever link nodes already in one
    // component), so same-cluster-per-edge == correct.
    val la = out.select(col(idCol).as("_pa"), col("cluster_id").as("_ca"))
    val lb = out.select(col(idCol).as("_pb"), col("cluster_id").as("_cb"))
    val crossing = origPairs.join(la, Seq("_pa")).join(lb, Seq("_pb"))
      .filter(col("_ca") =!= col("_cb")).count()
    releaseCheckpointed(edges)
    origPairs.unpersist(blocking = false)
    if (crossing > 0) throw new IllegalStateException(
      s"connectedComponentsAlternating under-merged: $crossing input pairs " +
        "cross clusters (fingerprint false-positive) — raise maxIter")
    out
  }

  /** Fixed-width token-chunk exact dedup — the practical, shuffle-bounded
    * approximation of exact-substring dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", which uses a suffix array
    * no distributed engine materializes at 100 TB). Text is tokenized
    * (whitespace), cut into consecutive `width`-token chunks, and every
    * repeat of a chunk already seen ANYWHERE in the corpus (first occurrence
    * = smallest `(id, position)`) is dropped; each document is rebuilt from
    * its surviving chunks in order.
    *
    * Returns `(idCol, clean_text, n_kept)` for EVERY input document
    * (fully-duplicated docs come back with `clean_text = ""`, `n_kept = 0`).
    *
    * Scale shape: chunk explode → per-chunk `min(struct(id, pos))` aggregate
    * (struct-min lowers to SortAggregate — still map-side partial, shuffle ∝
    * DISTINCT chunks, and the local sorts are external/spillable) →
    * equi-join back (shuffle ∝ chunk occurrences) → per-doc rebuild whose
    * `collect_list` is bounded by a single document's length. No windows, no
    * pairwise doc×doc anywhere; a chunk duplicated millions of times is one
    * hot GROUP KEY (combiner-absorbed), not a hot partition. */
  def chunkDedup(
      df: DataFrame, idCol: String, textCol: String,
      width: Int = 10): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val chunks = df.select(
      col(idCol).as("_id"),
      posexplode(graft.operators.let(split(lower(trim(col(textCol))), "\\s+")) {
        t =>
          transform(
            sequence(
              lit(0L),
              ceil(size(t).cast("double") / width).cast("long") - 1),
            i => concat_ws(" ", slice(t, (i * width + 1).cast("int"), lit(width))))
      }).as(Seq("pos", "chunk")))
    val keeper = chunks.groupBy("chunk")
      .agg(min(struct(col("_id"), col("pos"))).as("_keep"))
    val kept = chunks.join(keeper, Seq("chunk"))
      .filter(col("_keep._id") === col("_id") && col("_keep.pos") === col("pos"))
    val rebuilt = kept.groupBy("_id")
      .agg(
        concat_ws(
          " ",
          transform(
            array_sort(collect_list(struct(col("pos"), col("chunk")))),
            x => x.getField("chunk"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol).as("_id")).join(rebuilt, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster embeddings around per-seed centroids, then within each cluster
    * drop every vector that has a smaller-id neighbor with cosine ≥
    * `threshold`. Returns the KEPT set as `(idCol, cluster)`.
    *
    * The three phases and their scale shapes:
    *  1. centroids = per-`seedCol` element-wise mean via an exploded
    *     (cell, position) aggregate — shuffles cells × dims rows, never
    *     collects a vector to the driver (same shape as
    *     [[Similarity.centroids]]). Components are stable-rounded to 6 dp so
    *     the downstream argmax is reproducible across engines.
    *  2. assignment = a pure per-row fold over the BROADCAST codebook (one
    *     array of k (cell, centroid) structs, cell-sorted): `aggregate`
    *     keeps the best (6dp-rounded cosine, lowest-cell tie-break) as it
    *     scans — NO exchange, NO sort, NO group-by anywhere in assignment;
    *     the rows never move. (The HOF fold is interpreted — CodegenFallback
    *     — but that is per-row map work that scales linearly; the
    *     alternative min(struct) aggregation exchanges every vector-carrying
    *     row.)
    *  3. within-cluster near-dup pairs via [[embeddingNearDupPairs]], which
    *     carries the broadcast/narrow skew gate; dropped = every pair's
    *     larger id. SemDeDup's k controls cluster size — at 100 TB pick k
    *     large enough (paper: 10⁵ on LAION) that a cluster's pair join stays
    *     bounded; the cell self-join never materializes doc×doc across
    *     clusters.
    */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String, seedCol: String,
      threshold: Double,
      maxBroadcastDocs: Long = defaultMaxBroadcastDocs): DataFrame = {
    val assigned = assignNearestCentroid(
      df.select(
        col(idCol).as("_id"), col(vecCol).as("_v"), col(seedCol).as("_seed")),
      "_id", "_v", "_seed")
    val dropped = embeddingNearDupPairs(
        assigned, "_id", "_v", "_cell", threshold, maxBroadcastDocs)
      .select(col("b_id").as("_id")).distinct()
    assigned.join(dropped, Seq("_id"), "left_anti")
      .select(col("_id").as(idCol), col("_cell").as("cluster"))
  }

  /** Nearest-centroid (hard k-means E-step) assignment: per-`seedCol`
    * element-wise-mean centroids, then every vector gets the cell of its
    * max-cosine centroid (6dp-rounded; ties to the lowest cell) as `_cell`.
    * Returns `(idCol, vecCol, _cell)` with the vector cast to double.
    *
    * The assignment itself moves NO rows: the codebook collapses to ONE
    * broadcast row holding a cell-sorted array of (cell, centroid) structs,
    * and the argmax is a per-row `aggregate` fold over that array — no
    * exchange, no sort, no group-by on the data side (the only exchanges in
    * the plan belong to the tiny centroid aggregate). The fold is
    * interpreted (HOFs are CodegenFallback) — linear per-row work that
    * beats exchanging every vector-carrying row at any scale. */
  def assignNearestCentroid(
      df: DataFrame, idCol: String, vecCol: String, seedCol: String): DataFrame = {
    val e = df.select(
      col(idCol).as("_id"),
      transform(col(vecCol), _.cast("double")).as("_v"),
      col(seedCol).as("_seed"))
    val cents = e
      .select(col("_seed").as("_cell"), posexplode(col("_v")).as(Seq("_pos", "_x")))
      .groupBy("_cell", "_pos")
      .agg(avg("_x").as("_m"))
      .groupBy("_cell")
      .agg(
        transform(
          array_sort(collect_list(struct(col("_pos"), stableRound(col("_m"), 6).as("_m")))),
          x => x.getField("_m")).as("_c"))
    // shared broadcast-argmax fold (Similarity.foldAssign); this caller's
    // rounding contract — 6dp-rounded centroid COMPONENTS — is baked into
    // `cents` above, which the d09 oracle mirrors
    Similarity.foldAssign(e, "_id", "_v", cents)
      .select(col("_id").as(idCol), col("_v").as(vecCol), col("_cell"))
  }

  /** Cluster-canonical selection — the step after near-dup clustering that
    * actually SHRINKS the corpus: within each cluster keep ONE canonical
    * document (highest `scoreCol`, ties to the lowest id) and map every
    * member to its keeper. Input is a labeling `(idCol, clusterCol,
    * scoreCol)` (e.g. [[connectedComponents]] output joined with a quality
    * score); output is `(idCol, clusterCol, keeper_id, kept)` for every
    * member.
    *
    * Scale shape: one `max_by(id, struct(score, -id))` hash aggregate per
    * cluster (map-side partial, shuffle ∝ DISTINCT clusters) and one
    * equi-join back on the cluster key — the join reuses the aggregate's
    * hash partitioning, and a million-member cluster is one hot GROUP KEY
    * (combiner-absorbed), not a hot partition. No windows: the classic
    * `row_number() over (partition by cluster)` form sorts every cluster in
    * a single task — exactly the skew shape this avoids. */
  def canonicalByCluster(
      labels: DataFrame, idCol: String, clusterCol: String,
      scoreCol: String): DataFrame = {
    // max of (score, -id) = highest score, then lowest id — deterministic
    // because ids are unique within a cluster
    val keepers = labels
      .groupBy(col(clusterCol))
      .agg(max_by(
        col(idCol),
        struct(col(scoreCol), (-col(idCol)).as("_negid"))).as("keeper_id"))
    labels
      .join(keepers, Seq(clusterCol))
      .select(
        col(idCol), col(clusterCol), col("keeper_id"),
        (col(idCol) === col("keeper_id")).as("kept"))
  }

  /** Incremental (cross-corpus) exact dedup — the ingestion-time form: a
    * `batch` of new documents is admitted only where its normalized-text
    * hash (a) does not already exist in the accumulated `corpus` and (b) is
    * the first occurrence (lowest id) within the batch itself. Returns every
    * batch row as `(idCol, text_hash, dup_of_corpus, kept)`.
    *
    * Scale shape: the corpus side collapses to its DISTINCT hash set before
    * moving (shuffle ∝ distinct corpus hashes — at 100 TB this is the
    * hash-index, not the text), the membership probe is a left equi-join on
    * the hash, and the within-batch rule is a `min(id)` hash aggregate
    * (map-side partial) joined back on the same key — three exchanges, all
    * on the hash key, no windows. The corpus hash set is exactly what a
    * production pipeline would persist as a bucketed table
    * ([[graft.sources.Sinks.writeBucketed]]) so re-ingestion pays no
    * corpus-side exchange at all. */
  def incrementalDedup(
      batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val h = md5(normalizeText(col(textCol)))
    val corpusHashes = corpus.select(h.as("text_hash")).distinct()
      .withColumn("_in_corpus", lit(true))
    val batchH = batch.select(col(idCol), h.as("text_hash"))
    val firstInBatch = batchH.groupBy("text_hash")
      .agg(min(col(idCol)).as("_first_id"))
    batchH
      .join(corpusHashes, Seq("text_hash"), "left")
      .join(firstInBatch, Seq("text_hash"))
      .select(
        col(idCol), col("text_hash"),
        coalesce(col("_in_corpus"), lit(false)).as("dup_of_corpus"),
        (coalesce(col("_in_corpus"), lit(false)).unary_! &&
          col(idCol) === col("_first_id")).as("kept"))
  }

  /** Incremental NEAR-dup detection — [[incrementalDedup]]'s fuzzy sibling
    * for continuous ingestion: which documents of a NEW batch near-duplicate
    * (hashed-shingle Jaccard ≥ `threshold`) a document of the EXISTING
    * corpus. Same shingle → minhash → band pipeline as [[minHashLshPairs]],
    * but the band join is batch→corpus instead of a corpus self-join:
    *
    *  - the batch's band keys BROADCAST (ingestion batches are small by
    *    definition) against the corpus band stream — the corpus is never
    *    shuffled, only scanned, and at scale its prepped frame is exactly
    *    what a production pipeline persists once ([[saveNearDupIndex]])
    *    and probes with every batch, paying no corpus-side kernels per
    *    ingest;
    *  - candidates stay narrow (corpus_id, batch_id, band); payloads
    *    attach by id afterwards with the candidate list broadcast back
    *    onto the corpus — zero exchanges end to end (see [[probeNearDup]]
    *    for the measured reason and the `broadcastCandidates = false`
    *    bulk-batch fallback);
    *  - cross-band duplicates die at emission via the first-agreeing-band
    *    compare, never a distinct shuffle; the 4σ signature pre-filter and
    *    the thresholded exact-Jaccard merge are shared with d02.
    *
    * Probabilistically complete like [[minHashLshPairs]] (same banding
    * recall); every emitted pair's Jaccard is exact. Assumes batch and
    * corpus id spaces are disjoint (an id present in both is reported
    * as its own near-duplicate — exact re-ingestion is [[incrementalDedup]]'s
    * job). Output: `(batch_id, corpus_id, jaccard)`. */
  def incrementalNearDupPairs(
      batch: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.5,
      broadcastCandidates: Boolean = true): DataFrame = {
    val index = buildNearDupIndex(
      corpus, idCol, textCol, shingleK, numHashes, bands).persisted()
    ManagedPairs(
      probeNearDup(index, batch, idCol, textCol, threshold, broadcastCandidates),
      Seq(index.prepped)).releaseOnFirstUse()
  }

  /** A built near-dup index: the corpus with hashed shingles, minhash
    * signature, and band keys per document (`_id, _hs, _sig, _bks`). Hash
    * geometry rides along so probes hash their batches with the identical
    * shingle width, hash count, and banding — a geometry mismatch would
    * silently probe empty buckets. Build once, probe with every ingest
    * batch ([[probeNearDup]]); at scale persist it as a bucketed table
    * ([[saveNearDupIndex]]) so the probe's payload attaches are
    * exchange-free on the corpus side. */
  final case class NearDupIndex(
      prepped: DataFrame, shingleK: Int, numHashes: Int, bands: Int) {
    def persisted(): NearDupIndex = {
      prepped.persist(StorageLevel.MEMORY_AND_DISK); prepped.count(); this
    }
    def unpersisted(): NearDupIndex = { prepped.unpersist(); this }
  }

  /** One corpus pass: shingle → minhash → band keys per document. */
  def buildNearDupIndex(
      corpus: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 32): NearDupIndex = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    NearDupIndex(
      prepNearDup(corpus, idCol, textCol, shingleK, numHashes, bands),
      shingleK, numHashes, bands)
  }

  private def prepNearDup(
      f: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int, bands: Int): DataFrame =
    // ingest repartition, as in minHashLshPairs: a small-file source (one
    // parquet file ⇒ one partition) would otherwise serialize the shingle/
    // minhash/band kernels on a single task — and, for the corpus build,
    // bake that single-partition layout into the persisted index so every
    // probe scan inherits it
    f.repartition(f.sparkSession.sparkContext.defaultParallelism)
      .select(
        col(idCol).as("_id"), hashedShingles(col(textCol), shingleK).as("_hs"))
      .select(
        col("_id"), col("_hs"), minHashSignature(col("_hs"), numHashes).as("_sig"))
      .select(
        col("_id"), col("_hs"), col("_sig"),
        bandKeys(col("_sig"), bands, numHashes / bands).as("_bks"))

  /** Probe a built index with a batch: the batch's band keys and payloads
    * broadcast; the corpus is only ever SCANNED — never re-hashed, never
    * exchanged (with the default `broadcastCandidates`; see the in-body
    * comment for the large-batch fallback). Per-probe cost = the batch's
    * own kernels + two columnar passes over the index, so it is governed
    * by corpus SIZE only through scan bandwidth, not through shuffles or
    * per-doc hashing. Persist the index ([[NearDupIndex.persisted]]) so
    * repeated probes read cached columnar blocks. Same output contract as
    * [[incrementalNearDupPairs]]: `(batch_id, corpus_id, jaccard)`. */
  def probeNearDup(
      index: NearDupIndex, batch: DataFrame, qIdCol: String, qTextCol: String,
      threshold: Double = 0.5,
      broadcastCandidates: Boolean = true): DataFrame =
    probeNearDupPrepped(
      index,
      prepNearDup(batch, qIdCol, qTextCol, index.shingleK, index.numHashes,
        index.bands),
      threshold, broadcastCandidates)

  /** Hash a frame with the index's geometry — the batch-side prep exposed
    * so ingestion paths can STAGE prepped deltas ([[extendNearDupIndex]],
    * [[graft.streaming.StreamingDedup]]'s self-extending attach) and probe
    * them back without re-running the shingle/minhash/band kernels. Output
    * schema is the index's own: `(_id, _hs, _sig, _bks)`. */
  def prepForNearDupIndex(
      index: NearDupIndex, df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    prepNearDup(df, idCol, textCol, index.shingleK, index.numHashes, index.bands)

  /** Ingestion-time index maintenance — the near-dup analog of
    * [[Similarity.extendIvfIndex]]: hash `newDf` with the index's FROZEN
    * geometry and append, no corpus pass. The extended index is IDENTICAL
    * to a fresh [[buildNearDupIndex]] over the union (the hash family is
    * deterministic), so extension loses nothing — unlike IVF, where the
    * frozen codebook is an approximation trade-off. */
  def extendNearDupIndex(
      index: NearDupIndex, newDf: DataFrame, idCol: String,
      textCol: String): NearDupIndex =
    index.copy(prepped = index.prepped.unionByName(
      prepForNearDupIndex(index, newDf, idCol, textCol)))

  /** [[probeNearDup]] with an ALREADY-PREPPED batch frame —
    * `(_id, _hs, _sig, _bks)` hashed with THIS index's geometry
    * ([[prepForNearDupIndex]] or a staged delta read back from parquet).
    * The streaming self-extending attach uses this to hash each micro-batch
    * exactly once: stage the prepped rows, read them back columnar, probe. */
  def probeNearDupPrepped(
      index: NearDupIndex, preppedBatch: DataFrame,
      threshold: Double = 0.5,
      broadcastCandidates: Boolean = true): DataFrame = {
    val numHashes = index.numHashes
    val ct = index.prepped
    // the batch frame feeds two join branches (band keys + payload attach);
    // Spark does not share common subplans across branches, so without the
    // persist the batch's shingle/minhash/band kernels would run twice per
    // probe — released by the one-shot listener after the caller's first
    // action (the d02 cache discipline)
    val bt = preppedBatch.persist(StorageLevel.MEMORY_AND_DISK)
    def maybeB(f: DataFrame): DataFrame =
      if (broadcastCandidates) broadcast(f) else f.hint("shuffle_hash")
    val bBand = bt.select(col("_id").as("_b_id"), posexplode(col("_bks")).as(Seq("_band", "_bh")))
    // Pass 1 — candidate generation: a NARROW id list (b_id, c_id, band),
    // no payload. Broadcast mode: corpus band scan × broadcast batch bands,
    // no exchange. Fallback mode: both band streams exchange by
    // (band, bandHash) — a sort-merge/AQE-skew-handled bucket join, the d02
    // narrow band-join shape.
    val candIds = ct
      .select(col("_id").as("_c_id"), posexplode(col("_bks")).as(Seq("_band", "_bh")))
      .join(if (broadcastCandidates) broadcast(bBand) else bBand,
        Seq("_band", "_bh"))
      .select(col("_b_id"), col("_c_id"), col("_band"))
    // Pass 2 — attach payloads. Default (`broadcastCandidates = true`, the
    // ingest regime — batch AND its candidate list fit the broadcast
    // budget): the candidate list broadcasts back onto the corpus, so the
    // corpus is only ever SCANNED — zero exchanges in the whole probe, and
    // corpus payload columns materialize for matched rows only. The
    // shuffle_hash formulation this replaced exchanged the corpus payload
    // per probe — measured probe wall GREW with corpus size (6.2 → 21.1 s
    // at 100k → 400k docs) instead of staying scan-bound.
    // `broadcastCandidates = false` is the bulk regime (a backfill too big
    // to broadcast): NOTHING batch-sided broadcasts — band join, payload
    // attaches, and candidates all exchange by their keys (SHUFFLE_HASH on
    // the id attaches), correct at any batch size at the price of one
    // corpus exchange per probe (exchange-free on the corpus side when the
    // index is a bucketed table, [[saveNearDupIndex]]).
    val attached =
      if (broadcastCandidates)
        ct.select(
            col("_id").as("_c_id"), col("_hs").as("_hs_c"),
            col("_sig").as("_sig_c"), col("_bks").as("_bks_c"))
          .join(broadcast(candIds), Seq("_c_id"))
      else
        candIds.join(
          ct.select(
            col("_id").as("_c_id"), col("_hs").as("_hs_c"),
            col("_sig").as("_sig_c"), col("_bks").as("_bks_c"))
            .hint("shuffle_hash"),
          Seq("_c_id"))
    val sigCut =
      math.max(0.0, threshold - 4.0 * math.sqrt(threshold * (1 - threshold) / numHashes))
    val jacc = graft.functions.ArrayKernels
      .sortedJaccardGeq(col("_hs_b"), col("_hs_c"), threshold)
    val out = attached
      .join(maybeB(bt.select(
        col("_id").as("_b_id"), col("_hs").as("_hs_b"),
        col("_sig").as("_sig_b"), col("_bks").as("_bks_b"))), Seq("_b_id"))
      .filter(graft.functions.ArrayKernels.firstEqualIndex(
        col("_bks_b"), col("_bks_c")) === col("_band") + 1)
      .filter(graft.functions.ArrayKernels.agreeCount(
        col("_sig_b"), col("_sig_c")) >= lit(sigCut * numHashes))
      .filter(jacc >= threshold)
      .select(
        col("_b_id").as("batch_id"), col("_c_id").as("corpus_id"),
        round(jacc, 6).as("jaccard"))
    ManagedPairs(out, Seq(bt)).releaseOnFirstUse()
  }

  /** Persist a near-dup index as tables: the prepped corpus BUCKETED on
    * `_id` ([[graft.sources.Sinks.writeBucketed]]) — which makes even the
    * large-batch `broadcastCandidates = false` fallback's corpus-side
    * attach exchange-free — plus a one-row `_meta` table carrying the hash
    * geometry (a probe with mismatched geometry would silently hash into
    * empty buckets, so it travels with the data — the
    * [[graft.operators.Similarity.saveLshIndex]] convention). */
  def saveNearDupIndex(index: NearDupIndex, name: String, numBuckets: Int): Unit = {
    graft.sources.Sinks.writeBucketed(
      index.prepped, s"${name}_prepped", Seq("_id"), numBuckets)
    index.prepped.sparkSession
      .sql(s"SELECT ${index.shingleK} AS shingle_k, " +
        s"${index.numHashes} AS num_hashes, ${index.bands} AS bands")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  def loadNearDupIndex(
      spark: org.apache.spark.sql.SparkSession, name: String): NearDupIndex = {
    val meta = spark.table(s"${name}_meta").head()
    NearDupIndex(
      spark.table(s"${name}_prepped"),
      meta.getAs[Int]("shingle_k"), meta.getAs[Int]("num_hashes"),
      meta.getAs[Int]("bands"))
  }

  /** Semantic decontamination — the embedding-space complement of the
    * n-gram check ([[TextAnalysis.contaminatedDocs]]): a training row is
    * contaminated when its embedding sits within cosine `threshold` of ANY
    * benchmark embedding, catching paraphrased benchmark leakage that
    * shares no literal n-gram.
    *
    * Scale shape: the benchmark set (thousands of rows — eval suites, not
    * corpora) collapses to ONE broadcast row of vectors and every corpus
    * row folds over it keeping its max cosine — a single corpus pass, zero
    * exchange of corpus rows, no join. For a benchmark set too large to
    * broadcast, block first ([[embeddingNearDupPairs]]'s keyed shape) — at
    * that point it is near-dup detection, not decontamination. The compare
    * runs on the 6dp-stable-rounded max (max is order-independent, so
    * cross-engine last-ulp noise cannot flip it off the rounding cushion).
    *
    * Output: the CLEAN rows `(idCol, max_bench_sim)` — audit-friendly
    * (the score says how close the nearest benchmark item came). An empty
    * benchmark set keeps everything with `max_bench_sim = -1`.
    *
    * Zero vectors have no defined cosine (0/0 = NaN) and are neutralized
    * per-compare (`nanvl` → -1): a single zero BENCHMARK vector would
    * otherwise make the fold NaN for every corpus row — and since
    * `NaN < threshold` is false, silently drop the ENTIRE corpus; a zero
    * CORPUS vector is kept (score -1) — it is near nothing. */
  def semanticDecontaminate(
      df: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchVecCol: String, threshold: Double): DataFrame =
    semanticDecontaminateAgainst(
      df, idCol, vecCol, collectBenchVectors(bench, benchVecCol), threshold)

  /** The build-once artifact behind [[semanticDecontaminate]]: the
    * benchmark vectors collapsed to ONE broadcastable row (`_bvs`). Derive
    * + persist ONCE for probe-many use (the streaming decontam attach) —
    * the plain entry point rebuilds this collect per call. */
  def collectBenchVectors(bench: DataFrame, benchVecCol: String): DataFrame =
    bench.agg(collect_list(col(benchVecCol)).as("_bvs"))

  /** [[semanticDecontaminate]] against a PREBUILT [[collectBenchVectors]]
    * one-row frame. */
  def semanticDecontaminateAgainst(
      df: DataFrame, idCol: String, vecCol: String,
      benchVectors: DataFrame, threshold: Double): DataFrame = {
    require(threshold > -1.0 && threshold <= 1.0,
      s"threshold must be in (-1, 1], got $threshold")
    df.crossJoin(broadcast(benchVectors))
      .select(
        col(idCol),
        graft.operators.stableRound(
          aggregate(col("_bvs"), lit(-1.0),
            (acc, b) => greatest(acc, nanvl(
              graft.functions.ArrayKernels.vecCosine(col(vecCol), b),
              lit(-1.0)))), 6)
          .as("max_bench_sim"))
      .filter(col("max_bench_sim") < threshold)
  }

  /** Character-level (typo-scale) near-duplicate pairs: normalized texts
    * within Levenshtein distance `maxDist`, the modality the token-set
    * family is blind to (a dozen single-character edits barely move
    * Jaccard but are exactly what OCR noise and template drift produce).
    *
    * Candidate generation is BLOCKED, never all-pairs: documents sharing
    * the first `prefixLen` normalized characters self-join within the
    * block, pre-filtered by the length band (|len(a)−len(b)| ≤ maxDist — a
    * necessary condition for edit distance, applied before any DP runs).
    * The DP itself runs with Spark's thresholded `levenshtein(_, _, k)`
    * form: it abandons a pair the moment the running distance exceeds
    * `maxDist` (banded O(len·maxDist) instead of O(len²)).
    *
    * Blocking recall/skew honesty (same contract as d03/d04): an edit
    * inside the first `prefixLen` characters moves the pair to different
    * blocks and is missed — raise recall by lowering `prefixLen` at the
    * cost of bigger blocks; a boilerplate-heavy corpus with one dominant
    * prefix makes that block quadratic — route such corpora through the
    * d02 strategy gate discipline (block on a longer prefix, or pre-group
    * exact duplicates away with [[byNormalizedText]] first, which also
    * removes the distance-0 mass). Two further exclusions the prefix
    * block implies: a normalized text SHORTER than `prefixLen` uses the
    * whole short string as its block key, so its near-neighbors of
    * different (still short) prefixes are missed even when the edit is
    * past position 1 — short-text corpora should lower `prefixLen`
    * toward the typical length; and a NULL `textCol` normalizes to a
    * NULL prefix, which the block equi-join drops entirely (a null
    * document has no character content to be edit-close to). Measured
    * recall vs a brute-force oracle: SCALE.md round-9 d15 matrix.
    *
    * `suffixLen > 0` adds a SECOND blocking key — the trailing
    * `suffixLen` normalized characters — and unions both candidate sets
    * (deduped before any DP runs, so each pair pays one thresholded
    * Levenshtein regardless of how many blocks propose it). Why the
    * suffix specifically: a trailing-aligned suffix is insensitive to
    * position shifts, so ANY single edit — including an insertion or
    * deletion inside the prefix — leaves either the first `prefixLen` or
    * the last `suffixLen` characters intact whenever
    * `len > max(prefixLen, suffixLen)`; single-edit pairs are then
    * caught with certainty, and multi-edit pairs are missed only when
    * edits touch BOTH ends. Cost: a second blocked self-join of the same
    * shape (≈2× candidate volume on non-pathological corpora). */
  def editDistancePairs(
      df: DataFrame, idCol: String, textCol: String, maxDist: Int,
      prefixLen: Int = 4, suffixLen: Int = 0): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    require(suffixLen >= 0, s"suffixLen must be >= 0, got $suffixLen")
    val base = df.select(
      col(idCol).as("_id"),
      normalizeText(col(textCol)).as("_norm"))
      .withColumn("_len", length(col("_norm")))
    def blocked(key: Column): DataFrame = {
      val withK = base.withColumn("_blk", key)
      val a = withK.select(
        col("_id").as("a_id"), col("_norm").as("_na"),
        col("_blk"), col("_len").as("_la"))
      val b = withK.select(
        col("_id").as("b_id"), col("_norm").as("_nb"),
        col("_blk"), col("_len").as("_lb"))
      a.join(b, Seq("_blk"))
        .filter(
          col("a_id") < col("b_id") &&
            abs(col("_la") - col("_lb")) <= maxDist)
        .select(col("a_id"), col("b_id"), col("_na"), col("_nb"))
    }
    val prefixCands = blocked(substring(col("_norm"), 1, prefixLen))
    val cands =
      if (suffixLen == 0) prefixCands
      else prefixCands
        .unionByName(blocked(substring(col("_norm"), -suffixLen, suffixLen)))
        .dropDuplicates("a_id", "b_id")
    cands
      .select(
        col("a_id"), col("b_id"),
        levenshtein(col("_na"), col("_nb"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** D20 — structured-record entity resolution: multi-field fuzzy matching
    * (name+address-style) composed from the parts this family already has
    * — exact-key/prefix BLOCKING for candidates, per-field similarity
    * (the [[editDistancePairs]] banded-DP edit kernel, token Jaccard,
    * null-safe equality, numeric closeness), and a weighted match score.
    * Field kinds and their similarities (each 6 dp-rounded BEFORE
    * weighting, so the score and the threshold branch replay exactly on
    * any engine):
    *  - edit:    `1 − lev(lower(trim(a)), lower(trim(b))) / max(len)`;
    *             the DP is BANDED at `maxEdit` — a pair further apart
    *             than that scores 0 on the field (it was never a fuzzy
    *             match at typo scale) and costs O(len·maxEdit), not
    *             O(len²).
    *  - jaccard: distinct whitespace tokens of lower(trim()); two empty
    *             token sets are identical (1.0).
    *  - exact:   null-safe equality (two nulls match — same record shape).
    *  - close:   `1 − |a−b| / max(|a|, |b|, 1)` for numerics; null-safe
    *             equal → 1.0, one-sided null → 0.0.
    * `score = Σ wᵢ·simᵢ / Σ wᵢ`, 6 dp; pairs below `threshold` drop.
    *
    * Scale/recall contract (the d04/d15 discipline): candidates come ONLY
    * from the exact `blockCols` equi-self-join — a true match whose block
    * key differs (e.g. a typo inside the blocking prefix) is missed, and
    * recall is PRICED, not guessed, by running [[pairSetMetrics]] against
    * planted variants (d20b). A NULL block key drops its record from
    * candidate generation (equi-join semantics). A hot block is a hot
    * join key — quadratic in ITS size only, never corpus-quadratic; AQE's
    * skew split spreads the build, and the block key should carry enough
    * cardinality that blocks stay task-sized (the d02 strategy-gate
    * rule). */
  def entityPairs(
      df: DataFrame, idCol: String, blockCols: Seq[Column],
      editFields: Seq[(String, Double)] = Nil,
      jaccardFields: Seq[(String, Double)] = Nil,
      exactFields: Seq[(String, Double)] = Nil,
      closeFields: Seq[(String, Double)] = Nil,
      threshold: Double = 0.8, maxEdit: Int = 20): DataFrame =
    entityCore(df, None, idCol, blockCols, editFields, jaccardFields,
      exactFields, closeFields, threshold, maxEdit)

  /** Cross-table record LINKAGE — [[entityPairs]]' two-frame form (match
    * a probe table against a reference/master table instead of
    * deduplicating one table against itself): same blocking, same
    * per-field similarities, same weighted score and threshold, but
    * candidates come from the probe ⋈ store block join and every
    * (probe, store) pair is kept (no `a_id < b_id` self-dedup filter —
    * the sides are distinct tables). `a_id` is the probe record, `b_id`
    * the store record. Both frames must carry the similarity fields under
    * the same names; [[graft.streaming.StreamingEntity]] runs this per
    * micro-batch against the accumulated store. */
  def entityLink(
      probe: DataFrame, store: DataFrame, idCol: String,
      blockCols: Seq[Column],
      editFields: Seq[(String, Double)] = Nil,
      jaccardFields: Seq[(String, Double)] = Nil,
      exactFields: Seq[(String, Double)] = Nil,
      closeFields: Seq[(String, Double)] = Nil,
      threshold: Double = 0.8, maxEdit: Int = 20): DataFrame =
    entityCore(probe, Some(store), idCol, blockCols, editFields,
      jaccardFields, exactFields, closeFields, threshold, maxEdit)

  private def entityCore(
      df: DataFrame, storeOpt: Option[DataFrame], idCol: String,
      blockCols: Seq[Column],
      editFields: Seq[(String, Double)],
      jaccardFields: Seq[(String, Double)],
      exactFields: Seq[(String, Double)],
      closeFields: Seq[(String, Double)],
      threshold: Double, maxEdit: Int): DataFrame = {
    require(blockCols.nonEmpty, "entityPairs: no blocking columns")
    val weighted =
      editFields.map { case (f, w) => (f, w, "edit") } ++
        jaccardFields.map { case (f, w) => (f, w, "jaccard") } ++
        exactFields.map { case (f, w) => (f, w, "exact") } ++
        closeFields.map { case (f, w) => (f, w, "close") }
    require(weighted.nonEmpty, "entityPairs: no similarity fields")
    weighted.foreach { case (f, w, k) =>
      require(w >= 0, s"entityPairs: negative weight $w on $k($f)") }
    val wSum = weighted.map(_._2).sum
    require(wSum > 0, "entityPairs: all weights zero")
    require(threshold >= 0 && threshold <= 1,
      s"entityPairs: threshold in [0,1], got $threshold")
    require(maxEdit >= 1, s"entityPairs: maxEdit must be >= 1, got $maxEdit")

    // every record-derivable input — normalized strings, distinct token
    // arrays — is computed ONCE PER RECORD here, never per candidate
    // pair: the pair volume is quadratic in block size, and recomputing
    // split+distinct per pair was the 10× of d20's first wall (15.7 s →
    // ~2 s at sf0.1 from this hoist alone)
    def norm(c: Column) = lower(trim(c.cast("string")))
    def toks(c: Column) = array_distinct(
      filter(split(norm(coalesce(c, lit(""))), "\\s+"),
        t => length(t) > 0))
    val fieldCols = weighted.map(_._1).distinct
    val derived =
      weighted.collect { case (f, _, "edit") =>
        s"_n_$f" -> norm(coalesce(col(f), lit(""))) }.distinct ++
        weighted.collect { case (f, _, "jaccard") =>
          s"_t_$f" -> toks(col(f)) }.distinct
    def prep(in: DataFrame) = in.select(
      col(idCol).as("_id") +:
        (blockCols.zipWithIndex.map { case (c, i) => c.as(s"_blk$i") } ++
          fieldCols.map(col) ++
          derived.map { case (n, c) => c.as(n) }): _*)
    val base = prep(df)
    val carried = fieldCols ++ derived.map(_._1)
    def side(from: DataFrame, p: String) = from.select(
      col("_id").as(s"${p}_id") +:
        (blockCols.indices.map(i => col(s"_blk$i")) ++
          carried.map(f => col(f).as(s"_${p}_$f"))): _*)
    // the probe side is explicitly spread: candidate evaluation is
    // PAIR-volume work (quadratic in block size), and a compact input —
    // one small parquet file, or one hot upstream partition — would
    // otherwise run the whole probe on one task (measured: 15.7 s
    // single-task → ~1 s spread, sf0.1). Round-robin, not block-hash, so
    // probe parallelism is independent of blocking skew: even a
    // mega-block's pairs spread over every core. The exchange is
    // rows-sized; the probe it parallelizes is pairs-sized.
    val slices = df.sparkSession.sessionState.conf.numShufflePartitions
    val bSide = side(storeOpt.map(prep).getOrElse(base), "b")
    val cand0 = side(base, "a").repartition(slices)
      .join(bSide, blockCols.indices.map(i => s"_blk$i").toSeq)
    // self-dedup keeps each unordered pair once; cross-table linkage
    // keeps every (probe, store) pair — the sides are distinct tables
    val cand = if (storeOpt.isEmpty) cand0.filter(col("a_id") < col("b_id"))
      else cand0

    def sim(f: String, kind: String): Column = {
      val (a, b) = (col(s"_a_$f"), col(s"_b_$f"))
      kind match {
        case "edit" =>
          val (na, nb) = (col(s"_a__n_$f"), col(s"_b__n_$f"))
          val d = levenshtein(na, nb, maxEdit)
          when(d < 0, lit(0.0)).otherwise(
            lit(1.0) - d.cast("double") /
              greatest(length(na), length(nb), lit(1)).cast("double"))
        case "jaccard" =>
          val (ta, tb) = (col(s"_a__t_$f"), col(s"_b__t_$f"))
          val inter = size(array_intersect(ta, tb))
          val uni = size(ta) + size(tb) - inter
          when(uni === 0, lit(1.0))
            .otherwise(inter.cast("double") / uni.cast("double"))
        case "exact" => when(a <=> b, lit(1.0)).otherwise(lit(0.0))
        case "close" =>
          when(a <=> b, lit(1.0))
            .when(a.isNull || b.isNull, lit(0.0))
            .otherwise(lit(1.0) - abs(a - b).cast("double") /
              greatest(abs(a), abs(b), lit(1)).cast("double"))
      }
    }
    val withSims = weighted.foldLeft(cand) { case (acc, (f, _, k)) =>
      acc.withColumn(s"${f}_${k}_sim", stableRound(sim(f, k), 6))
    }
    val score = weighted.map { case (f, w, k) =>
      col(s"${f}_${k}_sim") * lit(w)
    }.reduce(_ + _) / lit(wSum)
    withSims
      .withColumn("score", stableRound(score, 6))
      .filter(col("score") >= threshold)
      .select(col("a_id") +: col("b_id") +:
        weighted.map { case (f, _, k) => col(s"${f}_${k}_sim") } :+
        col("score"): _*)
  }

  /** Duplicate-cluster size histogram — the "how duplicated is this
    * corpus" monitoring table over a component assignment
    * ([[connectedComponents]] / [[connectedComponentsAlternating]] output,
    * or any `(id, cluster)` frame): for each cluster SIZE, how many
    * clusters have it. Size 1 = unique docs; the tail is the dedup
    * opportunity, and its drift across ingest batches is the cheap signal
    * that a new source is boilerplate-heavy.
    *
    * Shape: two map-side-combined hash aggregates (per-cluster count →
    * per-size count) — a corpus-hot cluster is a hot GROUP key, absorbed
    * by partial aggregation; output ∝ distinct sizes. */
  def clusterSizeHistogram(
      assignments: DataFrame, clusterCol: String): DataFrame =
    assignments
      .groupBy(col(clusterCol)).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  /** Duplication-aware sampling weights — "soft dedup": instead of
    * DROPPING a duplicate cluster's non-canonical members, keep every
    * member and downweight it by `size^(-alpha)` so the cluster's total
    * training contribution is `size^(1-alpha)` (alpha = 1, the default,
    * makes every cluster contribute exactly one doc's worth — the
    * published middle ground between hard dedup, which loses benign
    * near-variants, and no dedup, which lets boilerplate dominate the
    * loss). Feed the weights to [[TopK.weightedSampleNoReplacement]] or a
    * mixture builder. Works over ANY `(id, cluster)` assignment —
    * [[connectedComponents]] output, exact-hash clusters, or chunk-level
    * groups.
    *
    * Shape: per-cluster count (map-side combined — a corpus-hot
    * boilerplate cluster is a hot GROUP key, absorbed by partial
    * aggregation) + one join back on the cluster key, AQE-sized; a
    * mega-cluster is a hot JOIN key on the way back, which AQE's
    * skew-join split handles (same discipline as [[SkewJoin]]).
    *
    * Output: `(idCol, clusterCol, cluster_size, weight)`, 6 dp. */
  def duplicationWeights(
      assignments: DataFrame, idCol: String, clusterCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    val sizes = assignments
      .groupBy(col(clusterCol)).agg(count(lit(1)).as("cluster_size"))
      .withColumnRenamed(clusterCol, "_graft_dw_k")
    // null-safe join back (the funnelTimes convention): a NULL cluster key
    // is a REAL cluster — e.g. md5(null text) groups every null-text doc
    // into one indistinguishable-content cluster — and its members must be
    // weighted, not silently dropped from the weights table
    assignments
      .join(sizes, col(clusterCol) <=> col("_graft_dw_k"))
      .select(
        col(idCol), col(clusterCol), col("cluster_size"),
        stableRound(
          pow(col("cluster_size").cast("double"), lit(-alpha)), 6).as("weight"))
  }

  /** Pair-set precision/recall/F1 — the dedup evaluation harness (the
    * [[graft.operators.Similarity]] `recallAtK` analog for candidate
    * pairs): how much of one near-dup pair generator's output does another
    * recover? Feed a cheap blocked generator as `pred` and a
    * higher-recall one (or a labeled truth set) as `truth` to price a
    * blocking scheme's recall loss in one number instead of anecdotes.
    * Pairs are canonicalized to (min, max) and deduplicated on both sides
    * first, so orientation and duplicates can't skew the counts.
    *
    * Shape: everything is pair-set-sized, never corpus-sized — two
    * distinct-aggregates, one LEFT SEMI on the pair key, three one-row
    * count frames cross-joined. `precision = |∩|/|pred|`,
    * `recall = |∩|/|truth|`, `f1` harmonic (NULL when both are 0 — no
    * evidence, not a zero). Output: one row, 6 dp. */
  def pairSetMetrics(
      pred: DataFrame, truth: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(
        least(col(aCol), col(bCol)).as("_a"),
        greatest(col(aCol), col(bCol)).as("_b"))
      .distinct()
    val p = canon(pred)
    val t = canon(truth)
    val np = p.agg(count(lit(1)).as("n_pred"))
    val nt = t.agg(count(lit(1)).as("n_truth"))
    val nb = p.join(t, Seq("_a", "_b"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    val prec = col("n_both").cast("double") / col("n_pred")
    val rec = col("n_both").cast("double") / col("n_truth")
    np.crossJoin(nt).crossJoin(nb)
      .select(
        col("n_pred"), col("n_truth"), col("n_both"),
        when(col("n_pred") > 0, stableRound(prec, 6)).as("precision"),
        when(col("n_truth") > 0, stableRound(rec, 6)).as("recall"),
        when(col("n_pred") > 0 && col("n_truth") > 0 && col("n_both") > 0,
          stableRound(lit(2.0) * prec * rec / (prec + rec), 6)).as("f1"))
  }

  /** Near-CONTAINMENT pairs — the asymmetric relative the near-dup family
    * deliberately misses: a short document quoted/wrapped inside a long one
    * has tiny Jaccard (the length-ratio prune in [[ngramJaccardPairs]] even
    * rejects the pair up front) but containment
    * `|A∩B| / min(|A|,|B|) ≥ threshold`. The curation use is boilerplate
    * wrappers and quote-inflation: keep the container, drop or down-weight
    * the contained copy.
    *
    * Candidate generation CANNOT block on length (the interesting pairs
    * straddle length buckets), so it uses the inverted-index/prefix-filter
    * route: documents pair only when they SHARE A RARE TOKEN (document
    * frequency in [2, maxDf]). Scale shape: posting lists of rare tokens
    * only — each such token emits ≤ maxDf·(maxDf−1)/2 candidate pairs, so
    * the blow-up is bounded per token and never corpus-quadratic; exact
    * containment then runs the merge-intersect kernel over SHUFFLE_HASH-
    * attached sorted token-hash payloads (the d04 attach discipline).
    *
    * RECALL caveat (documented like d15's): a contained document whose
    * every token is common (df > maxDf everywhere) generates no candidate.
    * Raising `maxDf` buys recall linearly in posting size; the exact
    * full-recall setting is `maxDf = nDocs`, which is the quadratic join
    * this operator exists to avoid — pick maxDf like an LSH band count.
    *
    * Output: `(a_id, b_id, contained_id, containment)` with `a_id < b_id`,
    * `contained_id` the smaller token SET (ties → lower id), containment
    * rounded 6 dp. Null/empty texts never pair (no tokens → no postings). */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxDf: Long): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    require(maxDf >= 2, s"maxDf must be >= 2 (df-1 tokens cannot pair), got $maxDf")
    // drop zero-length tokens before hashing: split on leading/trailing
    // whitespace emits empty strings, which would otherwise hash into the
    // token set (inflating |A|, |B|, and the df postings) and let
    // whitespace-only texts pair despite the no-tokens contract — the
    // TextAnalysis.tokens discipline
    val toks = graft.functions.ArrayKernels
      .sortedTokenHashes(filter(
        split(lower(col(textCol)), "\\s+"), t => length(t) > 0))
    val base = df
      .select(col(idCol).as("_id"), toks.as("_toks"))
      .where(size(col("_toks")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    base.count()
    val postings = base.select(col("_id"), explode(col("_toks")).as("_tok"))
    val rare = postings.groupBy("_tok").agg(count(lit(1)).as("_df"))
      .where(col("_df") >= 2 && col("_df") <= maxDf)
      .select("_tok")
    val rarePostings = postings.join(rare.hint("shuffle_hash"), Seq("_tok"))
    val cand = rarePostings.select(col("_tok"), col("_id").as("a_id"))
      .join(rarePostings.select(col("_tok"), col("_id").as("b_id")), Seq("_tok"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
    val out = cand
      .join(base.select(col("_id").as("a_id"), col("_toks").as("_ta"))
        .hint("shuffle_hash"), Seq("a_id"))
      .join(base.select(col("_id").as("b_id"), col("_toks").as("_tb"))
        .hint("shuffle_hash"), Seq("b_id"))
      .select(
        col("a_id"), col("b_id"),
        graft.functions.ArrayKernels.sortedIntersectCount(col("_ta"), col("_tb"))
          .cast("long").as("_inter"),
        size(col("_ta")).cast("long").as("_na"),
        size(col("_tb")).cast("long").as("_nb"))
      .select(
        col("a_id"), col("b_id"),
        when(col("_na") < col("_nb") ||
          (col("_na") === col("_nb") && col("a_id") < col("b_id")),
          col("a_id")).otherwise(col("b_id")).as("contained_id"),
        (col("_inter").cast("double") / least(col("_na"), col("_nb")))
          .as("_raw"))
      // the module-wide verification contract (file header): threshold the
      // RAW score — identical exact-integer-ratio doubles on both engines —
      // and round only in the final projection
      .where(col("_raw") >= threshold)
      .select(
        col("a_id"), col("b_id"), col("contained_id"),
        stableRound(col("_raw"), 6).as("containment"))
    ManagedPairs(out, Seq(base)).releaseOnFirstUse()
  }
}
