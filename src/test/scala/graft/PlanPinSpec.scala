package graft

/** Plan-shape pins for strategy decisions that comments alone can't hold:
  * these assert the PHYSICAL plan a query builds, so a refactor that
  * silently loses a hint or re-plans a scale-critical join fails loudly. */
class PlanPinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q06: the per-part aggregate joins back as a hash join, never sort-merge") {
    // at 100 TB the part dimension exceeds any broadcast threshold and an
    // unhinted fallback would SORT the fact table; the shuffle_hash hint
    // pins the hash join (AQE may still upgrade the tiny bench-scale build
    // side to broadcast — also sort-free, also fine)
    val plan = Queries.byName("q06_oee")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"q06 aggregate join fell back to sort-merge:\n${plan.take(3000)}")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"q06 lost its hash-join strategy:\n${plan.take(3000)}")
  }

  test("q22: uniform data plans the single-exchange as-of, no join") {
    val plan = Queries.byName("q22_asof")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n${plan.take(3000)}")
    assert(!plan.contains("_graft_asof_b"),
      s"uniform q22 must not auto-route to the bucketed form:\n${plan.take(3000)}")
  }

  test("s03: batch ANN probe plans broadcast probes, no shuffle of the corpus by cell") {
    val plan = Queries.byName("s03_ann_batch")(spark, sf)
      .queryExecution.executedPlan.toString
    // the only nested-loop is the one-row codebook broadcast; the candidate
    // join must be a broadcast hash join on _cell
    assert(plan.contains("BroadcastHashJoin"),
      s"s03 candidate join must broadcast the probe side:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"s03 must not sort-merge the corpus:\n${plan.take(3000)}")
  }

  test("s06: centroid join broadcasts the label codebook, no sort-merge, no global window") {
    val plan = Queries.byName("s06_label_outliers")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"s06 must broadcast the label codebook:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"s06 must not sort-merge the corpus:\n${plan.take(3000)}")
  }

  test("t20/t21: token-frequency joins never sort-merge at bench scale") {
    // the vocabulary side is Zipf-bounded — losing the broadcast/hash
    // strategy here would sort the exploded token stream
    Seq("t20_unigram_logprob", "t21_pmi_collocations").foreach { q =>
      val plan = Queries.byName(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"$q frequency join fell back to sort-merge:\n${plan.take(3000)}")
    }
  }

  test("s08: BM25 plans no token explode, no join but the stats broadcast, top-k finisher") {
    val plan = Queries.byName("s08_bm25")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"s08 must not explode the token stream:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"s08's only join must be the one-row stats broadcast:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"s08 must finish with a partition-local top-k:\n${plan.take(3000)}")
  }

  test("s09/t24: per-dim stats and KL drift never sort-merge, never global-sort") {
    Seq("s09_embed_stats", "t24_source_drift").foreach { q =>
      val df = Queries.byName(q)(spark, sf)
      df.collect() // materialize so AQE's final plan (isFinalPlan) is inspected
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"$q fell back to sort-merge:\n${plan.take(3000)}")
      assert(!plan.contains("rangepartitioning"),
        s"$q planned a global sort:\n${plan.take(3000)}")
    }
  }

  test("s10/s11: SQ8 probes plan only broadcast joins — the coded corpus is never shuffled") {
    // every join in the compressed probe path is a one-row broadcast (bounds,
    // query) or the broadcast probe→cell equi-join; a SortMergeJoin or
    // ShuffledHashJoin here would mean the ¼-sized corpus residency is being
    // exchanged anyway, throwing away the compression's scan advantage
    Seq("s10_sq8_topk", "s11_sq8_ivf").foreach { q =>
      val df = Queries.byName(q)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"$q shuffled the coded corpus:\n${plan.take(3000)}")
    }
  }

  test("s13/s14: sign scan and rerank funnel never sort the corpus into a merge join") {
    // s13's only join is the packed-query broadcast over one corpus scan;
    // s14's shortlist joins are queries×shortlist-sized — if either plans a
    // SortMergeJoin the corpus is being exchanged for a probe-sized input
    Seq("s13_sign_hamming", "s14_rerank_funnel").foreach { q =>
      val df = Queries.byName(q)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"$q planned a sort-merge join:\n${plan.take(3000)}")
    }
  }

  test("t24: ONE corpus scan — the (source, term) exchange is reused, not recomputed") {
    // join-inferred isnotnull(source) must not break exchange canonical
    // equality (the operator prefilters nulls so every branch's scan
    // predicate is identical); a second live scan here doubles the only
    // corpus-proportional stage at 100 TB
    val df = Queries.byName("t24_source_drift")(spark, sf)
    df.collect()
    // AdaptiveSparkPlan.toString prints the final plan AND the pre-AQE
    // "== Initial Plan ==" (where ReusedExchange hasn't materialized yet);
    // only the final section reflects what actually ran
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"t24 must scan the corpus once, found $scans scans:\n${plan.take(4000)}")
  }

  test("t26: dup-hash semi join stays hash-keyed (broadcast/SHJ), no sort-merge, no window") {
    // the corpus-token-sized window frame must never be SORTED into a merge
    // join (the dup-hash side is the duplicated vocabulary — broadcast
    // while it fits, pinned shuffle-hash beyond) and the per-doc rollup is
    // pure hash aggregation — no window function anywhere
    val df = Queries.byName("t26_dup_spans")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("SortMergeJoin"),
      s"t26 sorted the window frame into a merge join:\n${plan.take(4000)}")
    assert(!plan.contains("Window"),
      s"t26 must stay window-free:\n${plan.take(3000)}")
  }

  test("t29: weighted sample plans a partition-local top-n, never a global sort") {
    val plan = Queries.byName("t29_weighted_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"t29 must plan per-partition top-n + driver merge:\n${plan.take(3000)}")
    assert(!plan.contains("rangepartitioning"),
      s"t29 must not globally sort the corpus:\n${plan.take(3000)}")
  }

  test("t27/t28: span strip and bigram LM never sort-merge at bench scale") {
    // t27's joins are hash-keyed (window hash / (doc, offset)); t28's model
    // tables are bigram-vocabulary-sized — losing the hash strategy sorts
    // the exploded token stream
    Seq("t27_strip_spans", "t28_bigram_logprob").foreach { q =>
      val df = Queries.byName(q)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!plan.contains("SortMergeJoin"),
        s"$q fell back to sort-merge:\n${plan.take(3000)}")
    }
  }

  test("s16: the metadata predicate reaches the parquet scan as a pushed filter") {
    // pre-filter semantics only pay off at 100 TB if the slice predicate
    // prunes AT THE SCAN — a post-scan Filter still reads every vector
    val plan = Queries.byName("s16_filtered_knn")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(label,2)"),
      s"s16 label predicate must push to the scan:\n${plan.take(3000)}")
  }

  test("t33: the percentile window ranks the DISTINCT-value aggregate, never raw rows") {
    // the scale contract: WindowExec's child must be the (group, value)
    // hash aggregate — a window straight over the corpus re-sorts every
    // group's full row set in one task each
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = Queries.byName("t33_percentile_norm")(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "t33 lost its window")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"t33 planned an UNPARTITIONED window:\n${w.toString.take(2000)}")
      assert(w.collectFirst { case a: Aggregate => a }.isDefined,
        s"t33 window must rank the aggregated distinct-value table:\n${w.toString.take(2000)}")
    }
  }

  test("t41/s22: the per-row kernels plan shuffle-free scans — no Exchange at all") {
    for (q <- Seq("t41_nfc_normalize", "s22_phrase_search")) {
      val plan = Queries.byName(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$q must be a pure map pass over the scan:\n${plan.take(3000)}")
    }
  }

  test("s25: the IVF-PQ probe broadcasts the distance table — codes never sort-merge") {
    // at 100 TB the codes frame is the corpus; a sort-merge against the
    // m×k distance table (or the probed membership) would shuffle it by a
    // join key per query — the exact cost the composition exists to avoid.
    // Built un-checkpointed here: the query entry materializes its result,
    // which collapses the executed plan to a Scan of the checkpoint RDD.
    import org.apache.spark.sql.functions.col
    import graft.operators.{Pq, Similarity}
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cb = Pq.fit(e, "vec_id", "embedding", dims = 64, m = 2, k = 4,
      iters = 2)
    val plan = Pq.ivfPqTopK(
      cb, Pq.encode(e, "vec_id", "embedding", cb).filter(col("vec_id") =!= 0L),
      "vec_id", e.select(col("vec_id"), col("label")), "label",
      Similarity.centroids(e, "label", "embedding"),
      e.filter(col("vec_id") === 0L), "vec_id", "embedding",
      k = 10, nProbe = 2)
      .queryExecution.executedPlan.toString
    cb.unpersisted()
    assert(!plan.contains("SortMergeJoin"),
      s"s25 must never sort-merge the codes:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"s25 lost its broadcast probe joins:\n${plan.take(3000)}")
  }
}
