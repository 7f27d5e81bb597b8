package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity

/** Round-8 scale-stress matrix (dev tooling → SCALE.md): the materialized
  * ANN index.
  *
  * Claim under test: with the index built ONCE ([[Similarity.buildIvfIndex]]
  * → persisted), the per-query probe wall is independent of corpus size —
  * cells are sized to constant occupancy (the standard IVF discipline:
  * nCells ∝ n, so a probe scans nProbe × cellSize rows regardless of n) —
  * while the one-shot `ivfTopK` path (what round 7 shipped) pays the full
  * codebook-construction corpus pass on EVERY query and therefore scales
  * with n. LSH: probe hashes only the query batch (nPlanes × dims work per
  * query), candidate volume ∝ bucket occupancy.
  */
object ScaleStressR8 {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode(SaveMode.Overwrite).save()

  /** Deterministic pseudo-random corpus: n vectors × `dims`, plus a
    * constant-occupancy cell id (4096 vectors per cell). */
  private def corpus(spark: org.apache.spark.sql.SparkSession, n: Long, dims: Int) =
    spark.range(n).select(
      col("id"),
      transform(
        sequence(lit(0), lit(dims - 1)),
        d => pmod(xxhash64(col("id") * 31 + d), lit(2000003L)).cast("double")
          / 1000001.5 - 1.0).as("vec"),
      pmod(xxhash64(col("id")), lit(math.max(1L, n / 4096L))).as("cell"))

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("wall,recall").split(",").toSet
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val dims = 32
    val reps = 3

    // recall@10 of the approximate probes vs the exact baseline, on
    // mixture-of-clusters synthetic vectors (the regime IVF assumes) — the
    // speed numbers in the wall matrix are honest only next to this
    if (which("recall")) for (noise <- Seq(0.9, 2.0)) {
      val n = 200000L
      val nCells = math.max(1L, n / 4096L)
      // cell center + noise: at 0.9 the cluster structure dominates (the
      // regime IVF assumes — quantization is meaningful); at 2.0 the noise
      // dominates (diffuse data — the regime where nProbe must rise, i.e.
      // the honest failure mode of coarse quantization)
      val df = spark.range(n).select(
        col("id"),
        pmod(xxhash64(col("id")), lit(nCells)).as("cell")).select(
        col("id"), col("cell"),
        transform(
          sequence(lit(0), lit(dims - 1)),
          d => pmod(xxhash64(col("cell") * 131 + d), lit(2000003L)).cast("double")
            / 1000001.5 - 1.0 +
            (pmod(xxhash64(col("id") * 31 + d), lit(2000003L)).cast("double")
              / 1000001.5 - 1.0) * noise).as("vec")).cache()
      df.count()
      val queries = df.filter(col("id") % (n / 100) === 0).cache()
      queries.count()
      val exact = Similarity.bruteForceBatch(
          df, "id", "vec", queries, "id", "vec", k = 10, excludeSelf = true)
        .select(col("q_id"), col("id").as("nbr")).cache()
      exact.count()
      def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
        val hit = exact.join(
          approx.select(col("q_id"), col("id").as("nbr")), Seq("q_id", "nbr"))
        hit.count().toDouble / exact.count()
      }
      val index = Similarity.buildIvfIndex(df, "id", "vec", col("cell")).persisted()
      for (nProbe <- Seq(1, 2, 4)) {
        val r = recallOf(Similarity.probeIvf(
          index, queries, "id", "vec", k = 10, nProbe = nProbe, excludeSelf = true))
        println(f"[recall] noise=$noise%3.1f ivf  n=$n cells=$nCells nProbe=$nProbe recall@10=$r%5.3f")
      }
      index.unpersisted()
      for (planes <- Seq(8, 12)) {
        val lsh = Similarity.buildLshIndex(df, "id", "vec", planes, dims).persisted()
        val r = recallOf(Similarity.probeLsh(
          lsh, queries, "id", "vec", k = 10, excludeSelf = true))
        println(f"[recall] noise=$noise%3.1f lsh  n=$n planes=$planes%2d           recall@10=$r%5.3f")
        lsh.unpersisted()
      }
      // OR-amplification: T independent tables recover the recall a single
      // table's AND-construction loses
      for ((tables, planes) <- Seq((4, 8), (8, 8))) {
        val m = Similarity.buildLshIndexMulti(
          df, "id", "vec", tables, planes, dims).persisted()
        val r = recallOf(Similarity.probeLshMulti(
          m, queries, "id", "vec", k = 10, excludeSelf = true))
        println(f"[recall] noise=$noise%3.1f lshM n=$n tables=$tables%2d planes=$planes recall@10=$r%5.3f")
        m.unpersisted()
      }
      exact.unpersist(); queries.unpersist(); df.unpersist()
    }

    if (which("wall")) for (n <- Seq(500000L, 2000000L)) {
      val df = corpus(spark, n, dims).cache()
      df.count()
      val queries = df.filter(col("id") % (n / 100) === 0).cache() // 100 queries
      queries.count()

      // build once (timed), probes reuse the persisted assignment + codebook
      var t0 = System.nanoTime()
      val index = Similarity.buildIvfIndex(df, "id", "vec", col("cell")).persisted()
      val buildWall = (System.nanoTime() - t0) / 1e9

      // batch probe: 100 queries per job, repeated; report min wall / query
      val probeWall = (1 to reps).map { _ =>
        val t = System.nanoTime()
        noop(Similarity.probeIvf(index, queries, "id", "vec", k = 10,
          nProbe = 4, excludeSelf = true))
        (System.nanoTime() - t) / 1e9
      }.min
      // one-shot path (round-7 shape): full codebook pass inside each query
      t0 = System.nanoTime()
      noop(Similarity.ivfTopKOneShot(df, "id", "vec", "cell", 0L, 10, nProbe = 4))
      val oneShotWall = (System.nanoTime() - t0) / 1e9

      println(f"[ann] n=$n%8d cells=${math.max(1L, n / 4096L)}%5d " +
        f"build=$buildWall%6.2f s  probe(100q batch)=$probeWall%6.2f s " +
        f"(${probeWall / 100 * 1000}%6.1f ms/query)  " +
        f"oneShot ivfTopK=$oneShotWall%6.2f s/query")

      // LSH: build = one corpus bucket-assignment pass; probe hashes only
      // the query batch
      t0 = System.nanoTime()
      val lsh = Similarity.buildLshIndex(df, "id", "vec", nPlanes = 12,
        dims = dims).persisted()
      val lshBuild = (System.nanoTime() - t0) / 1e9
      val lshProbe = (1 to reps).map { _ =>
        val t = System.nanoTime()
        noop(Similarity.probeLsh(lsh, queries, "id", "vec", k = 10,
          excludeSelf = true))
        (System.nanoTime() - t) / 1e9
      }.min
      println(f"[ann] n=$n%8d lsh build=$lshBuild%6.2f s  " +
        f"probe(100q batch)=$lshProbe%6.2f s (${lshProbe / 100 * 1000}%6.1f ms/query)")

      index.unpersisted(); lsh.unpersisted()
      queries.unpersist(); df.unpersist()
    }

    // near-dup index claim under test: with the corpus's shingle/minhash/
    // band frame built ONCE, per-batch probe wall is governed by the batch
    // and its matched buckets — growing the corpus grows the BUILD linearly
    // but not the probe (candidates ∝ batch × bucket occupancy).
    if (which("neardup")) for (n <- Seq(100000L, 400000L)) {
      import graft.operators.Dedup
      def synthDocs(ids: org.apache.spark.sql.DataFrame) = ids.select(
        col("id"),
        concat_ws(" ", transform(sequence(lit(0), lit(39)), i =>
          concat(lit("w"), pmod(xxhash64(col("id") * 7919 + i), lit(5000L))))).as("text"))
      val corpus = synthDocs(spark.range(n).toDF()).cache(); corpus.count()
      // batch: 400 novel docs + 100 copies of corpus docs (planted dups)
      val batch = synthDocs(
        spark.range(n, n + 400L).select(col("id"))).unionByName(
        synthDocs(spark.range(100L).select(col("id")))
          .select((col("id") + 10000000L).as("id"),
            col("text"))).cache()
      batch.count()
      var t0 = System.nanoTime()
      val ndi = Dedup.buildNearDupIndex(corpus, "id", "text").persisted()
      val buildWall = (System.nanoTime() - t0) / 1e9
      val probeWall = (1 to reps).map { _ =>
        val t = System.nanoTime()
        noop(Dedup.probeNearDup(ndi, batch, "id", "text", threshold = 0.5))
        (System.nanoTime() - t) / 1e9
      }.min
      val hits = Dedup.probeNearDup(ndi, batch, "id", "text", threshold = 0.5).count()
      println(f"[neardup] n=$n%8d build=$buildWall%6.2f s  " +
        f"probe(500-doc batch)=$probeWall%6.2f s  pairs=$hits%4d")
      ndi.unpersisted(); corpus.unpersist(); batch.unpersist()
    }

    // t20/t21 claim under test: shuffle ∝ DISTINCT doc×token pairs (then ∝
    // vocabulary), NOT token occurrences — a corpus-common token is a hot
    // GROUP key the map-side combiner absorbs, never a hot join key (the
    // vocabulary side broadcasts). Zipf-ish corpus: u³ concentrates mass so
    // the head token draws ~10% of ALL occurrences — the regime where an
    // unguarded token join would straggle.
    if (which("text")) {
      import graft.operators.TextAnalysis
      val n = 200000L
      val tokensPerDoc = 60
      val docs = spark.range(n).select(
        col("id"),
        concat_ws(" ", transform(sequence(lit(0), lit(tokensPerDoc - 1)), i =>
          concat(lit("w"), floor(pow(
            pmod(xxhash64(col("id") * 1543 + i), lit(2000003L)).cast("double")
              / 2000003.0, 3.0) * 1000).cast("long")))).as("text")).cache()
      docs.count()
      val occurrences = n * tokensPerDoc
      val skew = new TaskSkewListener
      val vol = new ShuffleBytesListener
      spark.sparkContext.addSparkListener(skew)
      spark.sparkContext.addSparkListener(vol)
      for ((name, run) <- Seq[(String, () => DataFrame)](
        "t20_unigramLogProb" -> (() => TextAnalysis.unigramLogProb(docs, "id", "text")),
        "t21_pmiCollocations" -> (() => TextAnalysis.pmiCollocations(docs, "text", k = 20, minCount = 5)))) {
        skew.reset(); vol.reset()
        val t = System.nanoTime()
        noop(run())
        val wall = (System.nanoTime() - t) / 1e9
        Thread.sleep(1000) // listener bus drains asynchronously
        println(f"[text] $name n=$n docs × $tokensPerDoc tokens = $occurrences%,d occurrences; " +
          f"wall=$wall%5.2f s shuffle=${vol.records}%,d records / ${vol.bytes / 1e6}%6.1f MB " +
          f"(${vol.records.toDouble / occurrences}%5.3f records per occurrence)")
        skew.print(s"[text] $name")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
