package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and prints
  * one JSON line. Uses the noop sink so every projected expression is
  * actually computed (a bare count() would let Catalyst prune the metric
  * math out of the plan). */
object Bench {

  /** FULL coverage: every declared query is benched, so every operator has
    * a per-round regression signal (round-8 verdict task 2 — the curated
    * 65-query subset left 34 queries signal-free). Sorted for a stable
    * cross-round key order; q01 stays the box-drift ratio base. */
  val headline: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    val qs = SparkEntry.queries
    // Untimed warm-up: JVM/codegen/classloader one-time costs otherwise land
    // entirely on whichever query runs first (q01 measured 3.4s cold vs ~0.5s
    // warm for a 4-column scan).
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    // ... and the dedup kernel paths: the per-doc/per-pair kernels run
    // interpreted until C2 kicks in — profiled 62 CPU-s cold vs 2 CPU-s warm
    // for the SAME 1.5 MB cache build — so a 200-doc pass through the
    // minhash and token-jaccard pipelines pays the JIT cost outside the
    // timed region (one-time cost, not steady-state throughput).
    // best-effort: a missing documents table must not abort the whole bench
    try {
      val warmDocs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
      graft.operators.Dedup.minHashLshPairs(warmDocs, "doc_id", "text", threshold = 0.5)
        .write.format("noop").mode("overwrite").save()
      graft.operators.Dedup.ngramJaccardPairs(
          warmDocs, "doc_id", "text",
          Seq(org.apache.spark.sql.functions.lit(1)), threshold = 0.8)
        .write.format("noop").mode("overwrite").save()
    } catch {
      case e: Throwable => System.err.println(s"[bench] kernel warm-up skipped: $e")
    }
    spark.catalog.clearCache()
    // Repeats: box throughput drifts ±50-60% across hours, and even within a
    // run one GC or page-cache hiccup can move a single measurement ±25%
    // (round 6's q01 "+23%" was exactly this). min-of-3 is the stable
    // estimator — noise only ever ADDS time — so `queries`/`value` publish
    // mins; means ride along for drift visibility.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val samples: Seq[Seq[(String, Either[String, Double])]] =
      (0 until reps).map { _ =>
        headline.filter(qs.contains).map { name =>
          val t0 = System.nanoTime()
          val r = try {
            qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
            Right((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: $e")
              Left(e.toString.takeWhile(_ != '\n'))
          }
          // release caches a query left behind (the dedup builders persist
          // intermediates) so one query's cache pressure can't skew the next
          spark.catalog.clearCache()
          name -> r
        }
      }
    val byName = samples.flatten.groupBy(_._1)
    val order = headline.filter(byName.contains)
    // a query that failed in ANY rep is excluded and reported
    val failures = order.flatMap(n =>
      byName(n).collectFirst { case (_, Left(e)) => n -> e })
    val failed = failures.map(_._1).toSet
    val ok = order.filterNot(failed).map { n =>
      n -> byName(n).collect { case (_, Right(v)) => v }.min
    }
    val okMean = order.filterNot(failed).map { n =>
      val vs = byName(n).collect { case (_, Right(v)) => v }
      n -> vs.sum / vs.size
    }
    // control chars included: a Spark analysis error's tab/CR in
    // failure_detail must not break the machine-readable JSON channel
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qJson = ok
      .map { case (k, v) => jstr(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val qMeanJson = okMean
      .map { case (k, v) => jstr(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fJson = failures.map(f => jstr(f._1)).mkString("[", ",", "]")
    val fDetail = failures
      .map { case (k, e) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    // a failed query is EXCLUDED from `queries`/total and listed in
    // `failures` (reason in `failure_detail`) + nonzero exit — erroring
    // instantly must not read as fast
    val total = ok.map(_._2).sum
    // box-drift normalization: each query over the trivial q01 scan. Box
    // throughput drifts ±50-60% across hours, so absolute times are only
    // comparable within one run; the ratios survive across rounds (SCALE.md
    // caveat). q01 itself is always 1.0 when present.
    val rJson = ok.toMap.get("q01_project").filter(_ > 0)
      .map(base => ok.map { case (k, v) => jstr(k) + ":" + f"${v / base}%.3f" }
        .mkString("{", ",", "}"))
      .getOrElse("{}")
    // INFORMATIONAL shared-scan pass (round-9 verdict task 7): the
    // components family (d06/d07/d10/d16/d18) recomputes the same minhash
    // pair table — and three of them the same component labels — per
    // standalone entry, because the official bench shape is
    // one-query-per-entry with no cross-query materialization. This pass
    // measures each consumer's MARGINAL cost against ONE materialized pair
    // table / label frame, the way a production dedup pipeline would
    // actually run them. One rep, reported in `shared_scan`; the official
    // `queries`/`value` metrics above stay standalone.
    val sharedJson = (try {
      import org.apache.spark.sql.functions.{col, expr}
      import graft.operators.{Dedup, TextAnalysis}
      def timed[A](body: => A): (Double, A) = {
        val t0 = System.nanoTime()
        val a = body
        ((System.nanoTime() - t0) / 1e9, a)
      }
      def noop(f: org.apache.spark.sql.DataFrame): Unit =
        f.write.format("noop").mode("overwrite").save()
      val documents = spark.read.parquet(s"$sfDir/documents.parquet")
      val ids = documents.select("doc_id")
      val (tPairs, pairs) = timed {
        val p = Dedup.minHashLshPairs(documents, "doc_id", "text", threshold = 0.5)
          .select("a_id", "b_id").persist()
        p.count() // materialize; the builder's managed caches release here
        p
      }
      val (tD06, labels) = timed {
        val l = Dedup.connectedComponents(ids, "doc_id", pairs, "a_id", "b_id")
          .persist()
        l.count()
        l
      }
      val (tD07, _) = timed(noop(
        Dedup.connectedComponentsAlternating(ids, "doc_id", pairs, "a_id", "b_id")))
      val (tD10, _) = timed(noop(
        Dedup.canonicalByCluster(
          labels.join(
            documents.select(
              col("doc_id"), TextAnalysis.tokenCount(col("text")).as("_n_toks")),
            Seq("doc_id")),
          "doc_id", "cluster_id", "_n_toks")
          .select("doc_id", "cluster_id", "keeper_id", "kept")))
      val (tD16, _) = timed(noop(
        Dedup.clusterSizeHistogram(labels, "cluster_id")))
      val (tD18, _) = timed(noop(
        Dedup.pairSetMetrics(
          Dedup.ngramJaccardPairs(
            documents, "doc_id", "text",
            Seq(col("lang"), expr("n_chars div 100")), threshold = 0.5),
          pairs, "a_id", "b_id")))
      pairs.unpersist(); labels.unpersist()
      spark.catalog.clearCache()
      Seq(
        "pairs_build" -> tPairs, "d06_components" -> tD06,
        "d07_components_star" -> tD07, "d10_canonical" -> tD10,
        "d16_cluster_sizes" -> tD16, "d18_dedup_eval" -> tD18)
        .map { case (k, v) => jstr(k) + ":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] shared-scan pass skipped: $e")
        "{}"
    })
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","repeats":$reps,"queries":$qJson,"queries_mean":$qMeanJson,"ratios_vs_q01":$rJson,"shared_scan":$sharedJson,"failures":$fJson,"failure_detail":$fDetail,"sf":"$sfDir"}"""
    // stdout AND a file: sbt's log decoration ([info] prefixes) makes the
    // printed line unparseable to callers that scrape stdout, so the file is
    // the machine-readable channel.
    println(line)
    // A second, COMPACT summary line: the full line has outgrown tail-window
    // scrapers (≈5 KB at 150+ queries — a caller keeping the last ~4 KB of
    // stdout sees it head-truncated and unparseable). The compact line is a
    // few hundred bytes, printed after the full one, so a scraper that takes
    // the last parseable JSON line always gets at least the headline metric;
    // per-query detail stays in the full line and the output file.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","repeats":$reps,"n_queries":${ok.size},"failures":$fJson,"sf":"$sfDir"}"""
    println(compact)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
