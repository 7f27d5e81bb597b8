package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Round-9 scale soak (dev tooling → SCALE.md): the six most expensive
  * benched queries (q23 quantiles, c01/c02 curation compositions, d02
  * MinHash-LSH, d13 incremental near-dup, q32 one-pass profile) run at 1×
  * and `factor`× (default 10×) of sf0.1, recording wall and per-stage
  * max/median task balance.
  *
  * Claim under test: none of the six is superlinear in input size and none
  * develops task-balance blowup at 10× — their sf0.1 plans were audited
  * (round-8 verdict) but never soaked.
  *
  * Scaling discipline — the replicas must not fabricate structure:
  * - `lineitem`: order keys shifted per copy; `l_extendedprice` nudged by
  *   copy×1e-6 so distinct-value counts scale with rows (q32 profiles
  *   exact distincts).
  * - `documents`: doc ids shifted; copy k's text run through a rotation-k
  *   substitution cipher (`translate`) — length, whitespace, and
  *   WITHIN-COPY near-dup structure are preserved exactly, while
  *   cross-copy shingle overlap is destroyed, so d02/d13 pair counts
  *   scale linearly with copies instead of exploding quadratically on
  *   artificial cross-copy duplicates.
  * - `embeddings`: vec ids shifted; copies ≥ 1 jittered per element
  *   (deterministic ±0.025) so c02's semantic stages see new points, not
  *   exact clones.
  */
object ScaleStressR9 {

  private val defaultTargets = Seq(
    "q23_quantiles", "c01_curation", "c02_embedding_curation",
    "d02_minhash_lsh", "d13_incremental_neardup", "q32_profile")

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode(SaveMode.Overwrite).save()

  private def buildScaled(
      spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit = {
    val alpha = "abcdefghijklmnopqrstuvwxyz"

    val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$baseDir/orders.parquet")
    // one shift constant shared by BOTH tables so the l_orderkey→o_orderkey
    // FK stays intact in every copy (q41's referential gate, q42's graph)
    val maxOk = math.max(
      li.agg(max("l_orderkey")).head().getLong(0),
      ord.agg(max("o_orderkey")).head().getLong(0)) + 1
    (0 until factor).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k * maxOk))
        .withColumn("l_extendedprice", col("l_extendedprice") + lit(k * 1e-6))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/lineitem.parquet")

    // customers shift per copy (graph NODES scale with data); suppliers stay
    // shared across copies — the "many customers, few hosts" hub shape.
    // ONE custkey shift constant over BOTH tables' custkeys, mirroring the
    // maxOk treatment: not every customer appears in orders, so per-table
    // maxima can differ and would break the o_custkey→c_custkey FK in
    // replicated copies for any soak query joining the two.
    val cust = spark.read.parquet(s"$baseDir/customer.parquet")
    val maxCust = math.max(
      ord.agg(max("o_custkey")).head().getLong(0),
      cust.agg(max("c_custkey")).head().getLong(0)) + 1
    (0 until factor).map { k =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * maxOk))
        .withColumn("o_custkey", col("o_custkey") + lit(k * maxCust))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/orders.parquet")

    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      val rot = alpha.drop(k % 26) + alpha.take(k % 26)
      docs.withColumn("doc_id", col("doc_id") + lit(k * maxDoc))
        .withColumn("text", translate(col("text"), alpha, rot))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

    val ev = spark.read.parquet(s"$baseDir/events.parquet")
    val maxEv = ev.agg(max("event_id")).head().getLong(0) + 1
    val maxUser = ev.agg(max("user_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      // event-id parity drives q47's pre/post split — shift by an EVEN
      // constant so each copy keeps the same parity structure
      ev.withColumn("event_id", col("event_id") + lit(k * (maxEv + (maxEv % 2))))
        .withColumn("user_id", col("user_id") + lit(k * maxUser))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")

    (0 until factor).map { k =>
      cust.withColumn("c_custkey", col("c_custkey") + lit(k * maxCust))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/customer.parquet")

    // parts: keys shifted per copy, names rotation-k ciphered (the
    // documents treatment) — cross-copy name blocks diverge, so d20's
    // entity blocks scale in COUNT with the data, not in SIZE
    val part = spark.read.parquet(s"$baseDir/part.parquet")
    val maxPart = part.agg(max("p_partkey")).head().getLong(0) + 1
    (0 until factor).map { k =>
      val rot = alpha.drop(k % 26) + alpha.take(k % 26)
      part.withColumn("p_partkey", col("p_partkey") + lit(k * maxPart))
        .withColumn("p_name", translate(col("p_name"), alpha, rot))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/part.parquet")

    val embs = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val maxVec = embs.agg(max("vec_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      val shifted = embs.withColumn("vec_id", col("vec_id") + lit(k * maxVec))
      if (k == 0) shifted
      else shifted.withColumn(
        "embedding",
        transform(col("embedding"), (x, i) =>
          (x.cast("double") +
            (pmod(xxhash64(col("vec_id") * 31 + i * 7 + k), lit(1000L))
              .cast("double") / 1000.0 - 0.5) * 0.05).cast("float")))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val targets = args.lift(2)
      .map(_.split(",").toSeq).getOrElse(defaultTargets)
    require(factor >= 2 && factor <= 26,
      s"factor must be in [2, 26] (cipher rotations are mod 26), got $factor")
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val outDir = s"/tmp/graft_scale${factor}x"

    var t0 = System.nanoTime()
    buildScaled(spark, baseDir, outDir, factor)
    println(f"[r9-soak] scaled tables built (${factor}x) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s at $outDir")

    val skew = new TaskSkewListener
    spark.sparkContext.addSparkListener(skew)
    val qs = SparkEntry.queries
    // JIT/codegen warm-up outside any timed region (Bench's discipline)
    noop(qs("d02_minhash_lsh")(spark, "/root/testdata/sf0.01"))

    val walls = scala.collection.mutable.Map.empty[(String, String), Double]
    for ((label, dir) <- Seq("1x" -> baseDir, s"${factor}x" -> outDir);
         name <- targets) {
      val w = (1 to 2).map { _ =>
        skew.reset()
        val t = System.nanoTime()
        noop(qs(name)(spark, dir))
        (System.nanoTime() - t) / 1e9
      }.min
      walls((name, label)) = w
      println(f"[r9-soak] $label%4s $name%-24s wall=$w%7.2f s")
      skew.print(s"[r9-soak] $label $name", 3)
      spark.catalog.clearCache()
    }
    println(f"[r9-soak] ---- wall growth at ${factor}x data ----")
    for (name <- targets) {
      val r = walls((name, s"${factor}x")) / walls((name, "1x"))
      println(f"[r9-soak] $name%-24s 1x=${walls((name, "1x"))}%7.2f s " +
        f"${factor}x=${walls((name, s"${factor}x"))}%7.2f s growth=$r%5.2f x" +
        (if (r > factor * 1.5) "  <-- SUPERLINEAR" else ""))
    }
    spark.stop()
  }
}
