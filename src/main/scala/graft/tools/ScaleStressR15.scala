package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Round-15 soak: the 100× DECADE (round-14 verdict task 3 — the 100 TB
  * claims rested on 10× evidence; this runs 1× / 10× / 100× of sf0.1 for
  * six core-cost-shape representatives and prints the same wall +
  * per-stage max/median task-balance audit the 10× sweeps run).
  *
  * Replica discipline = [[ScaleStressR9]]'s FK-safe shifted copies with
  * ONE upgrade: text/name copies are ciphered with per-copy AFFINE
  * substitutions (`i → a·i + b mod 26`, a coprime to 26 — 312 distinct
  * permutations) instead of the 26 rotations, because at factor > 26 two
  * rotation-ciphered copies 26 apart would carry IDENTICAL text and
  * re-introduce the artificial cross-copy near-dup pairs the cipher
  * exists to prevent (d02's pair count must scale linearly with copies).
  * Length, whitespace, and within-copy structure are preserved exactly,
  * as before. */
object ScaleStressR15 {

  private val defaultTargets = Seq(
    "q60_hll_distinct", "q88_prune_manifest", "d02_minhash_lsh",
    "q95_kll_cube", "q90_bootstrap_ci", "t14_packing")

  // both cases covered (round-15 advice: a lowercase-only translate would
  // leave uppercase-heavy text identical across copies and re-introduce
  // exactly the artificial cross-copy near-dup pairs the cipher prevents)
  private val alpha = "abcdefghijklmnopqrstuvwxyz" +
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Copy k's substitution alphabet: affine map `i → a·i + b (mod 26)`
    * with `a = coprimes(k / 26)`, `b = k mod 26` — injective per copy,
    * distinct permutations for every k < 312; the SAME permutation is
    * applied to the uppercase half so case never leaks identity. */
  private def cipher(k: Int): String = {
    val a = coprimes((k / 26) % coprimes.size)
    val b = k % 26
    val lower = (0 until 26).map(i => alpha((a * i + b) % 26)).mkString
    lower + lower.toUpperCase
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode(SaveMode.Overwrite).save()

  /** Documents-only replica build (the d02 soak's input — no other table
    * needed): doc_id-shifted, per-copy affine-ciphered text. Shared with
    * [[ScaleStressR16]]. */
  def buildDocsScaled(
      spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit = {
    require(factor >= 2 && factor <= 312,
      s"factor must be in [2, 312] (affine cipher family size), got $factor")
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * maxDoc))
        .withColumn("text", translate(col("text"), alpha, cipher(k)))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
  }

  private def buildScaled(
      spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit = {
    val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$baseDir/orders.parquet")
    val maxOk = math.max(
      li.agg(max("l_orderkey")).head().getLong(0),
      ord.agg(max("o_orderkey")).head().getLong(0)) + 1
    (0 until factor).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k * maxOk))
        .withColumn("l_extendedprice", col("l_extendedprice") + lit(k * 1e-6))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/lineitem.parquet")

    val cust = spark.read.parquet(s"$baseDir/customer.parquet")
    val maxCust = math.max(
      ord.agg(max("o_custkey")).head().getLong(0),
      cust.agg(max("c_custkey")).head().getLong(0)) + 1
    (0 until factor).map { k =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * maxOk))
        .withColumn("o_custkey", col("o_custkey") + lit(k * maxCust))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/orders.parquet")
    (0 until factor).map { k =>
      cust.withColumn("c_custkey", col("c_custkey") + lit(k * maxCust))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/customer.parquet")

    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * maxDoc))
        .withColumn("text", translate(col("text"), alpha, cipher(k)))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

    val ev = spark.read.parquet(s"$baseDir/events.parquet")
    val maxEv = ev.agg(max("event_id")).head().getLong(0) + 1
    val maxUser = ev.agg(max("user_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      ev.withColumn("event_id", col("event_id") + lit(k * (maxEv + (maxEv % 2))))
        .withColumn("user_id", col("user_id") + lit(k * maxUser))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")

    val part = spark.read.parquet(s"$baseDir/part.parquet")
    val maxPart = part.agg(max("p_partkey")).head().getLong(0) + 1
    (0 until factor).map { k =>
      part.withColumn("p_partkey", col("p_partkey") + lit(k * maxPart))
        .withColumn("p_name", translate(col("p_name"), alpha, cipher(k)))
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
    val factors = args.lift(1).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(10, 100))
    val targets = args.lift(2)
      .map(_.split(",").toSeq).getOrElse(defaultTargets)
    require(factors.forall(f => f >= 2 && f <= 312),
      s"factors must be in [2, 312] (affine cipher family size), got $factors")
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")

    val dirs = ("1x" -> baseDir) +: factors.map { f =>
      val outDir = s"/tmp/graft_scale_r15_${f}x"
      val t0 = System.nanoTime()
      buildScaled(spark, baseDir, outDir, f)
      println(f"[r15-soak] scaled tables built (${f}x) in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s at $outDir")
      s"${f}x" -> outDir
    }

    val skew = new TaskSkewListener
    spark.sparkContext.addSparkListener(skew)
    val qs = SparkEntry.queries
    noop(qs("d02_minhash_lsh")(spark, "/root/testdata/sf0.01")) // warm-up

    val walls = scala.collection.mutable.Map.empty[(String, String), Double]
    for ((label, dir) <- dirs; name <- targets) {
      val w = (1 to 2).map { _ =>
        skew.reset()
        val t = System.nanoTime()
        noop(qs(name)(spark, dir))
        val wall = (System.nanoTime() - t) / 1e9
        // shuffle files live until the ContextCleaner GCs the backing
        // RDDs; at 100× one d02 rep writes tens of GB, so two legs of
        // uncollected shuffle exhausted /tmp (observed: ENOSPC mid-rep).
        // Force the GC → async cleaner turn between reps, outside the
        // timed region.
        System.gc(); Thread.sleep(6000)
        wall
      }.min
      walls((name, label)) = w
      println(f"[r15-soak] $label%5s $name%-24s wall=$w%8.2f s")
      skew.print(s"[r15-soak] $label $name", 3)
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(6000)
    }
    println(f"[r15-soak] ---- wall growth across the decades ----")
    for (name <- targets) {
      val cols = dirs.map { case (label, _) =>
        f"$label=${walls((name, label))}%8.2f s" }.mkString(" ")
      val top = factors.max
      val r = walls((name, s"${top}x")) / walls((name, "1x"))
      println(f"[r15-soak] $name%-24s $cols growth(${top}x)=$r%6.2f x" +
        (if (r > top * 1.5) "  <-- SUPERLINEAR" else ""))
    }
    spark.stop()
  }
}
