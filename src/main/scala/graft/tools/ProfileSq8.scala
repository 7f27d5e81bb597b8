package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity

/** Round-8 SQ8 evidence (dev tooling → SCALE.md).
  *
  * Claims under test:
  *  1. BYTES — the coded corpus's at-rest footprint is ~¼ of the raw
  *     vectors' (1-byte codes vs float32), measured as parquet bytes of
  *     `(id, code)` vs `(id, vec)` on the same data.
  *  2. WALL — with the compressed index built once and persisted, the
  *     pruned probe ([[Similarity.probeSq8Ivf]]) stays flat as the corpus
  *     grows (constant cell occupancy), while the flat ADC scan
  *     ([[Similarity.probeSq8]]) scales with n — same discipline as the
  *     uncompressed round-8 matrix (ScaleStressR8), now over codes.
  *  3. HONESTY — reconstruct-on-the-fly is extra CPU per candidate; on a
  *     hot in-memory corpus the coded flat scan can LOSE to the raw brute
  *     force. The byte win is an I/O-bound / storage-bound win (the 100 TB
  *     regime, where the corpus cannot be resident), not a hot-CPU win —
  *     both numbers are printed side by side.
  */
object ProfileSq8 {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode(SaveMode.Overwrite).save()

  private def timeMin(reps: Int)(body: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min

  /** Deterministic corpus: n vectors × dims in [−1, 1], constant 4096-vector
    * cell occupancy (nCells ∝ n — the IVF discipline). */
  private def corpus(spark: SparkSession, n: Long, dims: Int): DataFrame =
    spark.range(n).select(
      col("id"),
      transform(
        sequence(lit(0), lit(dims - 1)),
        d => pmod(xxhash64(col("id") * 31 + d), lit(2000003L)).cast("double")
          / 1000001.5 - 1.0).as("vec"),
      pmod(xxhash64(col("id")), lit(math.max(1L, n / 4096L))).as("cell"))

  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val dims = 64
    val reps = 3

    // ---- 1. bytes: raw float32 vs SQ8 codes, parquet at rest -------------
    {
      val n = 400000L
      val df = corpus(spark, n, dims)
        .select(col("id"), col("vec").cast("array<float>").as("vec"), col("cell"))
      val index = Similarity.buildSq8Index(df, "id", "vec")
      val rawPath = "/tmp/sq8_raw_parquet"
      val codePath = "/tmp/sq8_code_parquet"
      val signPath = "/tmp/sign_bits_parquet"
      df.select("id", "vec").write.mode(SaveMode.Overwrite).parquet(rawPath)
      index.codes.write.mode(SaveMode.Overwrite).parquet(codePath)
      Similarity.buildSignIndex(df, "id", "vec", dims).bits
        .write.mode(SaveMode.Overwrite).parquet(signPath)
      val (rb, cb, sb) = (dirBytes(rawPath), dirBytes(codePath), dirBytes(signPath))
      println(f"[bytes] n=$n dims=$dims raw=${rb / 1e6}%.1f MB codes=${cb / 1e6}%.1f MB (${rb.toDouble / cb}%.2f×) signBits=${sb / 1e6}%.1f MB (${rb.toDouble / sb}%.2f×)")
    }

    // ---- 1b. recall ladder: what each compression level costs in recall --
    // clustered synthetic (the regime embeddings live in), recall@10 vs the
    // exact full-precision baseline via Similarity.recallAtK
    {
      val n = 200000L
      val nCells = math.max(1L, n / 4096L)
      for (noise <- Seq(0.9, 2.0)) {
        val df = spark.range(n).select(
          col("id"), pmod(xxhash64(col("id")), lit(nCells)).as("cell")).select(
          col("id"), col("cell"),
          transform(
            sequence(lit(0), lit(dims - 1)),
            d => (pmod(xxhash64(col("cell") * 131 + d), lit(2000003L)).cast("double")
              / 1000001.5 - 1.0)
              + (pmod(xxhash64(col("id") * 17 + d), lit(2000003L)).cast("double")
                / 1000001.5 - 1.0) * noise).as("vec")).persist()
        df.count()
        val queries = df.filter(col("id") % (n / 100L) === 0L).persist()
        queries.count()
        val exact = Similarity.bruteForceBatch(
          df, "id", "vec", queries, "id", "vec", k = 10).persist()
        exact.count()
        def recall(approx: org.apache.spark.sql.DataFrame): Double = {
          val r = Similarity.recallAtK(exact, approx, "id")
            .agg(avg(col("recall"))).collect().head.getDouble(0)
          math.round(r * 1000) / 1000.0
        }
        val sq8 = Similarity.buildSq8Index(df, "id", "vec").persisted()
        val sq8Ivf = Similarity.buildSq8IvfIndex(df, "id", "vec", col("cell")).persisted()
        val sign = Similarity.buildSignIndex(df, "id", "vec", dims).persisted()
        val rSq8 = recall(Similarity.probeSq8(sq8, queries, "id", "vec", 10,
          guardBroadcast = false))
        val rIvf = recall(Similarity.probeSq8Ivf(sq8Ivf, queries, "id", "vec", 10,
          nProbe = 8, guardBroadcast = false))
        val rSign = recall(Similarity.probeSign(sign, queries, "id", "vec", 10,
          guardBroadcast = false))
        // sign shortlist 100 → exact rerank: the s14 funnel over the 32× index
        val shortlist = Similarity.probeSign(sign, queries, "id", "vec", 100,
            guardBroadcast = false)
          .select(col("q_id").as("_q_id"), col("id"))
        val rFunnel = recall(Similarity.rerankExact(
          df, "id", "vec", shortlist, queries, "id", "vec", 10))
        println(f"[recall] n=$n noise=$noise sq8Flat=$rSq8%.3f sq8Ivf(nProbe=8)=$rIvf%.3f signHamming=$rSign%.3f signFunnel(100→10)=$rFunnel%.3f")
        sq8.unpersisted(); sq8Ivf.unpersisted(); sign.unpersisted()
        exact.unpersist(); queries.unpersist(); df.unpersist()
      }
    }

    // ---- 2+3. wall: flat ADC scan vs pruned probe vs raw brute force -----
    for (n <- Seq(200000L, 400000L, 800000L)) {
      val df = corpus(spark, n, dims).persist()
      df.count()
      val queries = df.filter(col("id") % (n / 100L) === 0L).persist()
      queries.count()
      val sq8 = Similarity.buildSq8Index(df, "id", "vec").persisted()
      val ivf = Similarity.buildSq8IvfIndex(df, "id", "vec", col("cell")).persisted()
      val tFlat = timeMin(reps)(noop(
        Similarity.probeSq8(sq8, queries, "id", "vec", k = 10)))
      val tIvf = timeMin(reps)(noop(
        Similarity.probeSq8Ivf(ivf, queries, "id", "vec", k = 10, nProbe = 8,
          guardBroadcast = false)))
      val tBrute = timeMin(reps)(noop(
        Similarity.bruteForceBatch(df, "id", "vec", queries, "id", "vec", k = 10)))
      val sign = Similarity.buildSignIndex(df, "id", "vec", dims).persisted()
      val tSign = timeMin(reps)(noop(
        Similarity.probeSign(sign, queries, "id", "vec", k = 10,
          guardBroadcast = false)))
      println(f"[wall] n=$n queries=100 flatSq8=$tFlat%.2f s ivfSq8(nProbe=8)=$tIvf%.2f s rawBrute=$tBrute%.2f s signHamming=$tSign%.2f s")
      sign.unpersisted()
      sq8.unpersisted(); ivf.unpersisted()
      queries.unpersist(); df.unpersist()
    }
    spark.stop()
  }
}
