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
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val dims = 32
    val reps = 3

    for (n <- Seq(500000L, 2000000L)) {
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
      noop(Similarity.ivfTopK(df, "id", "vec", "cell", 0L, 10, nProbe = 4))
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
    spark.stop()
  }
}
