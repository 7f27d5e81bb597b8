package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{AsOfJoin, Dedup, SkewJoin}

/** Round-7 scale-stress matrices (dev tooling → SCALE.md):
  *
  *  1. as-of join under key skew — plain (key-partitioned window) vs
  *     bucketed (key, time-bucket) form on a corpus where one key owns 30%
  *     of both sides: per-stage max/median task duration shows the plain
  *     form's single-task straggler and the bucketed form's balance.
  *  2. connected components on a CHAIN graph (worst-case diameter) —
  *     min-label propagation is O(diameter) rounds (fails loudly at its
  *     round cap), alternating star-contraction converges in O(log² n).
  *  3. salted skew join — max/median task duration vs nSalts with AQE's
  *     skew-join splitting disabled (the escape cases salting exists for).
  */
object ScaleStressR7 {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode(SaveMode.Overwrite).save()

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("asof,cc,salt").split(",").toSet
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val skew = new TaskSkewListener
    spark.sparkContext.addSparkListener(skew)
    import spark.implicits._

    if (which("asof")) {
      val dayUs = 86400000000L
      val nL = 4000000L; val nR = 200000L
      // 90% of rows on key 0 (a null/default key at 100 TB); remainder
      // uniform over 1k keys; times over one day
      def keyed(n: Long, idOff: Long) = spark.range(n).select(
        (col("id") + idOff).as("id"),
        when(pmod(xxhash64(col("id") + idOff), lit(10)) < 9, 0L)
          .otherwise(pmod(xxhash64(col("id") * 31 + idOff), lit(1000))).as("k"),
        pmod(xxhash64(col("id") * 131 + idOff), lit(dayUs)).as("t"))
      val left = keyed(nL, 0L).cache()
      val right = keyed(nR, 10000000L)
        .select(col("k").as("rk"), col("t").as("rt"), col("id").as("pk"),
          lit(1.0).as("v")).cache()
      left.count(); right.count()
      for (mode <- Seq("plain", "bucketed")) {
        skew.reset()
        val t0 = System.nanoTime()
        val out =
          if (mode == "plain")
            // autoSkewMinRows = 0: this arm MEASURES the plain plan's
            // hot-key behavior; round 8's default auto-router would
            // otherwise rescue exactly this input and compare bucketed
            // against bucketed
            AsOfJoin.asOf(left, right, Seq("k"), Seq("rk"), "t", "rt",
              Seq("pk", "v"), autoSkewMinRows = 0)
          else
            AsOfJoin.asOfBucketed(left, right, Seq("k"), Seq("rk"), "t", "rt",
              Seq("pk", "v"), bucketWidth = dayUs / 256)
        noop(out)
        println(f"[asof] $mode%-8s wall=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
          s"(left=$nL right=$nR, hot key 0 ~90%% of rows)")
        skew.print("[asof]  ", 4)
      }
      left.unpersist(); right.unpersist()
    }

    if (which("cc")) {
      for (n <- Seq(100000L, 400000L)) {
        val nodes = spark.range(n).select(col("id").as("node")).cache()
        val edges = spark.range(n - 1)
          .select(col("id").as("a"), (col("id") + 1).as("b")).cache()
        nodes.count(); edges.count()
        skew.reset()
        var t0 = System.nanoTime()
        val star = Dedup.connectedComponentsAlternating(nodes, "node", edges, "a", "b")
        val nStar = star.select(countDistinct(col("cluster_id"))).head().getLong(0)
        val starWall = (System.nanoTime() - t0) / 1e9
        println(f"[cc] star-contraction chain n=$n%7d wall=$starWall%7.2f s components=$nStar")
        t0 = System.nanoTime()
        val prop = try {
          Dedup.connectedComponents(nodes, "node", edges, "a", "b", maxIter = 15)
          "CONVERGED (unexpected on a chain)"
        } catch {
          case e: IllegalStateException =>
            f"failed loudly after 15 rounds in ${(System.nanoTime() - t0) / 1e9}%.2f s (diameter-bound: needs ~$n rounds)"
        }
        println(s"[cc] propagation     chain n=$n: $prop")
        nodes.unpersist(); edges.unpersist()
      }
    }

    if (which("bloom")) {
      // Bloom-pruned semi join vs plain, in the regime Bloom exists for:
      // the dim is too big to broadcast (SMJ/SHJ path) but selective
      // against the fact — the probe should collapse the fact-side
      // exchange to ~the answer size.
      val bytesL = new ShuffleBytesListener
      spark.sparkContext.addSparkListener(bytesL)
      val keySpace = 500000000L
      val fact = spark.range(20000000L).select(
        col("id").as("v"), pmod(xxhash64(col("id")), lit(keySpace)).as("fk")).cache()
      val dim = spark.range(5000000L).select(
        pmod(xxhash64(col("id") * 7919L), lit(keySpace)).as("dk")).cache()
      fact.count(); dim.count()
      // the build is one tree-aggregate over the DIM (per-partition 6 MB
      // sketches merging up) — a once-per-dim-snapshot cost, reused across
      // every query/micro-batch that probes it, so it's timed separately
      // from the per-query join
      bytesL.reset()
      var t0 = System.nanoTime()
      val bc = graft.operators.BloomJoin.buildFilter(
        dim, "dk", expectedItems = 5000000L)
      println(f"[bloom] build  wall=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"shuffleWrite=${bytesL.bytes / 1e6}%8.1f MB (5M keys, fpp=0.01)")
      val kept = fact
        .filter(graft.operators.BloomJoin.mightContain(bc, col("fk"))).count()
      for (mode <- Seq("plain", "bloom")) {
        bytesL.reset()
        t0 = System.nanoTime()
        val out =
          if (mode == "plain") fact.join(dim, fact("fk") === dim("dk"), "left_semi")
          else fact.filter(graft.operators.BloomJoin.mightContain(bc, col("fk")))
            .join(dim, fact("fk") === dim("dk"), "left_semi")
        noop(out)
        val wall = (System.nanoTime() - t0) / 1e9
        val rows = if (mode == "bloom") kept else 20000000L
        println(f"[bloom] $mode%-6s wall=$wall%6.2f s " +
          f"shuffleWrite=${bytesL.bytes / 1e6}%8.1f MB factRowsIntoJoin=$rows%,d " +
          s"(fact=20M over 500M keys, dim=5M keys ~1%% hit rate)")
      }
      fact.unpersist(); dim.unpersist()
    }

    if (which("salt")) {
      // the planner path salting exists for: AQE skew splitting off
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val nBig = 4000000L; val nDim = 100000L
      val big = spark.range(nBig).select(
        col("id"),
        when(pmod(xxhash64(col("id")), lit(2)) === 0, 0L)
          .otherwise(pmod(xxhash64(col("id") * 31), lit(nDim))).as("k")).cache()
      val dim = spark.range(nDim).select(
        col("id").as("k"), (col("id") * 2).as("payload")).cache()
      big.count(); dim.count()
      for (nSalts <- Seq(1, 8, 32)) {
        skew.reset()
        val t0 = System.nanoTime()
        noop(SkewJoin.saltedJoin(big, dim.hint("shuffle_hash"), Seq("k"), nSalts))
        println(f"[salt] nSalts=$nSalts%2d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
          s"(big=$nBig, hot key 0 ~50%%, dim=$nDim)")
        skew.print("[salt]  ", 3)
      }
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    }

    spark.stop()
  }
}
