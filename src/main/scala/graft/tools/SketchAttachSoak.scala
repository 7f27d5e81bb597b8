package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSession
import graft.streaming.{StreamingBloom, StreamingBt, StreamingCms, StreamingHll, StreamingKmv, StreamingMg, StreamingQuantiles}

/** Streaming sketch-attach soak (round-11 → SCALE.md): the design claim
  * behind all three sketch attaches (HLL, CMS, KMV) is BOUNDED state —
  * the staged frame never grows with the stream, only with the sketch
  * parameters — so per-trigger cost must stay flat as triggers
  * accumulate. This drives each attach through `triggers` triggers of
  * `perTrigger` rows (fresh values each trigger — the worst case for a
  * sketch: state saturates to its cap instead of deduplicating away) and
  * prints per-trigger walls + committed state row counts. Round 12 adds
  * the newer family members: q-digest quantiles (state ≤ groups × 3k
  * nodes), Misra-Gries heavy hitters (state ≤ groups × (k+1) rows —
  * driven with FRESH items every trigger, the adversarial vocabulary that
  * unbounds exact top-terms state), Bloom membership (state ≤ groups ×
  * mBits/32 words however many values fold in), and Bradley–Terry
  * (state = the pair-count sufficient statistic, ≤ items² rows however
  * many trials stream).
  *
  * Healthy output: walls flat from first to last trigger (the per-trigger
  * work is one batch aggregate + one parameter-sized merge), state rows
  * at the cap (HLL: groups × ≤2^p; CMS: ≤ groups × depth × width; KMV:
  * groups × k) and NOT growing after saturation. */
object SketchAttachSoak {
  def main(args: Array[String]): Unit = {
    val perTrigger = args.lift(0).map(_.toInt).getOrElse(20000)
    val triggers = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = GraftSession.build("local[32]", "graft-sketch-soak", 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def tmp(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"sketch-soak-$tag").toString

    def drive(
        name: String,
        attach: (org.apache.spark.sql.DataFrame, String, String) =>
          org.apache.spark.sql.streaming.StreamingQuery,
        stateRows: String => Long): Unit = {
      val statePath = tmp(s"$name-state") + "/state"
      val ckpt = tmp(s"$name-ckpt")
      val stream = MemoryStream[(String, String)](spark)
      val q = attach(stream.toDF().toDF("g", "v"), statePath, ckpt)
      var nextVal = 0L
      val walls = (0 until triggers).map { t =>
        val rows = (0 until perTrigger).map { _ =>
          nextVal += 1
          (if (nextVal % 2 == 0) "a" else "b", s"v_$nextVal")
        }
        val t0 = System.nanoTime()
        stream.addData(rows: _*)
        q.processAllAvailable()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[sketch-soak] $name%-4s trigger $t%2d wall=$w%6.2f s state=${stateRows(statePath)}%7d rows")
        w
      }
      q.stop()
      val head = walls.take(3).min
      val tail = walls.takeRight(3).min
      println(f"[sketch-soak] $name%-4s min(first 3)=$head%.2f s min(last 3)=$tail%.2f s growth=${tail / head}%.2f x")
    }

    drive("hll",
      (df, st, ck) => StreamingHll.attach(df, Seq("g"), "v", p = 10, st, ck)((_, _) => ()),
      st => StreamingHll.currentRegisters(spark, st).map(_.count()).getOrElse(0L))
    drive("cms",
      (df, st, ck) => StreamingCms.attach(df, Seq("g"), "v", depth = 4, width = 1024, st, ck)((_, _) => ()),
      st => StreamingCms.currentRegisters(spark, st).map(_.count()).getOrElse(0L))
    drive("kmv",
      (df, st, ck) => StreamingKmv.attach(df, Seq("g"), "v", k = 1024, st, ck)((_, _) => ()),
      st => StreamingKmv.currentSketch(spark, st).map(_.count()).getOrElse(0L))
    // numeric value stream for quantiles: fresh values each trigger
    drive("qdig",
      (df, st, ck) => StreamingQuantiles.attach(
        df.selectExpr("g", "CAST(length(v) * 1000 + abs(hash(v)) % 997 AS DOUBLE) AS v"),
        Seq("g"), "v", lo = 0.0, hi = 20000.0, bits = 12, k = 512,
        Seq("p50" -> 0.5, "p95" -> 0.95), st, ck)((_, _) => ()),
      st => StreamingQuantiles.currentRegisters(spark, st).map(_.count()).getOrElse(0L))
    drive("mg",
      (df, st, ck) => StreamingMg.attach(df, Seq("g"), "v", k = 64, st, ck)((_, _) => ()),
      st => StreamingMg.currentState(spark, st).map(_.count()).getOrElse(0L))
    // round 12: Bloom membership (state <= groups x mBits/32 words) and
    // Bradley-Terry (state <= items^2 pair counts; winner/loser drawn from
    // a fixed 32-item roster so trials accumulate, state doesn't)
    drive("blm",
      (df, st, ck) => StreamingBloom.attach(
        df, Seq("g"), "v", mBits = 1 << 16, k = 3, st, ck)((_, _) => ()),
      st => StreamingBloom.currentRegisters(spark, st).map(_.count()).getOrElse(0L))
    drive("bt",
      (df, st, ck) => StreamingBt.attach(
        df.selectExpr(
          "concat('item_', abs(hash(v)) % 32) AS winner",
          "concat('item_', abs(hash(v, g)) % 32) AS loser"),
        "winner", "loser", iters = 3, st, ck)((_, _) => ()),
      st => StreamingBt.currentCounts(spark, st).map(_.count()).getOrElse(0L))

    spark.stop()
  }
}
