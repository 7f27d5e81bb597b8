package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.streaming.StreamingDedup

/** Streaming dedup-clustering soak (round-10 → SCALE.md): drives
  * [[StreamingDedup.attachNearDupClustering]] across a growing stream and
  * answers its three scale questions —
  *  1. per-trigger wall as history grows (the probe term is the
  *     self-extending scan; the component fold must stay batch-sized);
  *  2. relabel-map growth (merges accumulate over stream lifetime; the map
  *     must stay ∝ merge count, a tiny fraction of docs);
  *  3. END-STATE EXACTNESS at volume: after every trigger, the
  *     incremental labels must equal one batch
  *     [[Dedup.connectedComponents]] run over the union corpus.
  *
  * Corpus: `base` docs with planted dup groups; each trigger plants 2%
  * dups of earlier stream docs (growing clusters + occasional multi-way
  * merges via docs matching two earlier singletons of the same seed). */
object ClusteringSoak {
  def main(args: Array[String]): Unit = {
    val base = args.lift(0).map(_.toInt).getOrElse(10000)
    val perTrigger = args.lift(1).map(_.toInt).getOrElse(1000)
    val triggers = args.lift(2).map(_.toInt).getOrElse(12)
    val spark = GraftSession.build("local[32]", "graft-clustering-soak", 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def doc(i: Long, seed: Int): (Long, String) = {
      val r = new scala.util.Random(seed)
      (i, Seq.fill(30)(s"tok${r.nextInt(2000000)}").mkString(" "))
    }
    val baseRows = (0 until base).map(i => doc(i.toLong, i))
    val baseDocs = baseRows.toDF("doc_id", "text")
    val index = Dedup.buildNearDupIndex(baseDocs, "doc_id", "text").persisted()
    val baseLabels = Dedup.connectedComponents(
      baseDocs.select("doc_id"), "doc_id",
      Dedup.minHashLshPairs(baseDocs, "doc_id", "text", threshold = 0.5)
        .select("a_id", "b_id"),
      "a_id", "b_id").persist()
    baseLabels.count()
    val statePath = java.nio.file.Files.createTempDirectory("clu-soak").toString + "/state"

    val rng = new scala.util.Random(23)
    var nextId = 1000000L
    // counter-derived fresh seeds: unique by construction (the
    // StreamingExtendSoak birthday-collision lesson)
    var freshSeed = 600000000
    var streamSeeds = Vector.empty[Int] // seeds of STRICTLY earlier triggers
    var allRows = baseRows
    def trigRows(): Seq[(Long, String)] = {
      val earlier = streamSeeds
      var fresh = Vector.empty[Int]
      val rows = (0 until perTrigger).map { _ =>
        nextId += 1
        val seed =
          if (earlier.nonEmpty && rng.nextInt(50) == 0)
            earlier(rng.nextInt(earlier.size))
          else { freshSeed += 1; fresh :+= freshSeed; freshSeed }
        doc(nextId, seed)
      }
      streamSeeds ++= fresh
      allRows ++= rows
      rows
    }

    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.attachNearDupClustering(
      stream.toDF().toDF("doc_id", "text"), index, baseLabels,
      "doc_id", "text", threshold = 0.5, statePath,
      java.nio.file.Files.createTempDirectory("clu-ckpt").toString) {
      (out, _) => out.count(); ()
    }
    val walls = try {
      (1 to triggers).map { t =>
        stream.addData(trigRows())
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val w = (System.nanoTime() - t0) / 1e9
        if (t % 4 == 0 || t == 1)
          println(f"[clu-soak] trigger $t%3d wall=$w%5.2f s (stream docs=${t.toLong * perTrigger})")
        w
      }
    } finally q.stop()
    println(f"[clu-soak] triggers 1-4 mean=${walls.take(4).sum / 4}%5.2f s; " +
      f"last-4 mean=${walls.takeRight(4).sum / 4}%5.2f s")

    // end-state exactness vs ONE batch component run over the union corpus
    val got = StreamingDedup.currentClusterLabels(
        spark, baseLabels, "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = allRows.toDF("doc_id", "text")
    val expect = Dedup.connectedComponents(
        all.select("doc_id"), "doc_id",
        Dedup.minHashLshPairs(all, "doc_id", "text", threshold = 0.5)
          .select("a_id", "b_id"),
        "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[clu-soak] docs=${got.size} distinct_labels=${got.groupBy(_._2).size} " +
      s"exact_match_vs_batch=${got == expect}")
    val relabelDir = new java.io.File(s"$statePath/relabel")
    val relabelSize = Option(relabelDir.listFiles()).map(_.toSeq)
      .getOrElse(Seq.empty).filter(_.getName.startsWith("_batch="))
      .map(d => Option(d.listFiles()).map(_.map(_.length()).sum).getOrElse(0L)).sum
    println(s"[clu-soak] relabel-map store bytes=$relabelSize (merge log, not corpus-sized)")
    spark.stop()
    if (got != expect) sys.exit(1)
  }
}
