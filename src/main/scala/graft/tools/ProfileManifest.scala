package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Layout

/** q88 pruned-vs-scanned measurement (round-13 verdict task 3's "Done"
  * clause): write orders as a date-clustered file set under
  * [[Layout.fileAssignments]], derive the [[Layout.fileManifest]], answer a
  * selective date-range predicate (a) scanning every file and (b) scanning
  * ONLY the manifest's surviving files — same result set by the pruning
  * guarantee — and report the file/row/wall ratios for SCALE.md, next to
  * the existing z-order 4-9× row. */
object ProfileManifest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val out = s"/tmp/graft_manifest_$nFiles"

    val ord = Tables.load(spark, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_orderdate").cast("date").as("o_date"), col("o_totalprice"))
    val order = Seq(col("o_date").asc, col("o_orderkey").asc)
    Layout.fileAssignments(ord, order, nFiles)
      .write.mode("overwrite").partitionBy("file_id").parquet(out)
    val man = Layout.fileManifest(ord, order, nFiles,
      Seq("o_date", "o_custkey"))

    val lo = lit("1995-07-01").cast("date")
    val hi = lit("1995-10-01").cast("date")
    val survivors = Layout.pruneRange(man, "o_date", lo, hi, "hit")
      .where(col("hit"))
      .select("file_id").collect().map(_.getLong(0)).sorted
    println(s"[manifest] files: $nFiles total, ${survivors.length} survive " +
      s"the Q3'95 range probe (${survivors.mkString(",")})")

    def timeIt(label: String, paths: Seq[String]): (Long, Long, Double) = {
      // cold-ish each rep: distinct paths per call defeat scan reuse
      val t0 = System.nanoTime()
      val df = spark.read.parquet(paths: _*)
      val scanned = df.count()
      val matched = df.where(col("o_date") >= lo && col("o_date") < hi).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[manifest] $label%-10s files=${paths.length}%3d " +
        f"rows_scanned=$scanned%8d rows_matched=$matched%7d wall=$secs%.2f s")
      (scanned, matched, secs)
    }
    val allPaths = (0 until nFiles).map(k => s"$out/file_id=$k")
    val prunedPaths = survivors.map(k => s"$out/file_id=$k").toSeq
    // warm the reader path once, untimed
    spark.read.parquet(allPaths: _*).count()
    val (fullScan, fullMatch, fullS) = timeIt("full", allPaths)
    val (pScan, pMatch, pS) = timeIt("pruned", prunedPaths)
    require(fullMatch == pMatch,
      s"pruning changed the answer: $fullMatch vs $pMatch")
    println(f"[manifest] row ratio ${fullScan.toDouble / pScan}%.1fx " +
      f"(rows scanned ${fullScan}->${pScan}), file ratio " +
      f"${nFiles.toDouble / prunedPaths.length}%.1fx, wall ${fullS / pS}%.1fx")
    spark.stop()
  }
}
