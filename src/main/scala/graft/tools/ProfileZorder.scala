package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Layout

/** Z-order file-pruning measurement (dev tooling → SCALE.md).
  *
  * Question under test: how many parquet files can footer min/max stats
  * prune for a two-column box predicate under (a) a lexicographic sort on
  * the leading column vs (b) the z-order layout — the whole point of
  * [[graft.operators.Layout.zOrderWrite]]. Prunability is computed from
  * the files' actual per-column min/max (exactly what a reader's
  * file-skipping consults): a file survives iff its [min,max] box
  * intersects the predicate box on EVERY column.
  *
  * Expectation: lex layout prunes well on the leading column but keeps
  * ~every file for a predicate on the trailing column alone; z-order
  * prunes on both (each file is a union of few z-range boxes, so its
  * bounding box is tight in both dims).
  */
object ProfileZorder {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val base = "/tmp/graft_zorder_profile"

    // layout (a): classic lexicographic clustering on the leading column
    li.repartitionByRange(nFiles, col("l_partkey"), col("l_suppkey"))
      .sortWithinPartitions("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$base/lex")
    // layout (b): z-order on the same two columns
    Layout.zOrderWrite(li, Seq("l_partkey", "l_suppkey"), s"$base/z",
      bits = 10, numFiles = nFiles)

    // per-file column stats, as a reader's pruning would see them
    def stats(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(
          min("l_partkey").as("p0"), max("l_partkey").as("p1"),
          min("l_suppkey").as("s0"), max("l_suppkey").as("s1"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val (lex, zed) = (stats(s"$base/lex"), stats(s"$base/z"))
    val (pLo, pHi) = {
      val mm = li.agg(min("l_partkey"), max("l_partkey")).head()
      (mm.getLong(0), mm.getLong(1))
    }
    val (sLo, sHi) = {
      val mm = li.agg(min("l_suppkey"), max("l_suppkey")).head()
      (mm.getLong(0), mm.getLong(1))
    }

    // three predicate shapes, each a ~10%-of-range box on the predicated
    // column(s): leading-only, trailing-only, both
    def width(lo: Long, hi: Long): Long = math.max(1L, (hi - lo) / 10)
    val boxes = Seq(
      ("leading only ", (pLo + 4 * width(pLo, pHi), pLo + 5 * width(pLo, pHi)), (sLo, sHi)),
      ("trailing only", (pLo, pHi), (sLo + 4 * width(sLo, sHi), sLo + 5 * width(sLo, sHi))),
      ("both columns ", (pLo + 4 * width(pLo, pHi), pLo + 5 * width(pLo, pHi)),
        (sLo + 4 * width(sLo, sHi), sLo + 5 * width(sLo, sHi))))

    println(f"[zorder] ${"predicate"}%-14s ${"lex survive"}%12s ${"z survive"}%10s  (of $nFiles files; lower is better)")
    for ((name, (bp0, bp1), (bs0, bs1)) <- boxes) {
      def survivors(st: Array[(Long, Long, Long, Long)]): Int =
        st.count { case (p0, p1, s0, s1) =>
          p1 >= bp0 && p0 <= bp1 && s1 >= bs0 && s0 <= bs1 }
      println(f"[zorder] $name%-14s ${survivors(lex)}%12d ${survivors(zed)}%10d")
    }
    spark.stop()
  }
}
