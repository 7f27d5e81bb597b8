package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Sinks

/** Z-order layout matrix (dev tooling → SCALE.md).
  *
  * Claim under test: [[Sinks.writeZOrdered]] makes a 2-D range predicate
  * prune at rest on BOTH dimensions, where a linear sort prunes only its
  * own column. Same data, same file count, same query — the only variable
  * is row order inside the files; parquet row-group min/max stats do the
  * rest. Measures bytes/records actually read and wall for a small 2-D
  * box predicate over each layout.
  */
object ScaleStressZ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val in = new InputBytesListener
    spark.sparkContext.addSparkListener(in)
    val n = args.lift(0).map(_.toLong).getOrElse(8000000L)
    // granularity IS the experiment: pruning works at row-group/file level,
    // so files must be numerous enough that a box predicate CAN skip most
    // of them (a 100 TB table has ~10^6 row groups; 256 here)
    val files = args.lift(1).map(_.toInt).getOrElse(256)
    val base = spark.range(n).select(
      pmod(xxhash64(col("id") * 31), lit(4096L)).as("x"),
      pmod(xxhash64(col("id") * 37), lit(4096L)).as("y"),
      col("id").as("payload"))
    val dirs = Map(
      "linear_x" -> "/tmp/zorder_linear",
      "zorder" -> "/tmp/zorder_z")
    base.repartitionByRange(files, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dirs("linear_x"))
    Sinks.writeZOrdered(base, dirs("zorder"), "x", "y", targetFiles = files)
    val queries = Seq(
      // small box: row-group rounding dominates both layouts (honest null
      // result at this granularity), kept as the baseline
      "box_64" -> (col("x").between(1000, 1063) && col("y").between(1000, 1063)),
      // wider boxes: linear cost grows with box WIDTH (x-slice), z cost
      // with box AREA — the regime the layout exists for
      "box_256" -> (col("x").between(1024, 1279) && col("y").between(1024, 1279)),
      "box_512" -> (col("x").between(1024, 1535) && col("y").between(1024, 1535)),
      // box crossing the global 2048 quadrant boundary in BOTH dims — the
      // curve's worst case (touches all four top-level quadrants)
      "box_512_cross" -> (col("x").between(1792, 2303) && col("y").between(1792, 2303)),
      // single-dim predicate on the column the linear layout did NOT sort
      "y_only" -> col("y").between(1000, 1063))
    for ((label, dir) <- dirs.toSeq.sortBy(_._1)) {
      // warm the page cache once so layouts compare IO-decoded, not disk
      spark.read.parquet(dir).write.format("noop").mode("overwrite").save()
      for ((qname, pred) <- queries) {
        val walls = (1 to 3).map { _ =>
          in.reset()
          val t0 = System.nanoTime()
          spark.read.parquet(dir).filter(pred)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[z] $label%-9s $qname%-13s wall min=${walls.min}%.3f s " +
          f"bytesRead=${in.bytes / 1e6}%8.1f MB recordsRead=${in.records}%,d")
      }
    }
    spark.stop()
  }
}
