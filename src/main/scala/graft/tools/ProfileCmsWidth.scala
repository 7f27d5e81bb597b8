package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Cms

/** q85 width-sensitivity sweep (round-13 verdict task 7): the CMS
  * inner-product join-cardinality estimate's over_ratio as sketch width
  * grows 4096 → 65536 — the sketch-accuracy curve SCALE.md tells for KLL
  * (q81 rank error vs k), told for the AGMS estimator (expected excess
  * per hash row ≤ |A|·|B|/width, so over_ratio−1 should fall ~linearly in
  * 1/width). Prints one line per width: estimate, exact, over_ratio. */
object ProfileCmsWidth {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val ord = Tables.load(spark, dir, "orders").select(col("o_orderkey"))
    val li = Tables.load(spark, dir, "lineitem").select(col("l_orderkey"))
    val exact = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .count()
    for (width <- Seq(4096, 16384, 65536)) {
      val t0 = System.nanoTime()
      val est = Cms.innerProduct(
          Cms.registers(ord, Nil, "o_orderkey", depth = 4, width = width),
          Cms.registers(li, Nil, "l_orderkey", depth = 4, width = width),
          Nil)
        .head().getAs[Long]("join_size_est")
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[cms-width] width=$width%6d est=$est%d exact=$exact%d " +
        f"over_ratio=${est.toDouble / exact}%.4f wall=$secs%.2f s")
    }
    spark.stop()
  }
}
