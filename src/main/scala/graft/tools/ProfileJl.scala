package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity

/** Measure the [[graft.functions.SignedProject]] codegen kernel against the
  * equivalent higher-order-function tower on a replicated embeddings table —
  * the map-path cost every vector pays at projection time. Usage:
  * `runMain graft.tools.ProfileJl [sfDir] [replicas]` → SCALE.md table. */
object ProfileJl {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val big = (1 until replicas)
      .map(r => base.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
        col("embedding")))
      .foldLeft(base)(_ union _)
      .persist()
    println(s"[jl] vectors = ${big.count()} (x$replicas)")
    def time(label: String, useKernel: Boolean): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        // checksum fold keeps the whole projection on the executors
        val s = Similarity.jlProject(big, "embedding", 64, 16, "jl1",
            useKernel = useKernel)
          .agg(sum(element_at(col("jl_vec"), 1))).head().getDouble(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[jl]   $label%-7s ${dt}%6.2f s (checksum $s%.4f)")
        dt
      }
      runs.min
    }
    val k = time("kernel", useKernel = true)
    val h = time("hof", useKernel = false)
    println(f"[jl] min-of-3: kernel ${k}%5.2f s vs hof ${h}%5.2f s -> ${h / k}%4.1fx")
    spark.stop()
  }
}
