package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time every declared query at a given SF (dev tooling; the bench covers the
  * headline subset — this sweeps the rest for scale regressions). */
object TimeAll {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("local[32]")
    spark.read.parquet(s"$dir/lineitem.parquet").limit(100)
      .write.format("noop").mode("overwrite").save()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[time] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } catch { case e: Throwable =>
        println(s"[time] $name FAILED: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
