package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time one named query (dev tooling): `runMain graft.tools.TimeOne <name>
  * [sfDir] [reps]` — noop sink, cache cleared between reps, min printed
  * last. Complements Bench (whole headline set) and TimeAll (everything)
  * when iterating on a single operator. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val walls = (1 to reps).map { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name run$i $w%7.3f s")
      w
    }
    println(f"[time] $name min ${walls.min}%7.3f s of $reps")
    spark.stop()
  }
}
