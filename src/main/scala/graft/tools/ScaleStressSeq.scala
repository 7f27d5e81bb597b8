package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Sequence

/** Sequence-analytics scale-stress matrix (dev tooling → SCALE.md).
  *
  * Claim under test: [[Sequence.funnelTimes]]'s conditional-aggregation
  * form absorbs a hot entity in map-side partial aggregation, where the
  * textbook stacked-window form serializes the hot entity's whole history
  * into one task's sort. The matrix measures wall + per-stage max/median
  * task skew for a uniform entity distribution vs a 90%-hot entity at the
  * same row count (the window form's numbers are kept in SCALE.md from
  * the pre-rewrite run of this same harness).
  */
object ScaleStressSeq {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode(SaveMode.Overwrite).save()

  /** n events; `hotFraction` of rows on entity 0, rest uniform over
    * `entities`. Types/timestamps deterministic from xxhash64. */
  private def events(
      spark: org.apache.spark.sql.SparkSession, n: Long, entities: Long,
      hotFraction: Double): DataFrame = {
    val types = array(lit("view"), lit("click"), lit("purchase"), lit("other"))
    spark.range(n).select(
      when(pmod(xxhash64(col("id") * 7), lit(100L)) < lit((hotFraction * 100).toLong),
        lit(0L))
        .otherwise(pmod(xxhash64(col("id") * 13), lit(entities)))
        .as("u"),
      element_at(types, (pmod(xxhash64(col("id") * 17), lit(4L)) + 1).cast("int"))
        .as("typ"),
      pmod(xxhash64(col("id") * 19), lit(86400000000L)).as("ts"),
      col("id").as("eid"))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val skew = new TaskSkewListener
    spark.sparkContext.addSparkListener(skew)
    val n = args.lift(0).map(_.toLong).getOrElse(4000000L)
    for ((label, hot) <- Seq("uniform" -> 0.0, "hot90" -> 0.9)) {
      val df = events(spark, n, entities = 40000L, hotFraction = hot)
        .persist()
      noop(df) // materialize input outside the timed region
      val walls = (1 to 3).map { _ =>
        skew.reset()
        val t0 = System.nanoTime()
        noop(Sequence.funnelTimes(
          df, "u", "typ", "ts", Seq("view", "click", "purchase")))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[seq] funnel $label n=$n wall min=${walls.min}%.2f s " +
        f"(all: ${walls.map(w => f"$w%.2f").mkString(", ")})")
      skew.print(s"[seq] funnel $label")
      // transitions: flat window vs (entity, bucket)-split under the same
      // distribution — ts spans one day, so 1-minute buckets ≈ 1440 slices
      for ((form, width) <- Seq("flat" -> 0L, "bucketed" -> 60000000L)) {
        val tw = (1 to 3).map { _ =>
          skew.reset()
          val t0 = System.nanoTime()
          noop(Sequence.transitionCounts(df, "u", "typ", "ts", "eid", width))
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[seq] transitions $label/$form wall min=${tw.min}%.2f s " +
          f"(all: ${tw.map(w => f"$w%.2f").mkString(", ")})")
        skew.print(s"[seq] transitions $label/$form", 3)
      }
      df.unpersist()
    }
    spark.stop()
  }
}
