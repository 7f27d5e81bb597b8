package graft.tools

import org.apache.spark.sql.SparkSession
import graft.plans.GraftExtensions

/** Drive GraftExtensions against real testdata: the q05-style interval
  * overlap self-join on events, rule off vs on (dev tooling). */
object ExtDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    // via Tables.events: normalizes ts to epoch-micros whichever physical
    // shape the parquet carries (nanos-long or TIMESTAMP(MICROS))
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts").as("s"), col("event_id"))
      .withColumn("e", col("s") + 3600L * 1000000L)
    val l = ev.select(col("user_id"), col("s").as("ls"), col("e").as("le"), col("event_id").as("lid"))
    val r = ev.select(col("user_id").as("u2"), col("s").as("rs"), col("e").as("re"), col("event_id").as("rid"))
    // pure overlap shape (the reference's J2): an extra cross-side inequality
    // (id dedup) would make the interval pairing ambiguous and the rule
    // declines -- verified by the first probe run of this demo
    def q = l.join(r, l("user_id") === r("u2") && l("ls") < r("re") && l("le") > r("rs"))

    def timeCount(label: String): Long = {
      val t0 = System.nanoTime(); val n = q.count()
      println(f"[ext] $label%-10s count=$n%8d  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      n
    }
    spark.conf.unset("spark.graft.intervalJoin.bucketWidth")
    println("[ext] plan OFF: " + q.queryExecution.optimizedPlan.getClass.getSimpleName +
      " joinNodes=" + q.queryExecution.sparkPlan.toString.linesIterator.filter(_.contains("Join")).map(_.trim.take(60)).mkString(" | "))
    val n1 = timeCount("rule OFF")
    spark.conf.set("spark.graft.intervalJoin.bucketWidth", (3600L * 1000000L).toString)
    println("[ext] plan ON:  " +
      q.queryExecution.sparkPlan.toString.linesIterator.filter(l => l.contains("Join") || l.contains("Generate")).map(_.trim.take(60)).mkString(" | "))
    val n2 = timeCount("rule ON")
    println(s"[ext] results equal: ${n1 == n2}")
    spark.stop()
  }
}
