package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (`TESTDATA.md`).
  *
  * Event time convention: the engine's canonical event-time unit is **epoch
  * microseconds as a long** (`ts`). The raw parquet stores TIMESTAMP(NANOS),
  * which Spark reads as an epoch-nanos long (legacy conf, see
  * [[GraftSession.tune]]); we truncate to micros — the precision every SQL
  * engine in the comparison loop (Spark TimestampType, DuckDB TIMESTAMP)
  * actually supports. Use [[Tables.eventsWithTimestamp]] when a genuine
  * TimestampType column is needed (windows, watermarks).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` normalized from epoch-nanos to epoch-micros (long). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events").withColumn("ts", expr("ts div 1000"))

  /** `events` with an additional `ts_utc` TimestampType (micros) column. */
  def eventsWithTimestamp(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).withColumn("ts_utc", timestamp_micros(col("ts")))
}
