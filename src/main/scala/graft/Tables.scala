package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (`TESTDATA.md`).
  *
  * Event time convention: the engine's canonical event-time unit is **epoch
  * microseconds as a long** (`ts`). The raw parquet has carried two shapes
  * across testdata generations — TIMESTAMP(NANOS), which Spark reads as an
  * epoch-nanos long (legacy conf, see [[GraftSession.tune]]), and plain
  * TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ — so
  * [[Tables.events]] normalizes BY INSPECTING THE LOADED TYPE rather than
  * assuming one generation. Either way `ts` comes out as epoch-micros —
  * the precision every SQL engine in the comparison loop (Spark
  * TimestampType, DuckDB TIMESTAMP) actually supports, and what the DuckDB
  * oracles' `epoch_us(ts)` produces. Use [[Tables.eventsWithTimestamp]]
  * when a genuine TimestampType column is needed (windows, watermarks).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` normalized to epoch-micros (long), whichever shape
    * the parquet carries. The NTZ→timestamp cast is an identity here: every
    * session this library builds pins `spark.sql.session.timeZone=UTC`
    * ([[GraftSession]]), and the testdata instants are UTC. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    val tsMicros = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    raw.withColumn("ts", tsMicros)
  }

  /** `events` with an additional `ts_utc` TimestampType (micros) column. */
  def eventsWithTimestamp(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).withColumn("ts_utc", timestamp_micros(col("ts")))
}
