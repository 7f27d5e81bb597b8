package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.Tables

/** Typed row models for the engine's core tables — `Dataset[T]` facades for
  * the paths where compile-time schema helps (streaming pipeline events, CDC
  * update records, OEE output), per the engine's design rule: `DataFrame`
  * for dynamic/relational surfaces, `Dataset[T]` where a fixed record shape
  * crosses module boundaries.
  *
  * (The reference's rows are `Map[String, Object]` with casts at use sites,
  * `…/dodetl/stp/DataTransformer.scala:19-24` — the typed facade is the
  * compile-checked replacement for those casts.)
  */
final case class Event(
    event_id: Long, user_id: Long, event_type: String,
    ts: Long, value: Double, props: String)

final case class CdcRecord(
    key: Long, ord: Long, payload: String)

final case class OeeRecord(
    performance: Double, availability: Double, quality: Double, oee: Double)

object Schemas {

  /** `events` as a typed Dataset (epoch-micros `ts`, normalized by
    * [[graft.Tables.events]]). */
  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "event_type", "ts",
        "value", "props")
      .as[Event]
  }
}
