package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.{GlobalConfig, TableConfig}
import graft.streaming.Topology

/** Config-driven topology: dimension replication (plain + on-demand), key
  * registration, and the buffered multi-dimension operational pipeline —
  * the reference's whole application wired from a [[GlobalConfig]]. */
class TopologySpec extends SparkSpec {

  private val cfg = GlobalConfig(
    brokers = None, jdbcUrl = None,
    watermarkDelay = "10 minutes", shufflePartitions = 4,
    tables = Seq(
      TableConfig("events", isOperational = true, Seq("equip"), "ts_us", None, None, None),
      TableConfig("planned_dim", isOperational = false, Seq("equip"), "ord",
        filterColumn = None, topicName = None, retentionDays = None),
      TableConfig("shift_dim", isOperational = false, Seq("equip"), "ord",
        filterColumn = Some("equip"), topicName = None, retentionDays = None)))

  private val dimSchemas = Map(
    "planned_dim" -> StructType.fromDDL("equip BIGINT, ord BIGINT, planned DOUBLE"),
    "shift_dim" -> StructType.fromDDL("equip BIGINT, ord BIGINT, shift STRING"))

  test("topology: multi-dim gating, on-demand pruning, buffered drain") {
    import spark.implicits._
    val root = tmpDir("topo")
    val topo = new Topology(spark, cfg, root, dimSchemas)

    val plannedCdc = MemoryStream[(Long, Long, Double)](spark)
    val shiftCdc = MemoryStream[(Long, Long, String)](spark)
    val dimQs = topo.startDimensions {
      case "planned_dim" => plannedCdc.toDF().toDF("equip", "ord", "planned")
      case "shift_dim" => shiftCdc.toDF().toDF("equip", "ord", "shift")
    }
    val ops = MemoryStream[(Long, Long, Double)](spark)
    val events = ops.toDF().toDF("equip", "ts_us", "qty")
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val keyQ = topo.startKeyRegistration(events)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, String)]
    val opQ = topo.startOperational(
      events, "ts_utc",
      StructType.fromDDL("equip BIGINT, ts_us BIGINT, qty DOUBLE, ts_utc TIMESTAMP"),
      Seq("performance" -> (col("qty") / col("planned")))) { (batch, _) =>
      emitted ++= batch.select("equip", "performance", "shift").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    }
    try {
      // events arrive BEFORE any dimension data: all must park, none emit
      ops.addData(Seq((1L, 1700000000000000L, 5.0), (2L, 1700000000000000L, 10.0)))
      opQ.processAllAvailable(); keyQ.processAllAvailable()
      assert(emitted.isEmpty)

      // planned_dim catches up for 1 and 2 — but shift_dim is still missing,
      // so the all-dimensions gate keeps both parked
      plannedCdc.addData(Seq((1L, 1L, 10.0), (2L, 1L, 20.0)))
      dimQs("planned_dim").processAllAvailable()
      ops.addData(Seq((1L, 1700000010000000L, 2.0)))
      opQ.processAllAvailable(); keyQ.processAllAvailable()
      assert(emitted.isEmpty)

      // shift_dim CDC: keys 1,2 are observed -> replicate; 9 is not -> pruned
      shiftCdc.addData(Seq((1L, 1L, "day"), (2L, 1L, "night"), (9L, 1L, "day")))
      dimQs("shift_dim").processAllAvailable()
      assert(topo.maintainers("shift_dim").current
        .collect().map(_.getLong(0)).toSet == Set(1L, 2L))

      // next batch retries the parked events: all dims present -> all emit
      ops.addData(Seq((2L, 1700000020000000L, 5.0)))
      opQ.processAllAvailable()
      assert(emitted.toSet == Set(
        (1L, 0.5, "day"), (2L, 0.5, "night"),   // parked batch-1 events
        (1L, 0.2, "day"),                        // parked batch-2 event
        (2L, 0.25, "night")))                    // the live batch-3 event
    } finally (dimQs.values.toSeq :+ keyQ :+ opQ).foreach(_.stop())
  }

  test("topology: cdcSnapshots back-fill on-demand dims for late-observed keys") {
    import spark.implicits._
    val root = tmpDir("topo-bf")
    val topo = new Topology(spark, cfg, root, dimSchemas)
    val plannedCdc = MemoryStream[(Long, Long, Double)](spark)
    val shiftCdc = MemoryStream[(Long, Long, String)](spark)
    val dimQs = topo.startDimensions {
      case "planned_dim" => plannedCdc.toDF().toDF("equip", "ord", "planned")
      case "shift_dim" => shiftCdc.toDF().toDF("equip", "ord", "shift")
    }
    val ops = MemoryStream[(Long, Long, Double)](spark)
    val events = ops.toDF().toDF("equip", "ts_us", "qty")
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
    // the compacted CDC topic for the ON-DEMAND table, as a batch source
    val shiftTopic = Seq((8L, 1L, "early"), (9L, 1L, "late"))
      .toDF("equip", "ord", "shift")
    val keyQ = topo.startKeyRegistration(
      events, cdcSnapshots = Map("shift_dim" -> (() => shiftTopic)))
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, String)]
    val opQ = topo.startOperational(
      events, "ts_utc",
      StructType.fromDDL("equip BIGINT, ts_us BIGINT, qty DOUBLE, ts_utc TIMESTAMP"),
      Seq("performance" -> (col("qty") / col("planned")))) { (batch, _) =>
      emitted ++= batch.select("equip", "performance", "shift").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    }
    try {
      // shift_dim CDC for equip 9 arrives BEFORE 9 is ever observed -> pruned
      shiftCdc.addData(Seq((9L, 1L, "late")))
      dimQs("shift_dim").processAllAvailable()
      assert(topo.maintainers("shift_dim").current.count() == 0)
      // planned_dim is NOT on-demand: replicates regardless
      plannedCdc.addData(Seq((9L, 1L, 10.0)))
      dimQs("planned_dim").processAllAvailable()
      // equip 9's first event: parks (shift row pruned) — but registration
      // back-fills shift_dim from the compacted topic, bounded to key 9
      ops.addData(Seq((9L, 1700000000000000L, 5.0)))
      opQ.processAllAvailable()
      keyQ.processAllAvailable()
      assert(topo.maintainers("shift_dim").current
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet == Set((9L, "late")))
      // next batch drains the parked event fully enriched
      ops.addData(Seq((9L, 1700000060000000L, 2.0)))
      opQ.processAllAvailable()
      assert(emitted.toSet == Set((9L, 0.5, "late"), (9L, 0.2, "late")))
    } finally (dimQs.values.toSeq :+ keyQ :+ opQ).foreach(_.stop())
  }

  test("topology: restart restores durable dimension snapshots from the root") {
    import spark.implicits._
    val root = tmpDir("topo-restart")
    val topo1 = new Topology(spark, cfg, root, dimSchemas)
    topo1.maintainers("planned_dim")
      .applyBatch(Seq((5L, 1L, 50.0)).toDF("equip", "ord", "planned"), 0L)
    topo1.maintainers.values.foreach(_.drop())

    val topo2 = new Topology(spark, cfg, root, dimSchemas)
    val restored = topo2.maintainers("planned_dim").current
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(restored.toSeq == Seq((5L, 50.0)))
  }
}
