package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.GraftSession
import graft.model.Config
import graft.streaming.Topology

/** Config-driven launch of the whole engine — the Spark analog of running
  * the reference's application (`…/dodetl/DODETL.scala:14-31`: load JSON
  * config, start the per-table replicators, start the stream processor).
  * Demonstrates [[graft.streaming.Topology]] end to end: a JSON config
  * declares one operational table and two metadata tables (one on-demand);
  * CDC + operational MemoryStreams drive it; OEE-style metrics print. */
object TopologyDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[4]", "graft-topology-demo", 4)
    import spark.implicits._

    val confJson =
      """{
        |  "watermarkDelay": "10 minutes",
        |  "shufflePartitions": 4,
        |  "tables": [
        |    {"tableName": "events", "isOperational": true,
        |     "keyColumns": ["equip"], "ordColumn": "ts_us"},
        |    {"tableName": "equipment", "isOperational": false,
        |     "keyColumns": ["equip"], "ordColumn": "ord"},
        |    {"tableName": "shifts", "isOperational": false,
        |     "keyColumns": ["equip"], "ordColumn": "ord",
        |     "filterColumn": "equip"}
        |  ]
        |}""".stripMargin
    val confPath = java.nio.file.Files.createTempFile("topo-conf", ".json")
    java.nio.file.Files.writeString(confPath, confJson)
    val cfg = Config.load(spark, confPath.toString)

    val root = java.nio.file.Files.createTempDirectory("topo-demo").toString
    val topo = new Topology(spark, cfg, root, Map(
      "equipment" -> StructType.fromDDL("equip BIGINT, ord BIGINT, planned DOUBLE"),
      "shifts" -> StructType.fromDDL("equip BIGINT, ord BIGINT, shift STRING")))

    val equipCdc = MemoryStream[(Long, Long, Double)](spark)
    val shiftCdc = MemoryStream[(Long, Long, String)](spark)
    val dimQs = topo.startDimensions {
      case "equipment" => equipCdc.toDF().toDF("equip", "ord", "planned")
      case "shifts" => shiftCdc.toDF().toDF("equip", "ord", "shift")
    }
    val ops = MemoryStream[(Long, Long, Double)](spark)
    val events = ops.toDF().toDF("equip", "ts_us", "qty")
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val keyQ = topo.startKeyRegistration(events)
    val opQ = topo.startOperational(
      events, "ts_utc",
      StructType.fromDDL("equip BIGINT, ts_us BIGINT, qty DOUBLE, ts_utc TIMESTAMP"),
      Seq("performance" -> (col("qty") / col("planned")))) { (batch, id) =>
      println(s"=== emitted batch $id ===")
      batch.select("equip", "qty", "planned", "shift", "performance")
        .orderBy("equip").show()
    }

    // events first: both dims empty -> everything parks (all-dims gate)
    ops.addData(Seq((1L, 1700000000000000L, 5.0), (2L, 1700000000000000L, 8.0)))
    opQ.processAllAvailable(); keyQ.processAllAvailable()

    // equipment catches up; shifts (on-demand) gets rows for observed keys
    // 1,2 plus unobserved 9 (pruned)
    equipCdc.addData(Seq((1L, 1L, 10.0), (2L, 1L, 20.0)))
    dimQs("equipment").processAllAvailable()
    shiftCdc.addData(Seq((1L, 1L, "day"), (2L, 1L, "night"), (9L, 1L, "day")))
    dimQs("shifts").processAllAvailable()
    println("=== on-demand shifts dimension (key 9 pruned) ===")
    topo.maintainers("shifts").current.orderBy("equip").show()

    // the next batch drains the parked events through both dimensions
    ops.addData(Seq((1L, 1700000060000000L, 2.0)))
    opQ.processAllAvailable()

    (dimQs.values.toSeq :+ keyQ :+ opQ).foreach(_.stop())
    spark.stop()
  }
}
