package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.GraftSession
import graft.sources.{Sinks, Sources}
import graft.streaming.{DimensionMaintainer, ObservedKeySet, Pipeline}

/** Runnable end-to-end demo of the streaming layer (dev example): a CDC
  * stream maintains a dimension while an operational stream joins against it
  * and lands OEE metrics in a JDBC table — the reference's full dataflow. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[4]", "graft-streaming-demo", 4)
    import spark.implicits._
    val derby = "jdbc:derby:memory:demo;create=true"
    val ckpt = java.nio.file.Files.createTempDirectory("demo-ckpt")

    // dimension: equipment -> planned quantity, maintained from a CDC stream
    val dimSchema = StructType.fromDDL("equip BIGINT, ord BIGINT, planned DOUBLE, grp STRING")
    val dim = new DimensionMaintainer(spark, "equipment", Seq("equip"), "ord", dimSchema)
    val cdc = MemoryStream[(Long, Long, Double, String)](spark)
    val cdcQ = dim.attachTo(cdc.toDF().toDF("equip", "ord", "planned", "grp"), s"$ckpt/cdc")

    // operational stream: events with quantities + status flags
    val ops = MemoryStream[(Long, Long, Double, Boolean, Boolean)](spark)
    val events = ops.toDF().toDF("equip", "ts_us", "qty", "down", "bad")
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val keySet = new ObservedKeySet(spark, "equip", "BIGINT")
    val keyQ = keySet.attachTo(events.select("equip"), s"$ckpt/keys")

    val buffer = new graft.streaming.LateDataBuffer(
      spark, StructType.fromDDL(
        "equip BIGINT, ts_us BIGINT, qty DOUBLE, down BOOLEAN, bad BOOLEAN, ts_utc TIMESTAMP"))
    val sinkQ = Pipeline.operationalQueryBuffered(
        events, "ts_utc", () => dim.current, "equip", "equip", Seq("planned", "grp"),
        Pipeline.oeeColumns(col("qty"), col("planned"), col("down"), col("bad")),
        buffer) { (batch, _) =>
        Sinks.jdbcAppend(
          batch.select("equip", "grp", "qty", "performance",
            "availability", "quality", "oee"),
          derby, "oee_metrics")
      }
      .option("checkpointLocation", s"$ckpt/sink")
      .start()

    // batch 1: dimension rows arrive first, then events
    cdc.addData(Seq((1L, 1L, 10.0, "A"), (2L, 1L, 20.0, "B")))
    cdcQ.processAllAvailable()
    ops.addData(Seq((1L, 1700000000000000L, 5.0, false, false),
                    (2L, 1700000000000000L, 10.0, true, false)))
    sinkQ.processAllAvailable(); keyQ.processAllAvailable()

    // batch 2: a CDC update changes planned qty for equip 1; new event sees
    // it. Also an event for equip 7 whose dimension row doesn't exist yet —
    // it must buffer, not emit.
    cdc.addData(Seq((1L, 2L, 5.0, "A")))
    cdcQ.processAllAvailable()
    ops.addData(Seq((1L, 1700000060000000L, 5.0, false, false),
                    (7L, 1700000060000000L, 8.0, false, false)))
    sinkQ.processAllAvailable(); keyQ.processAllAvailable()
    println(s"=== buffered (missing dim) after batch 2: ${buffer.current.count()} ===")

    // batch 3: equip 7's dimension row arrives; the buffered event drains
    cdc.addData(Seq((7L, 1L, 16.0, "C")))
    cdcQ.processAllAvailable()
    ops.addData(Seq((2L, 1700000120000000L, 5.0, false, true)))
    sinkQ.processAllAvailable(); keyQ.processAllAvailable()
    println(s"=== buffered after batch 3 (drained): ${buffer.current.count()} ===")

    println("=== maintained dimension (after CDC update) ===")
    dim.current.orderBy("equip").show()
    println("=== observed keys ===")
    keySet.current.orderBy("equip").show()
    println("=== on-demand pruned view ===")
    dim.onDemandView(keySet.current, "equip").orderBy("equip").show()
    println("=== OEE metrics landed in Derby ===")
    Sources.jdbcTable(spark, derby, "oee_metrics").orderBy("equip", "performance").show()

    // on-demand replication: a second dimension whose CDC stream is filtered
    // at APPLY time against the observed key set (keys 1/2/7 were observed
    // above; CDC rows for 8/9 must not replicate)
    val shiftSchema = StructType.fromDDL("equip BIGINT, ord BIGINT, shift STRING")
    val shifts = new DimensionMaintainer(spark, "shifts", Seq("equip"), "ord", shiftSchema)
    val shiftCdc = MemoryStream[(Long, Long, String)](spark)
    val odQ = shifts.attachToOnDemand(
      shiftCdc.toDF().toDF("equip", "ord", "shift"), s"$ckpt/od",
      () => keySet.current, "equip")
    shiftCdc.addData(Seq((1L, 1L, "day"), (8L, 1L, "night"), (9L, 1L, "night"),
                         (7L, 1L, "day")))
    odQ.processAllAvailable()
    println("=== on-demand replicated shifts (only observed keys 1,7) ===")
    shifts.current.orderBy("equip").show()
    odQ.stop()

    Seq(cdcQ, keyQ, sinkQ).foreach(_.stop())
    spark.stop()
  }
}
