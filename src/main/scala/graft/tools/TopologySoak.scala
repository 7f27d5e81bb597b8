package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.GraftSession
import graft.model.Config
import graft.streaming.Topology

/** End-to-end MES topology soak (round-10 verdict task 6 → SCALE.md): the
  * full config-driven assembly — durable dimensions, on-demand pruning,
  * observed-key registry, late-data buffer, OEE-style metric pipeline —
  * driven for `triggers` triggers of `perTrigger` events each, WITH
  * dimension churn every trigger (5% of equipment rows re-keyed at a higher
  * ord, the CDC update pattern the maintainer compacts).
  *
  * Claims under test:
  *  - per-trigger wall is FLAT across triggers (cost ∝ batch, not stream
  *    history: nothing in the trigger path scans what previous triggers
  *    ingested);
  *  - scaling `perTrigger` 10× scales the trigger wall ≤ 10× (no
  *    superlinear term in batch size);
  *  - state stays bounded at key cardinality: dimension snapshots hold one
  *    row per (key) after churn compaction, the observed-key registry one
  *    row per distinct key, and the late buffer drains to empty once all
  *    dimensions are present.
  *
  * Run shape: trigger 0 is the cold path (events arrive before any
  * dimension row → everything parks in the durable buffer; keys register);
  * dimensions then catch up (shifts is ON-DEMAND — its CDC applies only
  * for observed keys, so a decoy key is pruned); measured triggers 1..N
  * run the warm steady state, with the parked trigger-0 events draining at
  * trigger 1. */
object TopologySoak {
  def main(args: Array[String]): Unit = {
    val perTrigger = args.lift(0).map(_.toInt).getOrElse(20000)
    val triggers = args.lift(1).map(_.toInt).getOrElse(8)
    val nKeys = 2000
    val spark = GraftSession.build("local[32]", "graft-topology-soak", 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val confJson =
      """{
        |  "watermarkDelay": "10 minutes",
        |  "shufflePartitions": 32,
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
    val confPath = java.nio.file.Files.createTempFile("topo-soak-conf", ".json")
    java.nio.file.Files.writeString(confPath, confJson)
    val cfg = Config.load(spark, confPath.toString)

    val root = java.nio.file.Files.createTempDirectory("topo-soak").toString
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
    var emitted = 0L
    val opQ = topo.startOperational(
      events, "ts_utc",
      StructType.fromDDL("equip BIGINT, ts_us BIGINT, qty DOUBLE, ts_utc TIMESTAMP"),
      Seq("performance" -> (col("qty") / col("planned")))) { (batch, _) =>
      emitted += batch.count()
    }

    val base = 1700000000000000L // epoch micros
    val rng = new scala.util.Random(7)
    def eventRows(t: Int): Seq[(Long, Long, Double)] =
      (0 until perTrigger).map { i =>
        (rng.nextInt(nKeys).toLong,
          base + t * 60000000L + rng.nextInt(60000) * 1000L,
          1.0 + rng.nextInt(100))
      }

    // trigger 0 (cold): events before dimensions → all park; keys register
    ops.addData(eventRows(0))
    opQ.processAllAvailable(); keyQ.processAllAvailable()
    println(s"[topo-soak] cold trigger parked (emitted=$emitted of $perTrigger)")

    // dimensions catch up; the decoy key nKeys+1 must be on-demand-pruned
    equipCdc.addData((0 until nKeys).map(k => (k.toLong, 1L, 10.0)))
    dimQs("equipment").processAllAvailable()
    shiftCdc.addData(
      (0 until nKeys).map(k => (k.toLong, 1L, if (k % 2 == 0) "day" else "night")) :+
        ((nKeys + 1L, 1L, "day")))
    dimQs("shifts").processAllAvailable()

    val walls = (1 to triggers).map { t =>
      // dimension churn: 5% of equipment re-keyed at a higher ord
      equipCdc.addData((0 until nKeys / 20).map { i =>
        val k = rng.nextInt(nKeys).toLong
        (k, t + 1L, 10.0 + t)
      })
      dimQs("equipment").processAllAvailable()
      ops.addData(eventRows(t))
      val t0 = System.nanoTime()
      opQ.processAllAvailable(); keyQ.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[topo-soak] trigger $t%2d wall=$wall%5.2f s emitted_total=$emitted")
      wall
    }

    val equipRows = topo.maintainers("equipment").current.count()
    val shiftRows = topo.maintainers("shifts").current.count()
    val keys = topo.observedKeys.current.count()
    val expected = (triggers + 1).toLong * perTrigger
    println(f"[topo-soak] perTrigger=$perTrigger triggers=$triggers " +
      f"firstHalfMean=${walls.take(triggers / 2).sum / (triggers / 2)}%5.2f s " +
      f"secondHalfMean=${walls.drop(triggers / 2).sum / (triggers - triggers / 2)}%5.2f s")
    println(s"[topo-soak] state: equipment=$equipRows shifts=$shiftRows " +
      s"observedKeys=$keys (nKeys=$nKeys, decoy pruned=${shiftRows == nKeys})")
    println(s"[topo-soak] emitted=$emitted expected=$expected " +
      s"(cold batch drained=${emitted == expected})")

    (dimQs.values.toSeq :+ keyQ :+ opQ).foreach(_.stop())
    spark.stop()
  }
}
