package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.{StreamingCusum, StreamingJoin}

/** Trigger-cadence soak for the round-11 streaming additions: drive the
  * stream-stream interval join and the online CUSUM through many waves of
  * event-time-advancing data and record per-trigger latency stability and
  * join-state size (the engine must PURGE buffered rows as the watermark
  * advances — flat state across waves is the pass condition).
  * Usage: `runMain graft.tools.StreamingJoinSoak [waves] [rowsPerWave]`. */
object StreamingJoinSoak {
  def main(args: Array[String]): Unit = {
    val waves = args.headOption.map(_.toInt).getOrElse(30)
    val rows = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = GraftSession.build("local[8]")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t0 = 1700000000000000L
    val us = 60L * 1000000L

    // --- stream-stream interval join ---
    val imps = MemoryStream[(Long, Long, String)](spark)
    val clks = MemoryStream[(Long, Long, String)](spark)
    val li = imps.toDF().toDF("k", "i_us", "ad")
      .select(col("k"), timestamp_micros(col("i_us")).as("i_ts"), col("ad"))
    val rc = clks.toDF().toDF("k", "c_us", "page")
      .select(col("k"), timestamp_micros(col("c_us")).as("c_ts"), col("page"))
    val joined = StreamingJoin.intervalJoin(
      li, rc, "k", "i_ts", "c_ts", "10 minutes", "1 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_soak")
      .outputMode("append").start()
    var matched = 0L
    val lat = Array.ofDim[Double](waves)
    val state = Array.ofDim[Long](waves)
    (0 until waves).foreach { w =>
      val base = t0 + w * 60L * us // 60-minute gaps: prior waves purgeable
      val s0 = System.nanoTime()
      imps.addData((0 until rows).map(i =>
        ((i % 97).toLong, base + (i % 50) * us / 60, s"a$i")): _*)
      clks.addData((0 until rows).map(i =>
        ((i % 97).toLong, base + (i % 50) * us / 60 + us, s"p$i")): _*)
      q.processAllAvailable()
      lat(w) = (System.nanoTime() - s0) / 1e9
      state(w) = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    }
    matched = spark.table("ssj_soak").count()
    val early = lat.slice(2, 7).sum / 5
    val late = lat.slice(waves - 5, waves).sum / 5
    println(f"[ssj-soak] waves=$waves rows/wave=${2 * rows} matched=$matched")
    println(f"[ssj-soak] trigger wall early(2-6)=${early}%5.2f s late(last5)=${late}%5.2f s ratio=${late / early}%4.2f")
    println(f"[ssj-soak] state rows first=${state(2)} mid=${state(waves / 2)} last=${state(waves - 1)}")
    q.stop()

    // --- online CUSUM ---
    val ev = MemoryStream[(String, Long, Double)](spark)
    val ref = (0 until 97).map(k => s"k$k" -> 10.0).toMap
    val cu = StreamingCusum.updates(ev.toDS(), ref, k = 0.5, h = 50.0)
    val q2 = cu.writeStream.format("memory").queryName("cusum_soak")
      .outputMode("append").start()
    val lat2 = Array.ofDim[Double](waves)
    val st2 = Array.ofDim[Long](waves)
    (0 until waves).foreach { w =>
      val base = t0 + w * 60L * us
      val s0 = System.nanoTime()
      // in-control noise + one persistently shifted key
      ev.addData((0 until rows).map { i =>
        val key = s"k${i % 97}"
        val v = if (i % 97 == 13) 13.0 else 10.0 + (if (i % 2 == 0) 0.4 else -0.4)
        (key, base + i, v)
      }: _*)
      q2.processAllAvailable()
      lat2(w) = (System.nanoTime() - s0) / 1e9
      st2(w) = q2.lastProgress.stateOperators.map(_.numRowsTotal).sum
    }
    val alarms = spark.table("cusum_soak").count()
    val e2 = lat2.slice(2, 7).sum / 5
    val l2 = lat2.slice(waves - 5, waves).sum / 5
    println(f"[cusum-soak] waves=$waves rows/wave=$rows alarms=$alarms (shifted key only: ${spark.table("cusum_soak").where(col("_3") === 13.0).count() == alarms})")
    println(f"[cusum-soak] trigger wall early=${e2}%5.2f s late=${l2}%5.2f s ratio=${l2 / e2}%4.2f")
    println(f"[cusum-soak] state rows first=${st2(2)} last=${st2(waves - 1)} (keys=97)")
    q2.stop()
    spark.stop()
  }
}
