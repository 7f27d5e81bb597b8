package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingJoin

/** Watermarked stream-stream interval join: cross-trigger matching, the
  * maxLag bound, final-no-match left-outer emission, and batch parity of
  * the same code path. */
class StreamingJoinSpec extends SparkSpec {

  private val t0 = 1700000000000000L // epoch micros

  private def us(minutes: Long) = minutes * 60L * 1000000L

  test("intervalJoin inner: cross-trigger match within maxLag; beyond-lag and wrong-key never match") {
    import spark.implicits._
    val imps = MemoryStream[(Long, Long, String)](spark)
    val clks = MemoryStream[(Long, Long, String)](spark)
    val li = imps.toDF().toDF("k", "i_us", "ad")
      .select(col("k"), timestamp_micros(col("i_us")).as("i_ts"), col("ad"))
    val rc = clks.toDF().toDF("k", "c_us", "page")
      .select(col("k"), timestamp_micros(col("c_us")).as("c_ts"), col("page"))
    val out = StreamingJoin.intervalJoin(
      li, rc, "k", "i_ts", "c_ts", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      // trigger 1: impressions only — nothing can match yet
      imps.addData((1L, t0, "a1"), (2L, t0, "a2"), (3L, t0, "a3"))
      q.processAllAvailable()
      assert(spark.table("ssj_inner").count() == 0)
      // trigger 2: clicks — k=1 in-window, k=2 beyond maxLag, k=9 no key
      clks.addData(
        (1L, t0 + us(4), "p1"), (2L, t0 + us(11), "p2"),
        (9L, t0 + us(1), "p9"))
      q.processAllAvailable()
      val got = spark.table("ssj_inner")
        .select("k", "ad", "r_page").as[(Long, String, String)]
        .collect().toSet
      assert(got == Set((1L, "a1", "p1")),
        s"only the in-window same-key click may match, got $got")
    } finally q.stop()
  }

  test("intervalJoin left_outer: no-match becomes FINAL (null right) once the watermark passes ts + maxLag") {
    import spark.implicits._
    val imps = MemoryStream[(Long, Long, String)](spark)
    val clks = MemoryStream[(Long, Long, String)](spark)
    val li = imps.toDF().toDF("k", "i_us", "ad")
      .select(col("k"), timestamp_micros(col("i_us")).as("i_ts"), col("ad"))
    val rc = clks.toDF().toDF("k", "c_us", "page")
      .select(col("k"), timestamp_micros(col("c_us")).as("c_ts"), col("page"))
    val out = StreamingJoin.intervalJoin(
      li, rc, "k", "i_ts", "c_ts", "10 minutes", "2 minutes",
      joinType = "left_outer")
    val q = out.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      imps.addData((1L, t0, "a1"), (2L, t0, "a2"))
      clks.addData((1L, t0 + us(3), "p1"))
      q.processAllAvailable()
      // k=2 is unmatched but NOT final yet (watermark hasn't passed)
      val early = spark.table("ssj_outer").where(col("k") === 2).count()
      assert(early == 0, "no-match must not emit before it is final")
      // advance both watermarks far past t0 + maxLag + delay
      imps.addData((50L, t0 + us(60), "aX"))
      clks.addData((51L, t0 + us(60), "pX"))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("ssj_outer")
        .select("k", "ad", "r_page").as[(Long, String, Option[String])]
        .collect().toSet
      assert(rows.contains((1L, "a1", Some("p1"))))
      assert(rows.contains((2L, "a2", None)),
        s"final no-match must emit with null right columns, got $rows")
    } finally q.stop()
  }

  test("intervalJoin batch parity: the same code path on batch frames is a plain interval join") {
    import spark.implicits._
    val li = Seq((1L, t0, "a1"), (2L, t0, "a2"))
      .toDF("k", "i_us", "ad")
      .select(col("k"), timestamp_micros(col("i_us")).as("i_ts"), col("ad"))
    val rc = Seq((1L, t0 + us(4), "p1"), (2L, t0 + us(11), "p2"))
      .toDF("k", "c_us", "page")
      .select(col("k"), timestamp_micros(col("c_us")).as("c_ts"), col("page"))
    val inner = StreamingJoin.intervalJoin(
      li, rc, "k", "i_ts", "c_ts", "10 minutes", "5 minutes")
      .select("k", "ad", "r_page").as[(Long, String, String)].collect().toSet
    assert(inner == Set((1L, "a1", "p1")))
    val outer = StreamingJoin.intervalJoin(
      li, rc, "k", "i_ts", "c_ts", "10 minutes", "5 minutes",
      joinType = "left_outer")
      .select("k", "ad", "r_page").as[(Long, String, Option[String])]
      .collect().toSet
    assert(outer == Set((1L, "a1", Some("p1")), (2L, "a2", None)))
  }

  test("intervalJoin: state stays bounded — buffered rows are purged as the watermark advances") {
    import spark.implicits._
    val imps = MemoryStream[(Long, Long, String)](spark)
    val clks = MemoryStream[(Long, Long, String)](spark)
    val li = imps.toDF().toDF("k", "i_us", "ad")
      .select(col("k"), timestamp_micros(col("i_us")).as("i_ts"), col("ad"))
    val rc = clks.toDF().toDF("k", "c_us", "page")
      .select(col("k"), timestamp_micros(col("c_us")).as("c_ts"), col("page"))
    val out = StreamingJoin.intervalJoin(
      li, rc, "k", "i_ts", "c_ts", "10 minutes", "1 minutes")
    val q = out.writeStream.format("memory").queryName("ssj_state")
      .outputMode("append").start()
    try {
      (0 until 4).foreach { w =>
        val base = t0 + us(60L * w)
        imps.addData((0 until 50).map(i => (i.toLong, base, s"a$i")): _*)
        clks.addData((0 until 50).map(i => (i.toLong, base + us(1), s"p$i")): _*)
        q.processAllAvailable()
      }
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      val total = state.map(_.numRowsTotal).sum
      // 4 waves x 100 rows flowed through; with 60-minute gaps between
      // waves every earlier wave is past watermark + maxLag — only the
      // last wave may still be buffered
      assert(total <= 100L,
        s"state must hold at most the in-flight wave, got $total rows")
    } finally q.stop()
  }
}
