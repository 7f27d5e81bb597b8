package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingEntity

/** Streaming entity resolution: per-trigger pairs == the batch entityLink
  * expression against the store as of that trigger, in both frozen-master
  * and self-extending modes; restart/incarnation discipline in extend
  * mode. */
class StreamingEntitySpec extends SparkSpec {

  import spark.implicits._

  // master records: (id, name, size); variants arrive on the stream
  private val masterRows = Seq(
    (1L, "alpha pump", 10L), (2L, "beta valve", 20L),
    (3L, "gamma seal", 30L), (4L, "delta gear", 40L))
  private def master = masterRows.toDF("id", "name", "size")

  private def link(probe: DataFrame, store: DataFrame): Set[String] =
    Dedup.entityLink(probe, store, "id", Seq(substring(col("name"), 1, 1)),
      editFields = Seq("name" -> 0.6), closeFields = Seq("size" -> 0.4),
      threshold = 0.7)
      .collect().map(_.toString).toSet

  test("attach frozen-master: per-trigger pairs == batch entityLink of the batch") {
    val stream = MemoryStream[(Long, String, Long)](spark)
    val got = scala.collection.mutable.Map.empty[Long, Set[String]]
    val q = StreamingEntity.attach(
      stream.toDF().toDF("id", "name", "size"), master, "id",
      Seq(substring(col("name"), 1, 1)),
      editFields = Seq("name" -> 0.6), closeFields = Seq("size" -> 0.4),
      threshold = 0.7,
      checkpoint = tmpDir("sent-ckpt")) { (pairs, id) =>
      got(id) = pairs.collect().map(_.toString).toSet
    }
    val b1 = Seq((101L, "alpha pumps", 10L), (102L, "zeta cog", 99L))
    val b2 = Seq((103L, "beta valve", 21L))
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      assert(got(0L) === link(b1.toDF("id", "name", "size"), master))
      assert(got(0L).nonEmpty) // the alpha variant matched
      stream.addData(b2: _*); q.processAllAvailable()
      assert(got(1L) === link(b2.toDF("id", "name", "size"), master))
    } finally q.stop()
  }

  test("attach extend: batch N links against master + batches <N; replay and " +
      "fresh incarnations keep the store exact") {
    val statePath = tmpDir("sent-x") + "/state"
    val ckpt = tmpDir("sent-x-ckpt")
    val got = scala.collection.mutable.Map.empty[Long, Set[String]]
    def run(stream: MemoryStream[(Long, String, Long)], checkpoint: String) =
      StreamingEntity.attach(
        stream.toDF().toDF("id", "name", "size"), master, "id",
        Seq(substring(col("name"), 1, 1)),
        editFields = Seq("name" -> 0.6), closeFields = Seq("size" -> 0.4),
        threshold = 0.7, extend = true, statePath = statePath,
        checkpoint = checkpoint) { (pairs, id) =>
        got(id) = pairs.collect().map(_.toString).toSet
      }
    // b2's record 202 matches b1's 201 (a mid-stream entity catching its
    // later duplicate), which a frozen master could never produce
    val b1 = Seq((201L, "omega shaft", 50L))
    val b2 = Seq((202L, "omega shafts", 50L))
    val s1 = MemoryStream[(Long, String, Long)](spark)
    val q1 = run(s1, ckpt)
    try {
      s1.addData(b1: _*); q1.processAllAvailable()
      assert(got(0L) === link(b1.toDF("id", "name", "size"), master))
      s1.addData(b2: _*); q1.processAllAvailable()
      val expect1 = link(b2.toDF("id", "name", "size"),
        master.unionByName(b1.toDF("id", "name", "size")))
      assert(got(1L) === expect1)
      assert(got(1L).exists(_.contains("201")), "mid-stream entity not caught")
    } finally q1.stop()

    // same checkpoint -> both batches REPLAY; the store must not
    // double-append and the final pairs must be unchanged
    val s2 = MemoryStream[(Long, String, Long)](spark)
    s2.addData(b1: _*); s2.addData(b2: _*)
    val q2 = run(s2, ckpt)
    try {
      q2.processAllAvailable()
      val store = StreamingEntity.currentStore(spark, statePath).get
      assert(store.count() === 2, "replay double-appended the store")
    } finally q2.stop()

    // fresh checkpoint -> ids restart; stale forward stagings purge
    val s3 = MemoryStream[(Long, String, Long)](spark)
    val q3 = run(s3, tmpDir("sent-x-ckpt2"))
    try {
      s3.addData((301L, "kappa bolt", 7L)); q3.processAllAvailable()
      val store = StreamingEntity.currentStore(spark, statePath).get
      assert(store.count() === 1)
    } finally q3.stop()
  }
}
