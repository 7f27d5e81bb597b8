package graft

import scala.util.Random

import graft.operators.Compaction

/** Compaction/upsert semantics vs an independent Scala fold model
  * (SURVEY §5.3: compaction vs reduceByKey oracle; upsert idempotence). */
class CompactionSpec extends SparkSpec {

  private def model(rows: Seq[(Long, Long, String)]): Map[Long, (Long, String)] =
    rows.groupBy(_._1).map { case (k, vs) =>
      val best = vs.maxBy(_._2)
      k -> (best._2, best._3)
    }

  test("latestByKey == max-fold model on random data (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(7, 99, 1234)) {
      val rng = new Random(seed)
      // unique (key, ord) so the argmax is well-defined
      val rows = rng.shuffle(
        (for (k <- 0L until 20L; o <- 0L until 10L) yield (k, o, s"v$k-$o-${rng.nextInt(9)}"))
          .toSeq).take(120)
      val df = rows.toDF("k", "ord", "v")
      val got = Compaction.latestByKey(df, Seq("k"), "ord")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got == model(rows))
    }
  }

  test("applyUpserts: newest wins and applying a batch twice is idempotent") {
    import spark.implicits._
    val snap = Seq((1L, 1L, "old1"), (2L, 1L, "old2")).toDF("k", "ord", "v")
    val upd = Seq((1L, 2L, "new1"), (3L, 1L, "new3")).toDF("k", "ord", "v")
    val once = Compaction.applyUpserts(snap, upd, Seq("k"), "ord")
    val twice = Compaction.applyUpserts(once, upd, Seq("k"), "ord")
    val expect = Set((1L, 2L, "new1"), (2L, 1L, "old2"), (3L, 1L, "new3"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(asSet(once) == expect)
    assert(asSet(twice) == expect)
  }

  test("typed Dataset facade: events load with compile-checked schema") {
    val ds = graft.model.Schemas.events(spark, "/root/testdata/sf0.001")
    val e = ds.head() // typed access, no Row casts
    assert(e.event_id >= 0L && e.ts > 0L)
    assert(ds.filter((ev: graft.model.Event) => ev.value >= 0.0).count() > 0)
  }

  test("deleteKeys removes exactly the evicted keys") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val evicted = Seq(Tuple1(2L), Tuple1(9L)).toDF("k")
    val got = Compaction.deleteKeys(snap, evicted, "k")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("snapshotDiff: added/removed/changed classified, unchanged dropped") {
    import spark.implicits._
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val after = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val got = Compaction.snapshotDiff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("snapshotDiff: null-safe compare — null→value flips are changes, null==null is not") {
    import spark.implicits._
    val before = Seq[(java.lang.Long, String)]((1L, null), (2L, null), (3L, "x"))
      .toDF("k", "s")
    val after = Seq[(java.lang.Long, String)]((1L, null), (2L, "now"), (3L, null))
      .toDF("k", "s")
    val got = Compaction.snapshotDiff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "changed"))
  }

  test("snapshotDiff: compareCols restricts what counts as a change") {
    import spark.implicits._
    val before = Seq((1L, "a", 10.0)).toDF("k", "s", "v")
    val after = Seq((1L, "a", 99.0)).toDF("k", "s", "v")
    assert(Compaction.snapshotDiff(before, after, Seq("k"), Seq("s")).count() == 0)
    assert(Compaction.snapshotDiff(before, after, Seq("k"), Seq("v"))
      .head().getString(1) == "changed")
  }
}
