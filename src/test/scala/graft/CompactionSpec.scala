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

  // ── SCD Type-2 ──────────────────────────────────────────────────────────

  /** Naive model: collapse same-(k, ts) by max (seq, v, op), order by ts,
    * close each row with the next version's ts, drop delete rows. */
  private def scd2Model(rows: Seq[(Long, Long, Long, Double, String)])
      : Set[(Long, Double, Long, Option[Long], Boolean)] =
    rows.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((k, ts), vs) =>
        val w = vs.maxBy(r => (r._3, r._4, r._5))
        (k, ts, w._4, w._5)
      }
      .groupBy(_._1).toSeq.flatMap { case (k, vsU) =>
        val vs = vsU.sortBy(_._2)
        vs.zipWithIndex.collect { case ((_, ts, v, op), i) if op != "D" =>
          val to = if (i + 1 < vs.size) Some(vs(i + 1)._2) else None
          (k, v, ts, to, to.isEmpty)
        }
      }.toSet

  private def scd2Set(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Double, Long, Option[Long], Boolean)] =
    df.collect().map { r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))
    }.toSet

  test("scd2 == interval model on random CDC with deletes and same-ts ties (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(11, 42, 901)) {
      val rng = new Random(seed)
      // small ts domain FORCES same-(key, ts) collisions; ~15% deletes
      val rows = (0 until 800).map { i =>
        (rng.nextInt(40).toLong, rng.nextInt(25).toLong, i.toLong,
          rng.nextInt(1000) / 10.0,
          if (rng.nextInt(100) < 15) "D" else "U")
      }
      val got = Compaction.scd2(
        rows.toDF("k", "ts", "seq", "v", "op"), Seq("k"), "ts", Seq("v"),
        seqCol = Some("seq"), opCol = Some("op"))
      assert(scd2Set(got) === scd2Model(rows), s"seed $seed")
    }
  }

  test("scd2 tombstone contracts: close-only, gap on re-insert, no current after trailing delete") {
    import spark.implicits._
    val rows = Seq(
      // key 1: U@1, D@3, U@5 -> [1,3) then [5,inf); the [3,5) gap is uncovered
      (1L, 1L, 0L, 10.0, "U"), (1L, 3L, 1L, 0.0, "D"), (1L, 5L, 2L, 11.0, "U"),
      // key 2: a delete-first key opens nothing
      (2L, 1L, 3L, 0.0, "D"),
      // key 3: trailing delete -> closed interval, NO current row
      (3L, 2L, 4L, 30.0, "U"), (3L, 9L, 5L, 0.0, "D"))
    val got = scd2Set(Compaction.scd2(
      rows.toDF("k", "ts", "seq", "v", "op"), Seq("k"), "ts", Seq("v"),
      seqCol = Some("seq"), opCol = Some("op")))
    assert(got === Set(
      (1L, 10.0, 1L, Some(3L), false),
      (1L, 11.0, 5L, None, true),
      (3L, 30.0, 2L, Some(9L), false)))
  }

  test("scd2 same-timestamp tie-break: seq wins when supplied, else greatest payload") {
    import spark.implicits._
    val rows = Seq(
      (1L, 5L, 1L, 99.0, "U"), (1L, 5L, 2L, 7.0, "U")) // higher seq, lower v
    val df = rows.toDF("k", "ts", "seq", "v", "op")
    val withSeq = scd2Set(Compaction.scd2(
      df, Seq("k"), "ts", Seq("v"), seqCol = Some("seq"), opCol = Some("op")))
    assert(withSeq === Set((1L, 7.0, 5L, None, true)))
    val noSeq = Compaction.scd2(df, Seq("k"), "ts", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(noSeq === Set((1L, 99.0)))
  }

  test("scd2 composition: the interval probe reproduces AsOfJoin.asOf row-for-row") {
    import graft.operators.AsOfJoin
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new Random(77)
    // duplicate (k, ts) right rows exercise the shared greatest-payload
    // tie-break; probes land before, between, on, and after versions
    val cdc = (0 until 400).map(i =>
      (rng.nextInt(20).toLong, rng.nextInt(40).toLong, rng.nextInt(500).toDouble))
      .toDF("k", "ts", "v")
    val probes = (0 until 600).map(i =>
      (i.toLong, rng.nextInt(25).toLong, rng.nextInt(50).toLong))
      .toDF("id", "k", "t")
    val viaAsOf = AsOfJoin.asOf(
        probes, cdc, Seq("k"), Seq("k"), "t", "ts", Seq("v"))
      .select("id", "k", "t", "v")
    val hist = Compaction.scd2(cdc, Seq("k"), "ts", Seq("v"))
    val viaIntervals = probes.join(hist,
        probes("k") === hist("k") &&
          probes("t") >= hist("effective_from") &&
          (hist("effective_to").isNull || probes("t") < hist("effective_to")),
        "left")
      .select(probes("id"), probes("k"), col("t"), col("v"))
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(rs(viaIntervals) === rs(viaAsOf))
  }
}
