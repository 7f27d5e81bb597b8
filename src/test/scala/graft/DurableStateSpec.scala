package graft

import org.apache.spark.sql.types.StructType

import graft.streaming.DurableState

/** DurableState crash-consistency edges: _SUCCESS as the commit marker,
  * multi-version restore, stale-version cleanup, version continuation. */
class DurableStateSpec extends SparkSpec {

  private val schema = StructType.fromDDL("k BIGINT, v STRING")

  private def rows(s: DurableState): Set[(Long, String)] =
    s.current.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("restore picks the highest committed version and continues versioning") {
    import spark.implicits._
    val dir = tmpDir("ds-restore")
    val s1 = new DurableState(spark, schema, Some(dir))
    s1.swap(_ => Seq((1L, "a")).toDF("k", "v"))
    s1.swap(cur => cur.unionByName(Seq((2L, "b")).toDF("k", "v")))
    assert(s1.currentVersion == 2)
    s1.release()

    val s2 = new DurableState(spark, schema, Some(dir))
    assert(s2.currentVersion == 2)
    assert(rows(s2) == Set((1L, "a"), (2L, "b")))
    s2.swap(cur => cur.unionByName(Seq((3L, "c")).toDF("k", "v")))
    assert(s2.currentVersion == 3)
    assert(rows(s2) == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("a version dir without _SUCCESS (crashed mid-write) is ignored on restore") {
    import spark.implicits._
    val dir = tmpDir("ds-crash")
    val s1 = new DurableState(spark, schema, Some(dir))
    s1.swap(_ => Seq((1L, "a")).toDF("k", "v"))
    s1.release()
    // fake a crash: v2 exists with data files but no _SUCCESS commit marker
    val v2 = java.nio.file.Paths.get(dir, "v2")
    java.nio.file.Files.createDirectories(v2)
    java.nio.file.Files.writeString(v2.resolve("part-garbage.parquet"), "not parquet")

    val s2 = new DurableState(spark, schema, Some(dir))
    assert(s2.currentVersion == 1) // v2 uncommitted -> ignored
    assert(rows(s2) == Set((1L, "a")))
    // the next swap REUSES the version slot and overwrites the garbage
    s2.swap(cur => cur.unionByName(Seq((2L, "b")).toDF("k", "v")))
    assert(rows(s2) == Set((1L, "a"), (2L, "b")))
    val s3 = new DurableState(spark, schema, Some(dir))
    assert(s3.currentVersion == 2 && rows(s3) == rows(s2))
  }

  test("stale spill versions are cleaned, keeping a few for in-flight readers") {
    import spark.implicits._
    val dir = tmpDir("ds-clean")
    val s = new DurableState(spark, schema, Some(dir))
    (1 to 7).foreach(i => s.swap(_ => Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val kept = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("v")).sorted
    // four deep: readers holding frames a few swaps stale must still find
    // their parquet files; anything older goes
    assert(kept.toSeq == Seq("v4", "v5", "v6", "v7"), s"got ${kept.toSeq}")
  }

  test("no stateDir: lineage is truncated on the spill cadence, state correct") {
    import spark.implicits._
    val s = new DurableState(spark, schema, stateDir = None, spillEvery = 4)
    (1 to 12).foreach { i =>
      s.swap(cur => cur.unionByName(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    }
    assert(s.current.count() == 12)
    val nodes = s.current.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nodes <= 12, s"plan has $nodes nodes") // 12 unions would be ~25+
  }

  test("empty initial state has the declared schema") {
    val s = new DurableState(spark, schema, None)
    assert(s.current.schema == schema)
    assert(s.current.count() == 0)
  }

  test("appendDelta: delta chain restores ≡ the full state; versions continue") {
    import spark.implicits._
    val dir = tmpDir("ds-delta")
    val s1 = new DurableState(spark, schema, Some(dir), compactEvery = 100)
    (1 to 5).foreach(i => s1.appendDelta(_ => Seq((i.toLong, s"v$i")).toDF("k", "v")))
    assert(s1.currentVersion == 5)
    assert(rows(s1) == (1 to 5).map(i => (i.toLong, s"v$i")).toSet)
    s1.release()

    // restore = no full snapshot yet, just the committed delta chain
    val s2 = new DurableState(spark, schema, Some(dir), compactEvery = 100)
    assert(s2.currentVersion == 5)
    assert(rows(s2) == rows(s1))
    s2.appendDelta(_ => Seq((6L, "v6")).toDF("k", "v"))
    assert(s2.currentVersion == 6 && rows(s2).size == 6)
  }

  test("appendDelta: empty delta is a complete no-op (no write, no version)") {
    import spark.implicits._
    val dir = tmpDir("ds-delta-empty")
    val s = new DurableState(spark, schema, Some(dir))
    s.appendDelta(_ => Seq((1L, "a")).toDF("k", "v"))
    val before = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(s.appendDelta(_ => Seq.empty[(Long, String)].toDF("k", "v")).isEmpty)
    assert(s.currentVersion == 1)
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet == before)
    assert(rows(s) == Set((1L, "a")))
  }

  test("appendDelta: compaction supersedes the chain; restore ≡; old deltas cleaned") {
    import spark.implicits._
    val dir = tmpDir("ds-compact")
    val s = new DurableState(spark, schema, Some(dir), compactEvery = 3)
    (1 to 7).foreach(i => s.appendDelta(_ => Seq((i.toLong, s"v$i")).toDF("k", "v")))
    // compactions fired at versions 3 and 6 -> full snapshots exist
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names.contains("v3") && names.contains("v6"), s"got $names")
    // deltas older than the reader-grace horizon of the last snapshot are gone
    assert(!names.contains("d1") && !names.contains("d2"), s"got $names")
    assert(rows(s) == (1 to 7).map(i => (i.toLong, s"v$i")).toSet)
    s.release()
    val s2 = new DurableState(spark, schema, Some(dir), compactEvery = 3)
    assert(s2.currentVersion == 7)
    assert(rows(s2) == rows(s))
  }

  test("appendDelta: crash mid-compaction restores the pre-compaction chain") {
    import spark.implicits._
    val dir = tmpDir("ds-compact-crash")
    val s = new DurableState(spark, schema, Some(dir), compactEvery = 3)
    (1 to 3).foreach(i => s.appendDelta(_ => Seq((i.toLong, s"v$i")).toDF("k", "v")))
    s.release()
    // fake a crash DURING the v3 compaction write: kill its commit marker.
    // The superseded deltas d1..d3 are still on disk (cleanup is ordered
    // after the snapshot commit), so restore must fall back to them.
    val marker = java.nio.file.Paths.get(dir, "v3", "_SUCCESS")
    assert(java.nio.file.Files.deleteIfExists(marker))
    val s2 = new DurableState(spark, schema, Some(dir), compactEvery = 3)
    assert(s2.currentVersion == 3)
    assert(rows(s2) == Set((1L, "v1"), (2L, "v2"), (3L, "v3")))
  }

  test("swap with pending deltas forces a full spill (replace cannot resurrect)") {
    import spark.implicits._
    val dir = tmpDir("ds-mixed")
    // spillEvery = 1000: this swap would normally NOT spill on cadence
    val s = new DurableState(spark, schema, Some(dir), spillEvery = 1000)
    s.appendDelta(_ => Seq((1L, "a")).toDF("k", "v"))
    s.swap(_ => Seq((9L, "replaced")).toDF("k", "v"))
    s.release()
    // a crash here must restore the REPLACED state, not d1 over an older
    // snapshot (which would resurrect k=1)
    val s2 = new DurableState(spark, schema, Some(dir), spillEvery = 1000)
    assert(rows(s2) == Set((9L, "replaced")), s"got ${rows(s2)}")
  }
}
