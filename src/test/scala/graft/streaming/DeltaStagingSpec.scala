package graft.streaming

import graft.SparkSpec

/** Model-based unit coverage for [[DeltaStaging]] — the durable substrate
  * under every self-extending attach. A driver-side map of
  * `id → staged rows` is the model; after every operation the store's
  * listing and contents must match it exactly, including the `_SUCCESS`
  * commit-visibility rule (an uncommitted dir is invisible, not an
  * error). */
class DeltaStagingSpec extends SparkSpec {

  import spark.implicits._

  private def rows(ids: Long*): Seq[(Long, String)] = ids.map(i => (i, s"v$i"))

  test("stage/purge/read track a model over a random op sequence") {
    val statePath = tmpDir("ds-model") + "/state"
    val model = scala.collection.mutable.Map.empty[Long, Set[(Long, String)]]
    def check(): Unit = {
      assert(DeltaStaging.stagedIds(spark, statePath).toSet == model.keySet)
      val all = DeltaStaging.allDeltas(spark, statePath)
        .map(_.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
        .getOrElse(Set.empty)
      assert(all == model.values.flatten.toSet)
      model.keySet.foreach { id =>
        val got = DeltaStaging.read(spark, statePath, id)
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got == model(id), s"staging $id content drift")
      }
    }
    def stage(id: Long, data: Seq[(Long, String)]): Unit = {
      DeltaStaging.stage(data.toDF("k", "v"), statePath, id)
      model(id) = data.toSet
      check()
    }
    check() // empty store
    stage(0L, rows(1, 2))
    stage(1L, rows(3))
    stage(2L, rows(4, 5, 6))
    // replay: overwriting an id replaces its content, nothing else moves
    stage(1L, rows(30, 31))
    // deltasBelow: strict upper bound over committed ids
    val below2 = DeltaStaging.deltasBelow(spark, statePath, 2L).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(below2 == model(0L) ++ model(1L))
    assert(DeltaStaging.deltasBelow(spark, statePath, 0L).isEmpty)
    // deltasFor: explicit id set
    val just02 = DeltaStaging.deltasFor(spark, statePath, Seq(0L, 2L)).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(just02 == model(0L) ++ model(2L))
    // purgeAtOrAbove: incarnation reset
    DeltaStaging.purgeAtOrAbove(spark, statePath, 1L)
    model.keySet.filter(_ >= 1L).foreach(model.remove)
    check()
    stage(0L, rows(9)) // a fresh incarnation's own batch 0 overwrite
    stage(1L, rows(10))
    stage(2L, rows(11))
    // purgeBelow: the prefix-merge prune
    DeltaStaging.purgeBelow(spark, statePath, 2L)
    model.keySet.filter(_ < 2L).foreach(model.remove)
    check()
    // clear: everything gone, committed or not
    DeltaStaging.clear(spark, statePath)
    model.clear()
    check()
  }

  test("an uncommitted staging dir (no _SUCCESS) is invisible and purgeable, never an error") {
    val statePath = tmpDir("ds-raw") + "/state"
    DeltaStaging.stage(rows(1).toDF("k", "v"), statePath, 0L)
    // fabricate a crash-mid-write dir: parquet files present, marker gone
    val d = new java.io.File(DeltaStaging.dir(statePath, 5L))
    val src = new java.io.File(DeltaStaging.dir(statePath, 0L))
    org.apache.commons.io.FileUtils.copyDirectory(src, d)
    assert(new java.io.File(d, "_SUCCESS").delete())
    // invisible to every reader
    assert(DeltaStaging.stagedIds(spark, statePath) == Seq(0L))
    assert(DeltaStaging.allDeltas(spark, statePath).get.count() == 1)
    // a replay of id 5 purges the debris (at-or-above covers marker-less dirs)
    DeltaStaging.purgeAtOrAbove(spark, statePath, 5L)
    assert(!d.exists())
    assert(DeltaStaging.stagedIds(spark, statePath) == Seq(0L))
    // stray non-staging dirs never throw and never list
    assert(new java.io.File(statePath, "not-a-staging").mkdirs())
    assert(DeltaStaging.stagedIds(spark, statePath) == Seq(0L))
  }
}
