package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.{ManifestFileIndex, PrunedScan}

/** Metadata-only aggregates over a manifest-pruned table: a PLAIN
  * `spark.sql("SELECT COUNT(*), MIN(c), MAX(c) FROM t")` rewrites to a
  * one-row LocalRelation — zero files read — with values identical to
  * the scan's; anything not provably servable (filters, GROUP BY,
  * DISTINCT, expressions, uncovered columns) falls through to the
  * normal pruned scan. */
class ManifestAggRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def table: DataFrame =
    (0 until 400).map(i =>
      (i.toLong, if (i % 100 == 7) None else Some((i * 3).toLong)))
      .toDF("v", "maybe")

  private def open(dir: String): DataFrame = {
    val order = Seq(col("v").asc)
    Layout.assignedWrite(table, order, 8, dir)
    val man = Layout.fileManifest(table, order, 8, Seq("v", "maybe"))
      .localCheckpoint(true)
    ManifestFileIndex.manifestParquet(spark, dir, man)
  }

  test("COUNT(*) / COUNT(c) / MIN / MAX rewrite to a LocalRelation with " +
      "exact, null-aware values; zero files read") {
    val dir = tmpDir("mar") + "/t"
    open(dir).createOrReplaceTempView("mar_t")
    try {
      val q = spark.sql(
        """SELECT COUNT(*) AS n, COUNT(maybe) AS nm,
                  MIN(v) AS vmin, MAX(v) AS vmax,
                  MIN(maybe) AS mmin, MAX(maybe) AS mmax
           FROM mar_t""")
      val r = q.collect()(0)
      assert(r.getLong(0) === 400L)
      assert(r.getLong(1) === 396L)  // 4 planted nulls
      assert(r.getLong(2) === 0L && r.getLong(3) === 399L)
      assert(r.getLong(4) === 0L && r.getLong(5) === 1197L)
      assert(PrunedScan.filesRead(q) === 0L)
      assert(q.queryExecution.optimizedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
      // the DataFrame API path rewrites too
      val d = graft.sources.ManifestFileIndex
        .manifestParquet(spark, dir,
          Layout.fileManifest(table, Seq(col("v").asc), 8, Seq("v"))
            .localCheckpoint(true))
        .agg(count(lit(1)).as("n"), max(col("v")).as("m"))
      assert(d.collect()(0).getLong(0) === 400L)
      assert(PrunedScan.filesRead(d) === 0L)
    } finally spark.catalog.dropTempView("mar_t")
  }

  test("conservatism: filters, GROUP BY, DISTINCT, expressions, and " +
      "uncovered columns all fall through to the scan — same answers") {
    val dir = tmpDir("mar-c") + "/t"
    open(dir).createOrReplaceTempView("mar_c")
    try {
      // a filter declines the rewrite (and still prunes the listing)
      val f = spark.sql("SELECT COUNT(*) FROM mar_c WHERE v >= 350")
      assert(f.collect()(0).getLong(0) === 50L)
      assert(PrunedScan.filesRead(f) === 1L)
      // GROUP BY declines
      val g = spark.sql(
        "SELECT v % 2 AS p, COUNT(*) FROM mar_c GROUP BY 1")
      assert(g.collect().map(_.getLong(1)).sum === 400L)
      assert(PrunedScan.filesRead(g) === 8L)
      // DISTINCT declines
      val dd = spark.sql("SELECT COUNT(DISTINCT v) FROM mar_c")
      assert(dd.collect()(0).getLong(0) === 400L)
      assert(PrunedScan.filesRead(dd) === 8L)
      // an expression argument declines
      val e = spark.sql("SELECT MIN(v + 1) FROM mar_c")
      assert(e.collect()(0).getLong(0) === 1L)
      assert(PrunedScan.filesRead(e) === 8L)
      // uncovered column declines (manifest has no file_id stats)
      val u = spark.sql("SELECT MAX(file_id) FROM mar_c")
      u.collect()
      assert(PrunedScan.filesRead(u) === 8L)
      // runtime off-switch
      spark.conf.set("spark.graft.manifestAgg", "false")
      try {
        val off = spark.sql("SELECT COUNT(*) FROM mar_c")
        assert(off.collect()(0).getLong(0) === 400L)
        assert(PrunedScan.filesRead(off) === 8L)
      } finally spark.conf.set("spark.graft.manifestAgg", "true")
    } finally spark.catalog.dropTempView("mar_c")
  }
}
