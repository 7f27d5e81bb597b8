package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.{FooterManifest, ManifestFileIndex, PrunedScan, RangeProbe}

/** Manifest bootstrap from parquet footers (round-15 verdict task 2):
  * the footer-harvested manifest must equal the data-computed one on an
  * assignedWrite table (modulo the declared type coverage), and it must
  * drive the SAME pruned reads — including over a PLAIN
  * `df.write.parquet` table with file identity derived from filenames. */
class FooterManifestSpec extends SparkSpec {

  import spark.implicits._

  private def table: DataFrame =
    (0 until 400).map { i =>
      (i.toLong, i, (i % 37).toShort,
        java.sql.Date.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(i)),
        f"s$i%03d", i / 10.0,
        if (i % 100 == 7) None else Some(i.toLong))
    }.toDF("v", "vi", "vs", "d", "s", "x", "maybe")

  private val statCols = Seq("v", "vi", "vs", "d", "s", "x", "maybe")

  test("assignedWrite table: footer manifest == data manifest row-for-row " +
      "across the declared type coverage") {
    val dir = tmpDir("fman") + "/t"
    val order = Seq(col("v").asc)
    Layout.assignedWrite(table, order, 8, dir)
    val fromData = Layout.fileManifest(table, order, 8, statCols)
    val fromFooters = FooterManifest.fromFooters(spark, dir, statCols)
    val cols = "file_id" +: "n_rows" +:
      statCols.flatMap(c => Seq(s"${c}_min", s"${c}_max", s"${c}_nulls"))
    def canon(df: DataFrame) = df
      .select(cols.map(col): _*).orderBy("file_id")
      .collect().map(_.toSeq).toSeq
    assert(canon(fromFooters) === canon(fromData))
    // and the path column points at the file_id dirs
    assert(fromFooters.select("path").collect()
      .forall(_.getString(0).contains("file_id=")))
  }

  test("plain df.write.parquet table: footer manifest prunes by PATH — " +
      "explicit probes and the transparent index both read fewer files, " +
      "answers stay exactly the full scan's") {
    val dir = tmpDir("fman-p") + "/t"
    // a deterministic 8-file split with v-disjoint files: sortWithinPartitions
    // after a range exchange — the file CONTENTS vary with the sampler, so
    // every expectation below derives from the footer manifest itself
    table.repartitionByRange(8, col("v")).sortWithinPartitions("v")
      .write.parquet(dir)
    val man = FooterManifest.fromFooters(spark, dir, Seq("v", "maybe"))
      .localCheckpoint(true)
    assert(man.count() === 8L)
    assert(man.agg(sum("n_rows")).collect()(0).getLong(0) === 400L)
    // ids are filename ranks: distinct, 0..7
    assert(man.select("file_id").collect().map(_.getLong(0)).sorted
      === (0L until 8L).toArray)
    val probes = Seq(RangeProbe("v", lit(120L), lit(260L)))
    val survivors = PrunedScan.survivorIds(man, probes)
    assert(survivors.nonEmpty && survivors.size < 8)
    // explicit path-granularity read
    val pruned = PrunedScan.prunedParquetPaths(spark, dir, man, probes)
      .where(col("v") >= 120L && col("v") < 260L)
    val got = pruned.collect().map(_.getAs[Long]("v")).toSet
    assert(got === (120L until 260L).toSet)
    assert(PrunedScan.filesRead(pruned) === survivors.size.toLong)
    // transparent index over the SAME plain table (no partition values:
    // pruning must happen at file granularity through the path map)
    val t = ManifestFileIndex.manifestParquet(spark, dir, man)
    val q = t.where(col("v") >= 120L && col("v") < 260L)
    assert(q.collect().map(_.getAs[Long]("v")).toSet === got)
    assert(PrunedScan.filesRead(q) === survivors.size.toLong)
    // null-count harvest: IS NULL keeps only files with nulls
    val nulls = t.where(col("maybe").isNull)
    assert(nulls.collect().map(_.getAs[Long]("v")).toSet ===
      Set(7L, 107L, 207L, 307L))
    val nullFiles = man.filter(col("maybe_nulls") > 0L).count()
    assert(PrunedScan.filesRead(nulls) === nullFiles)
  }

  test("unsupported stat type and absent column fail loudly") {
    val dir = tmpDir("fman-u") + "/t"
    Seq((1L, BigDecimal(1.5)), (2L, BigDecimal(2.5))).toDF("v", "dec")
      .write.parquet(dir)
    intercept[IllegalArgumentException] {
      FooterManifest.fromFooters(spark, dir, Seq("dec"))
    }
    intercept[IllegalArgumentException] {
      FooterManifest.fromFooters(spark, dir, Seq("nope"))
    }
  }
}
