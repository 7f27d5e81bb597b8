package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.SparkSession

/** Streaming file-pruning manifest — the incrementally-maintained form of
  * [[graft.operators.Layout.fileManifest]] (q88): a streaming ingest
  * appends one data file per trigger, and the manifest — per-file
  * `n_rows` + `<col>_min` / `<col>_max` / `<col>_nulls` — is maintained
  * alongside it so the q88 estimators ([[graft.operators.Layout.pruneRange]]
  * / [[graft.operators.Layout.pruneEqual]], same column contract) answer
  * "which files can predicate P touch?" over the LIVE table without
  * listing or opening anything. This is how a real lake keeps footer
  * statistics: collected at write time per file, appended to a manifest
  * log, compacted occasionally — never recomputed from data.
  *
  * The file identity is the micro-batch id (`file_id = batchId` — the
  * batch IS the file a streaming writer would emit for it), so the stats
  * row is a pure function of the batch and replay is idempotent by
  * construction.
  *
  * State discipline = the [[StreamingKll]]/[[StreamingHll]] prefix-staging
  * recipe under [[DeltaStaging]]: each staging holds the FULL manifest up
  * to its batch id (one row per non-empty file — the manifest IS
  * file-count-sized, the entire point), a replayed batch id purges and
  * rewrites its own staging instead of double-appending, and a fresh
  * incarnation purges ids at or above its own. Per-trigger cost: one
  * map-side-combined aggregate of the BATCH to a single stats row + a
  * rewrite of the nFiles-row manifest. Nothing ever re-reads the data.
  */
object StreamingManifest {

  /** Latest committed manifest (None before the first trigger). Columns:
    * `file_id, n_rows, <col>_min, <col>_max, <col>_nulls` per stat column
    * — feed directly to [[graft.operators.Layout.pruneRange]] /
    * [[graft.operators.Layout.pruneEqual]]. */
  def currentManifest(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  /** The SIBLING state root holding per-file Bloom registers for one
    * column (kept out of the manifest's own [[DeltaStaging]] tree so
    * neither staging family can mistake the other's dirs for its own). */
  private def bloomRoot(statePath: String, c: String): String =
    s"$statePath-bloom-$c"

  /** Sibling root for one MG key set's per-file summaries (same
    * isolation rationale as [[bloomRoot]]). */
  private def mgRoot(statePath: String, keys: Seq[String]): String =
    s"$statePath-mg-${keys.mkString("+")}"

  /** Latest committed per-file Bloom register frame for `column` (None
    * before the first trigger, or if the attach was not configured with a
    * Bloom for this column). Shape = [[graft.operators.Bloom.registers]]
    * keyed by `file_id` — feed to
    * [[graft.sources.PrunedScan]] as a [[graft.sources.BloomSidecar]] so
    * equality probes on unsorted columns prune the LIVE table (round-14
    * verdict task 5: without this, such probes stayed unprunable until a
    * batch q97 rebuild). */
  def currentBloom(
      spark: SparkSession, statePath: String, column: String): Option[DataFrame] = {
    val root = bloomRoot(statePath, column)
    DeltaStaging.stagedIds(spark, root).maxOption
      .map(b => DeltaStaging.read(spark, root, b))
  }

  /** Latest committed PER-FILE MG summary frame for one key set (None
    * before the first trigger, or if the attach was not configured with
    * `mgKeys` for it): `(file_id, _item, _w, _n, _terr)` rows — the
    * live twin of the [[graft.sources.GraftTable]] `mg_<keys>/` sidecar
    * (round-16 verdict task 4's "batch + StreamingManifest" clause). */
  def currentMg(
      spark: SparkSession, statePath: String,
      keys: Seq[String]): Option[DataFrame] = {
    val root = mgRoot(statePath, keys)
    DeltaStaging.stagedIds(spark, root).maxOption
      .map(b => DeltaStaging.read(spark, root, b))
  }

  /** [[currentMg]] merged to the single-group routing summary
    * [[graft.operators.SkewJoin.decide]] consumes — zero-pass join
    * routing against the LIVE table: the mergeable-summaries rule
    * (weights add, error budgets add), so `topKeyShareLb` stays a
    * routing-safe lower bound for the whole streamed corpus. */
  def currentKeyFreq(
      spark: SparkSession, statePath: String, keys: Seq[String],
      k: Int): Option[DataFrame] =
    currentMg(spark, statePath, keys).map { perFile =>
      // scope to the ids the CURRENT manifest lists — the sidecar may
      // carry superset rows from compaction's crash-window staging
      // (exactly how Bloom consumers are implicitly scoped by their
      // file_id join); without this a just-compacted table would count
      // every key twice (old-id and re-derived new-id rows)
      val listed = currentManifest(spark, statePath).map(
        _.select(col("file_id").cast("long"))
          .collect().map(_.getLong(0)).toSeq)
      val scoped = listed
        .map(ids => perFile.where(
          col("file_id").cast("long").isInCollection(ids)))
        .getOrElse(perFile)
      val relabeled = scoped
        .withColumn("_sj_g",
          pmod(length(coalesce(col("_item"), lit(""))), lit(1)))
        .drop("file_id")
      graft.operators.Mg.merge(
        relabeled, relabeled.limit(0), Seq("_sj_g"), k)
    }

  /** The one-file stats row of a batch (shared by the attach and the
    * batch-parity spec): `file_id = id`, exact n_rows, min/max/null-count
    * per stat column — min/max ignore nulls (SQL semantics), so an
    * all-null file carries null bounds and a full null count: a range
    * probe skips it, an IS NULL probe keeps it. */
  def fileStats(batch: DataFrame, statCols: Seq[String], id: Long): DataFrame = {
    require(statCols.nonEmpty, "fileStats: no stat columns")
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    }
    batch.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(lit(id).as("file_id") +: (col("n_rows") +:
        statCols.flatMap(c => Seq(
          col(s"${c}_min"), col(s"${c}_max"), col(s"${c}_nulls")))): _*)
  }

  /** Attach manifest maintenance to a streaming DataFrame. After each
    * trigger, `sink` receives the refreshed COMMITTED manifest and the
    * batch id. Empty batches append no file row (a writer emits no file)
    * but still commit a staging, so replay stays idempotent.
    *
    * `bloomCols` (column, mBits, k) adds a per-file Bloom register
    * sidecar per entry: each trigger builds
    * [[graft.operators.Bloom.registers]] over the BATCH keyed by its
    * `file_id` and appends those rows to the column's sibling staging
    * under the identical purge/replay discipline. Per-file registers
    * never fold ACROSS files (each file keeps its own filter — the q97
    * shape), and a replayed batch rewrites register rows that are a pure
    * function of the batch, so replay is idempotent by the same argument
    * as the stats row (the q76 OR-merge determinism, applied per file). */
  /** `mgKeys` (keyCols, k) adds a per-file MG summary sidecar per entry
    * — the injectively-encoded join key's MG-k state per batch-file,
    * staged under [[mgRoot]] with the identical purge/replay discipline,
    * feeding [[currentKeyFreq]]'s zero-pass join routing. Staged before
    * the manifest like the Blooms; either crash order keeps the MG
    * lower-bound direction safe for routing (an extra unlisted file's
    * summary inflates, a missing newest file's deflates — both within
    * the decide contract's error budget). */
  def attach(
      df: DataFrame, statCols: Seq[String], statePath: String,
      checkpoint: String,
      bloomCols: Seq[(String, Int, Int)] = Nil,
      mgKeys: Seq[(Seq[String], Int)] = Nil)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        // incarnation safety: stagings at or above this id are a prior
        // run's state (a replay rewrites its own staging below)
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        val prev = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => DeltaStaging.read(spark, statePath, b))
        val delta = fileStats(batch, statCols, id)
          .filter(col("n_rows") > 0L)
        val merged = prev.map(_.unionByName(delta)).getOrElse(delta)
        // bloom sidecars stage BEFORE the manifest (round-15 advice): a
        // reader is driven by the manifest's file list, so a sidecar that
        // is AHEAD of the manifest (extra register rows for a not-yet-
        // listed file_id) is harmless, while a sidecar BEHIND it would
        // make mightContain return false for the newest file and probed()
        // silently prune it — a false negative. With bloom-ahead order, a
        // crash between the two stage calls leaves the pair readable and
        // exact until the batch replays.
        bloomCols.foreach { case (c, mBits, k) =>
          val root = bloomRoot(statePath, c)
          DeltaStaging.purgeAtOrAbove(spark, root, id)
          val prevRegs = DeltaStaging.stagedIds(spark, root)
            .filter(_ < id).maxOption
            .map(b => DeltaStaging.read(spark, root, b))
          val regsDelta = graft.operators.Bloom.registers(
            batch.withColumn("file_id", lit(id)), Seq("file_id"), c,
            mBits, k)
          val regsMerged = prevRegs
            .map(_.unionByName(regsDelta)).getOrElse(regsDelta)
          DeltaStaging.stage(regsMerged, root, id)
          DeltaStaging.purgeBelow(spark, root, id - 1)
        }
        mgKeys.foreach { case (keys, k) =>
          val root = mgRoot(statePath, keys)
          DeltaStaging.purgeAtOrAbove(spark, root, id)
          val prevMg = DeltaStaging.stagedIds(spark, root)
            .filter(_ < id).maxOption
            .map(b => DeltaStaging.read(spark, root, b))
          val mgDelta = graft.operators.Mg.summarize(
            batch.withColumn("file_id", lit(id))
              .withColumn("_sj_key",
                graft.operators.SkewJoin.encodedKey(keys)),
            Seq("file_id"), "_sj_key", k)
          val mgMerged = prevMg
            .map(_.unionByName(mgDelta)).getOrElse(mgDelta)
          DeltaStaging.stage(mgMerged, root, id)
          DeltaStaging.purgeBelow(spark, root, id - 1)
        }
        DeltaStaging.stage(merged, statePath, id)
        // only id and id-1 can ever be read again
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        sink(DeltaStaging.read(spark, statePath, id), id)
      })
      .option("checkpointLocation", checkpoint)
      .start()

  /** Compact a LIVE manifest-managed table (round-15 verdict task 8):
    * a streaming ingest lands one file per trigger, and
    * [[graft.operators.Layout.compactFiles]] (q82) repacks such
    * fragmentation — but nothing rewrote the live manifest (+ Bloom
    * sidecars), so a compacted streaming table silently lost its pruning
    * until a batch rebuild. This pass does both sides under the same
    * staging discipline:
    *
    *  1. repack the manifest-listed `dir/file_id=k/` dirs into
    *     `ceil(bytes/target)` files under FRESH ids starting at
    *     `max(maxFileId+1, 2^40)` — disjoint from every past and
    *     realistic future batch id, so the resumed stream can never
    *     collide with a compacted file;
    *  2. re-derive per-file stats and Bloom registers by READING THE
    *     WRITTEN FILES BACK (one pass over the repacked data — exactly
    *     what is on disk, no determinism assumptions about the writer's
    *     split);
    *  3. stage, in false-negative-free order: the bloom SUPERSET
    *     (old ∪ new registers) → the compacted manifest → the pruned
    *     (new-only) registers — every crash window leaves a manifest
    *     whose listed files all have register coverage;
    *  4. delete the old dirs (plus any stray `file_id=` dirs a previous
    *     crashed compaction left unreferenced).
    *
    * All three stagings REWRITE the current max staged id, so a resumed
    * stream's next trigger reads the compacted state as its prefix and
    * appends normally (spec-pinned). Contract: run in a maintenance
    * window — the stream must be STOPPED CLEANLY (all batches
    * committed); a replay of the rewritten id would resurrect the
    * pre-compaction manifest against post-compaction dirs. Returns the
    * q82-shaped before/after inventory. */
  def compact(
      spark: SparkSession, dir: String, statePath: String,
      statCols: Seq[String], targetFileBytes: Long,
      sortCol: Option[String] = None,
      bloomCols: Seq[(String, Int, Int)] = Nil,
      mgKeys: Seq[(Seq[String], Int)] = Nil)
      : graft.operators.Layout.CompactionStats = {
    require(targetFileBytes > 0, "compact: targetFileBytes must be > 0")
    require(statCols.nonEmpty, "compact: no stat columns")
    val man = currentManifest(spark, statePath).getOrElse(
      throw new IllegalStateException(
        s"compact: no committed manifest at $statePath"))
    val stagedId = DeltaStaging.stagedIds(spark, statePath).max
    val oldIds = man.select(col("file_id").cast("long"))
      .collect().map(_.getLong(0)).toSeq.sorted
    require(oldIds.nonEmpty, "compact: manifest lists no files")
    val newBase = math.max(oldIds.max + 1L, 1L << 40)

    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def idDir(k: Long) = new Path(dir, s"file_id=$k")
    def bytesOf(p: Path): Long =
      fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
    // janitor: a crashed previous compaction may have left written-but-
    // never-referenced dirs behind — any file_id dir not in the manifest
    // is dead by definition (the manifest IS the table)
    val live = oldIds.toSet
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("file_id="))
      .filter(p => p.getName.stripPrefix("file_id=").toLongOption
        .exists(!live.contains(_)))
      .foreach(p => fs.delete(p, true))

    val oldDirs = oldIds.map(k => idDir(k))
    val bytesIn = oldDirs.map(bytesOf).sum
    val nOut = math.max(1L,
      (bytesIn + targetFileBytes - 1) / targetFileBytes).toInt
    val src = spark.read.option("basePath", dir)
      .parquet(oldDirs.map(_.toString): _*).drop("file_id")
    val packed = sortCol match {
      case Some(c) =>
        src.repartitionByRange(nOut, col(c)).sortWithinPartitions(c)
      case None => src.repartition(nOut)
    }
    packed
      .withColumn("file_id", lit(newBase) + spark_partition_id().cast("long"))
      .write.mode("append").partitionBy("file_id").parquet(dir)

    // stats + registers from the files as WRITTEN (read-back pass)
    val newDirs = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(p =>
        p.getName.stripPrefix("file_id=").toLongOption.exists(_ >= newBase))
      .map(_.toString).toSeq.sorted
    val rb = spark.read.option("basePath", dir).parquet(newDirs: _*)
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    }
    val newMan = rb.groupBy(col("file_id").cast("long").as("file_id"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(man.columns.map(col): _*)
      .localCheckpoint(true)

    // ONE bloom staging per column, BEFORE the manifest: the staged frame
    // is the union of the new files' registers and the previous staging's
    // rows RESTRICTED to the (old) manifest's ids — covers both the old
    // manifest (pre-crash reads) and the new one, so no crash window can
    // leave a listed file without register rows. Restricting to oldIds is
    // also what bounds growth across repeated compactions: a prior
    // compaction's dead rows (ids no manifest lists) are dropped here,
    // never by a second overwrite that would re-open the window
    // (round-16 review: a final new-only re-stage at the same id briefly
    // deletes _SUCCESS — a crash there resurrects old-id registers
    // against the new manifest and prunes EVERYTHING).
    bloomCols.foreach { case (c, mBits, k) =>
      val regs = graft.operators.Bloom.registers(
        rb.withColumn("file_id", col("file_id").cast("long")),
        Seq("file_id"), c, mBits, k)
      val rootB = bloomRoot(statePath, c)
      // a crashed attach can leave a bloom staging ABOVE the manifest's
      // max staged id (bloom-before-manifest order): left in place it
      // would win currentBloom's max-id read after this compaction and —
      // covering no compacted file id — silently prune the whole table.
      // It corresponds to no committed manifest, so purge it (round-16
      // advice; the resumed stream's replay would rewrite it anyway).
      DeltaStaging.purgeAtOrAbove(spark, rootB, stagedId + 1)
      val prev = DeltaStaging.stagedIds(spark, rootB).maxOption
        .map(b => DeltaStaging.read(spark, rootB, b)
          .where(col("file_id").cast("long").isInCollection(oldIds)))
      // pin before staging: the union lazily READS the staging dir it is
      // about to overwrite
      val staged = prev.map(_.unionByName(regs)).getOrElse(regs)
        .localCheckpoint(true)
      DeltaStaging.stage(staged, rootB, stagedId)
    }
    // MG sidecars: identical discipline — re-derive per-file summaries
    // from the repacked files, drop prior rows for ids no manifest lists
    // (bounds growth + kills double-counting of compacted-away files),
    // purge orphan stagings a crashed attach left above the manifest id
    mgKeys.foreach { case (keys, k) =>
      val mgNew = graft.operators.Mg.summarize(
        rb.withColumn("file_id", col("file_id").cast("long"))
          .withColumn("_sj_key",
            graft.operators.SkewJoin.encodedKey(keys)),
        Seq("file_id"), "_sj_key", k)
      val rootM = mgRoot(statePath, keys)
      DeltaStaging.purgeAtOrAbove(spark, rootM, stagedId + 1)
      val prevMg = DeltaStaging.stagedIds(spark, rootM).maxOption
        .map(b => DeltaStaging.read(spark, rootM, b)
          .where(col("file_id").cast("long").isInCollection(oldIds)))
      val stagedMg = prevMg.map(_.unionByName(mgNew)).getOrElse(mgNew)
        .localCheckpoint(true)
      DeltaStaging.stage(stagedMg, rootM, stagedId)
    }
    DeltaStaging.stage(newMan, statePath, stagedId)
    oldDirs.foreach(p => fs.delete(p, true))

    val outFiles = newDirs.map(p => bytesOf(new Path(p)))
    graft.operators.Layout.CompactionStats(
      oldIds.size.toLong, bytesIn, newDirs.size.toLong, outFiles.sum,
      nOut.toLong)
  }
}
