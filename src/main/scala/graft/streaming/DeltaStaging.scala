package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-batch-id parquet DELTA staging — the durable-state discipline behind
  * the self-extending streaming indexes ([[StreamingDedup]] near-dup,
  * [[StreamingSimilarity]] IVF): each micro-batch writes ITS OWN rows to
  * `statePath/_batch=<id>`, and the live index at batch `id` is the frozen
  * base artifact plus every staging STRICTLY BELOW `id`.
  *
  * Replay safety (the [[StreamingPca]] discipline, adapted to deltas):
  * `foreachBatch` may re-run the last batch after a crash, so a replayed
  * batch OVERWRITES its own staging with the same deterministic rows —
  * earlier stagings are untouched, the probe reads the identical index
  * state, and the sink sees the identical output for the replayed id.
  *
  * Incarnation safety: a query restarted with a FRESH checkpoint (batch
  * ids reset to 0) but the same `statePath` purges stagings at or above
  * the current id before processing — state from a prior incarnation can
  * never leak into a new run's index.
  *
  * Unlike [[StreamingPca]]'s prefix-merge stagings — where only the last
  * two are ever live — every delta here IS index data, so nothing below
  * the current id is pruned. Per-trigger cost stays ∝ batch on the write
  * side; the read side is a columnar scan of base + deltas, scan-bound
  * exactly like the batch probe (dedup against all earlier batches is the
  * point). Over a long stream the staging count grows one small parquet
  * dir per trigger; compact between restarts by folding the deltas into a
  * new base (e.g. [[graft.operators.Dedup.extendNearDupIndex]] +
  * [[graft.operators.Dedup.saveNearDupIndex]], or
  * [[graft.operators.Similarity.extendIvfIndex]] +
  * [[graft.operators.Similarity.saveIvfIndex]]) and clearing `statePath`.
  *
  * Commit visibility: a staging COUNTS only once its parquet `_SUCCESS`
  * marker exists — Spark writes it last, and an overwrite (replay) deletes
  * it first — so [[stagedIds]] never surfaces a directory that a trigger
  * is mid-writing or mid-rewriting. Serving-view caveat: the frames these
  * helpers return are LAZY — a probe action scans the listed paths when it
  * RUNS, so a view held across a compaction or an incarnation purge can
  * hit deleted paths; materialize (persist + count) a serving view
  * promptly after taking it, and rebuild it on scan failure.
  *
  * All paths go through the Hadoop FileSystem API, so `statePath` may live
  * on HDFS/S3, not just local disk.
  */
private[streaming] object DeltaStaging {

  private val StagePrefix = "_batch="
  private val StageRe = "_batch=(\\d+)".r

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  def dir(statePath: String, id: Long): String = s"$statePath/$StagePrefix$id"

  /** Ids of COMMITTED stagings (dir present AND `_SUCCESS` inside — see
    * the commit-visibility contract in the object doc). */
  def stagedIds(spark: SparkSession, statePath: String): Seq[Long] = {
    val root = new Path(statePath)
    val f = fs(spark, root)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(_.getPath.getName match {
        case StageRe(id) => Some(id.toLong)
        case _ => None // stray dirs never throw, they are just not stagings
      })
      .filter(id => f.exists(new Path(dir(statePath, id), "_SUCCESS")))
  }

  /** Purge stagings with id >= `id` — called at the top of every batch, so
    * both a crashed attempt's own staging and a prior incarnation's future
    * ids are gone before the batch stages and probes. Deletes uncommitted
    * (marker-less) dirs in range too — they are crash debris by definition. */
  def purgeAtOrAbove(spark: SparkSession, statePath: String, id: Long): Unit = {
    val root = new Path(statePath)
    val f = fs(spark, root)
    if (!f.exists(root)) return
    f.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(_.getPath.getName match {
        case StageRe(sid) => Some(sid.toLong)
        case _ => None
      })
      .filter(_ >= id)
      .foreach(stale => f.delete(new Path(statePath, s"$StagePrefix$stale"), true))
  }

  /** Purge COMMITTED stagings strictly below `id` — the prefix-merge prune
    * ([[StreamingPca]]: only stagings id and id−1 can ever be read again). */
  def purgeBelow(spark: SparkSession, statePath: String, id: Long): Unit = {
    val f = fs(spark, new Path(statePath))
    stagedIds(spark, statePath).filter(_ < id).foreach(old =>
      f.delete(new Path(statePath, s"$StagePrefix$old"), true))
  }

  /** Write this batch's delta rows (overwrite — replay rewrites in place).
    * Fails loudly if the committer did not leave a `_SUCCESS` marker
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`, or a
    * marker-less committer): the commit-visibility rule would otherwise
    * leave every staging permanently invisible and the attaches silently
    * serving base-only state. */
  def stage(delta: DataFrame, statePath: String, id: Long): Unit = {
    delta.write.mode("overwrite").parquet(dir(statePath, id))
    assertCommitted(delta.sparkSession, statePath, id)
  }

  /** Fail loudly when a just-written staging carries no `_SUCCESS` marker —
    * used after every staging write, including ones that bypass [[stage]]
    * ([[StreamingPca]]'s `Pca.saveState`). */
  def assertCommitted(spark: SparkSession, statePath: String, id: Long): Unit = {
    val path = dir(statePath, id)
    if (!fs(spark, new Path(path)).exists(new Path(path, "_SUCCESS")))
      throw new IllegalStateException(
        s"DeltaStaging: no _SUCCESS marker at $path — staging visibility " +
          "requires success markers; re-enable " +
          "mapreduce.fileoutputcommitter.marksuccessfuljobs for the state path")
  }

  /** Read one staged delta back (columnar; self-releasing, no persist). */
  def read(spark: SparkSession, statePath: String, id: Long): DataFrame =
    spark.read.parquet(dir(statePath, id))

  /** Union of all committed deltas strictly below `id` (None when the
    * stream has no history yet). One multi-path parquet read — partition
    * planning sees all dirs at once instead of a union-per-delta plan. */
  def deltasBelow(
      spark: SparkSession, statePath: String, id: Long): Option[DataFrame] =
    deltasFor(spark, statePath, stagedIds(spark, statePath).filter(_ < id))

  /** Union of an EXPLICIT committed-id set — for multi-store states
    * ([[StreamingBm25]]) where one store's committed ids gate the others. */
  def deltasFor(
      spark: SparkSession, statePath: String, ids: Seq[Long]): Option[DataFrame] = {
    val paths = ids.sorted.map(b => dir(statePath, b))
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** Union of ALL committed deltas — the serving-side view for probes
    * issued outside the ingesting query ([[StreamingSimilarity.currentIvf]]
    * and friends). ONE listing feeds the read (no second listing whose
    * result could differ mid-trigger). */
  def allDeltas(spark: SparkSession, statePath: String): Option[DataFrame] =
    deltasFor(spark, statePath, stagedIds(spark, statePath))

  /** Remove every staging, committed or not — the final step of
    * between-restart compaction ([[StreamingDedup.compactNearDupIndex]] /
    * [[StreamingSimilarity.compactIvfIndex]]): once the deltas are folded
    * into a new persisted base, they must not ALSO be re-unioned by the
    * next incarnation (and crash debris goes with them). Only call with no
    * query attached. */
  def clear(spark: SparkSession, statePath: String): Unit =
    purgeAtOrAbove(spark, statePath, Long.MinValue)
}
