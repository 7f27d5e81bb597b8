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
  * All paths go through the Hadoop FileSystem API, so `statePath` may live
  * on HDFS/S3, not just local disk.
  */
private[streaming] object DeltaStaging {

  private val StagePrefix = "_batch="
  private val StageRe = "_batch=(\\d+)".r

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  def dir(statePath: String, id: Long): String = s"$statePath/$StagePrefix$id"

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
  }

  /** Purge stagings with id >= `id` — called at the top of every batch, so
    * both a crashed attempt's own staging and a prior incarnation's future
    * ids are gone before the batch stages and probes. */
  def purgeAtOrAbove(spark: SparkSession, statePath: String, id: Long): Unit = {
    val f = fs(spark, new Path(statePath))
    stagedIds(spark, statePath).filter(_ >= id).foreach(stale =>
      f.delete(new Path(statePath, s"$StagePrefix$stale"), true))
  }

  /** Write this batch's delta rows (overwrite — replay rewrites in place). */
  def stage(delta: DataFrame, statePath: String, id: Long): Unit =
    delta.write.mode("overwrite").parquet(dir(statePath, id))

  /** Read one staged delta back (columnar; self-releasing, no persist). */
  def read(spark: SparkSession, statePath: String, id: Long): DataFrame =
    spark.read.parquet(dir(statePath, id))

  /** Union of all committed deltas strictly below `id` (None when the
    * stream has no history yet). One multi-path parquet read — partition
    * planning sees all dirs at once instead of a union-per-delta plan. */
  def deltasBelow(
      spark: SparkSession, statePath: String, id: Long): Option[DataFrame] = {
    val paths = stagedIds(spark, statePath).filter(_ < id).sorted
      .map(b => dir(statePath, b))
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** Union of ALL committed deltas — the serving-side view for probes
    * issued outside the ingesting query ([[StreamingSimilarity.currentIvf]]
    * and friends). */
  def allDeltas(spark: SparkSession, statePath: String): Option[DataFrame] =
    stagedIds(spark, statePath).maxOption
      .flatMap(last => deltasBelow(spark, statePath, last + 1))

  /** Remove every staging — the final step of between-restart compaction
    * ([[StreamingDedup.compactNearDupIndex]] /
    * [[StreamingSimilarity.compactIvfIndex]]): once the deltas are folded
    * into a new persisted base, they must not ALSO be re-unioned by the
    * next incarnation. Only call with no query attached. */
  def clear(spark: SparkSession, statePath: String): Unit = {
    val f = fs(spark, new Path(statePath))
    stagedIds(spark, statePath).foreach(id =>
      f.delete(new Path(statePath, s"$StagePrefix$id"), true))
  }
}
