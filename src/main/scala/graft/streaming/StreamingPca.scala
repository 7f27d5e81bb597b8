package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Pca

/** Streaming PCA — EXACT incremental fitting over an embedding stream, not
  * an approximation: each micro-batch folds into the Gram moment buffer
  * ([[graft.operators.Pca.moments]]), which merges EXACTLY
  * ([[graft.operators.Pca.mergeState]] — sums of sums), so the model after
  * every trigger equals a batch [[graft.operators.Pca.fit]] over everything
  * seen (spec-pinned). The streaming counterpart of the frozen-model
  * attaches ([[StreamingDsir]], [[StreamingClassify]]) with the opposite
  * contract: those SCORE against a frozen model, this TRAINS the model
  * incrementally.
  *
  * Per-trigger cost ∝ batch (one aggregate pass over the batch's vectors;
  * the merge is driver-side on two O(d²) arrays). State is ONE moment
  * buffer persisted at `statePath` (KBs) — restart-safe: a resumed query
  * reloads it and continues folding, and because foreachBatch may REPLAY
  * the last batch after a crash, the state write is staged per batch id
  * (`statePath/_batch=<id>`): re-processing batch `id` rebuilds from the
  * highest staging STRICTLY BELOW `id` and overwrites its own staging
  * rather than double-counting (the [[DurableState]] idempotence
  * discipline). Stagings older than `id − 1` are pruned after each
  * successful save — the replay window only ever needs the previous one —
  * so state storage is bounded at two tiny files regardless of stream
  * lifetime. All paths go through the Hadoop FileSystem API (like
  * [[DurableState]]), so `statePath` may live on HDFS/S3, not just the
  * local disk. */
object StreamingPca {

  private val StagePrefix = "_batch="
  private val StageRe = "_batch=(\\d+)".r

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def stagedIds(spark: SparkSession, statePath: String): Seq[Long] = {
    val dir = new Path(statePath)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .flatMap(_.getPath.getName match {
        case StageRe(id) => Some(id.toLong)
        case _ => None // stray dirs never throw, they are just not stagings
      })
  }

  /** Latest merged state across all committed batch stagings (highest batch
    * id wins — each staging holds the PREFIX-merge up to its id). */
  def currentState(spark: SparkSession, statePath: String): Option[Pca.GramBuf] =
    stagedIds(spark, statePath).maxOption
      .map(b => Pca.loadState(spark, s"$statePath/$StagePrefix$b"))

  /** Attach the incremental fit to a streaming DataFrame carrying `vecCol`.
    * After each trigger, `sink` receives the refreshed k-component model
    * and the batch id. */
  def attach(
      docs: DataFrame, vecCol: String, k: Int,
      statePath: String, checkpoint: String)(
      sink: (Pca.PcaModel, Long) => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        val f0 = fs(spark, new Path(statePath))
        // incarnation safety: a query restarted with a FRESH checkpoint
        // (batch ids reset to 0) but the same statePath would otherwise
        // leave the prior run's stagings in place until the new run's ids
        // caught up — at which point a stale `_batch=N` would be silently
        // chosen as the merge base, double-counting the previous
        // incarnation. Stagings at or above the current id can only come
        // from a prior incarnation (a replay's own staging is rewritten
        // below anyway), so they are deleted before the base is chosen.
        stagedIds(spark, statePath).filter(_ >= id).foreach(stale =>
          f0.delete(new Path(statePath, s"$StagePrefix$stale"), true))
        // replay safety: the prefix is the highest staging STRICTLY BELOW
        // this id — a replayed batch rebuilds from the same base and
        // overwrites its own staging instead of double-counting
        val ids = stagedIds(spark, statePath)
        val base = ids.filter(_ < id).maxOption
          .map(b => Pca.loadState(spark, s"$statePath/$StagePrefix$b"))
          .getOrElse(Pca.GramBuf(0L, Array.empty, Array.empty))
        val merged = Pca.mergeState(base, Pca.moments(batch, vecCol))
        Pca.saveState(spark, merged, s"$statePath/$StagePrefix$id")
        // bound storage: only id and id-1 can ever be read again
        val f = fs(spark, new Path(statePath))
        ids.filter(_ < id - 1).foreach(old =>
          f.delete(new Path(statePath, s"$StagePrefix$old"), true))
        if (merged.n > 0) sink(Pca.fitFromMoments(merged, k), id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
}
