package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** A swappable, optionally durable DataFrame "cell" — the shared state
  * discipline behind [[DimensionMaintainer]], [[ObservedKeySet]] and
  * [[LateDataBuffer]].
  *
  * Two mutation modes:
  *
  *  - [[swap]] — REPLACE: the state becomes `build(current)`. With a
  *    `stateDir`, every `spillEvery`-th version writes a FULL snapshot to
  *    `<stateDir>/v<version>/` and re-reads it (durable + lineage re-rooted
  *    at a file scan). Without one, the cadence `localCheckpoint`s instead.
  *  - [[appendDelta]] — GROW: the state becomes `current ∪ delta` (bag
  *    union; callers keep deltas disjoint from the current state when set
  *    semantics matter, as [[ObservedKeySet]] does via an anti-join). Only
  *    the DELTA is written (`<stateDir>/d<version>/`), so the per-mutation
  *    write is ∝ the delta, not the accumulated state — the difference
  *    between O(batch) and O(lifetime keys) per micro-batch on a
  *    long-running stream. An EMPTY delta is a complete no-op: no write, no
  *    version bump, no frame swap. Every `compactEvery`-th delta compacts:
  *    one full snapshot write supersedes the delta chain and re-roots the
  *    plan, so lineage depth and restore fan-in are both bounded.
  *
  * Restore ([[restoreOrEmpty]]) = highest committed full snapshot (if any)
  * + every committed delta with a HIGHER version, unioned. Versions are
  * monotonic across both modes, so a full snapshot always supersedes the
  * deltas folded into it. Mixing modes is safe: a [[swap]] that runs while
  * deltas are pending on disk FORCES a full spill regardless of cadence —
  * otherwise a crash would restore pre-replace deltas on top of an older
  * snapshot and resurrect replaced state.
  *
  * Crash consistency: a spill (full or delta) counts only once Spark's
  * parquet committer has written `_SUCCESS`, so the committer — not a
  * self-managed marker — is the atomic commit point. A dir half-written by
  * a crash has no `_SUCCESS` and is ignored (and overwritten on version
  * reuse). Compaction is crash-safe the same way: the snapshot commits
  * first, then stale deltas are deleted; a crash between the two restores
  * from the new snapshot and ignores the now-superseded deltas.
  *
  * Several older committed versions are kept (in-flight readers may hold
  * frames a few swaps stale and still fault blocks back from their files);
  * older ones are deleted after each full spill.
  *
  * Durability lag: `spillEvery = 1` (the default) spills on every swap —
  * with `foreachBatch`, whose offsets commit only after the batch function
  * returns, that gives no-loss restarts (the replayed in-flight batch is the
  * only rework). Append-deltas are durable per non-empty delta by
  * construction.
  *
  * 100 TB: replace-mode spills are full-snapshot writes per cadence — fine
  * for dimension-sized state (the reference's H2 tables); append-delta mode
  * is the scale path for monotone state (observed key sets, parked-event
  * logs), whose write AND shuffle cost stays ∝ the per-batch delta.
  */
final class DurableState(
    spark: SparkSession,
    schema: StructType,
    stateDir: Option[String] = None,
    spillEvery: Int = 1,
    compactEvery: Int = 16) {
  require(spillEvery >= 1, s"spillEvery must be >= 1, got $spillEvery")
  require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")

  private val versionRe = "v(\\d+)".r
  private val deltaRe = "d(\\d+)".r

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private var version: Long = 0L
  // committed deltas newer than the last full snapshot (disk + lineage chain)
  private var deltasSinceSnapshot: Int = 0
  // the PERSISTED frames the current `frame` plan reads (after appends the
  // frame itself is a plain union over these; unpersisting the union would
  // free nothing, so ownership is tracked at the leaves)
  private var leaves: List[DataFrame] = Nil
  @volatile private var frame: DataFrame = {
    val f = restoreOrEmpty()
    leaves = List(f)
    f
  }

  /** The current consistent state (materialized; never a partial plan). */
  def current: DataFrame = frame

  /** Version of the state (0 = initial empty; +1 per [[swap]] or non-empty
    * [[appendDelta]]); after a restore, continues from the restored
    * version. */
  def currentVersion: Long = synchronized(version)

  private def emptyFrame(): DataFrame = {
    val e = spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    e.persist(StorageLevel.MEMORY_AND_DISK)
  }

  private def spillPath(dir: String, v: Long) = new Path(dir, s"v$v")
  private def deltaPath(dir: String, v: Long) = new Path(dir, s"d$v")

  private def committed(dir: String, re: scala.util.matching.Regex,
      path: (String, Long) => Path): Seq[Long] = {
    val d = new Path(dir)
    val f = fs(d)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case re(v) => Some(v.toLong)
        case _ => None
      })
      .filter(v => f.exists(new Path(path(dir, v), "_SUCCESS")))
  }

  private def committedVersions(dir: String): Seq[Long] =
    committed(dir, versionRe, spillPath)
  private def committedDeltas(dir: String): Seq[Long] =
    committed(dir, deltaRe, deltaPath)

  private def readSpill(p: Path): DataFrame =
    spark.read.schema(schema).parquet(p.toString)

  private def restoreOrEmpty(): DataFrame = stateDir match {
    case Some(dir) =>
      val snaps = committedVersions(dir)
      val vSnap = if (snaps.isEmpty) 0L else snaps.max
      val deltas = committedDeltas(dir).filter(_ > vSnap).sorted
      if (snaps.isEmpty && deltas.isEmpty) emptyFrame()
      else {
        version = (vSnap +: deltas).max
        deltasSinceSnapshot = deltas.size
        val base =
          if (snaps.isEmpty) spark.createDataFrame(new java.util.ArrayList[Row](), schema)
          else readSpill(spillPath(dir, vSnap))
        val restored = deltas.foldLeft(base)((acc, v) =>
          acc.unionByName(readSpill(deltaPath(dir, v))))
          .persist(StorageLevel.MEMORY_AND_DISK)
        restored.count()
        restored
      }
    case None => emptyFrame()
  }

  // Frames superseded one generation ago; released on the NEXT mutation. The
  // delay gives in-flight readers of the previous frame (a temp-view query
  // planned just before a swap) their micro-batch to finish before the cache
  // entries vanish.
  private var retired: List[DataFrame] = Nil

  /** Free a frame's CACHE entry. The underlying localCheckpoint RDD blocks
    * are deliberately NOT freed here: a reader can hold the previous frame
    * across an arbitrarily long micro-batch (e.g. `operationalQueryBuffered`
    * between its emit and its buffer swap) while this state swaps several
    * times — eager freeing would hand that reader an unrecoverable
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND, because a checkpointed frame cannot
    * recompute. ContextCleaner frees the blocks once no live plan
    * references the RDD, which is the reference-safe cleanup. */
  private def releaseFrame(df: DataFrame): Unit =
    df.unpersist(blocking = false)

  private def retire(superseded: List[DataFrame]): Unit = {
    retired.foreach(releaseFrame)
    retired = superseded
  }

  /** Write `next` as the full snapshot for the CURRENT version, clean stale
    * spills, and return the persisted re-read. Resets the pending-delta
    * count — the snapshot supersedes the chain. */
  private def writeSnapshot(dir: String, next: DataFrame): DataFrame = {
    val vDir = spillPath(dir, version)
    next.write.mode("overwrite").parquet(vDir.toString)
    val reread = readSpill(vDir).persist(StorageLevel.MEMORY_AND_DISK)
    reread.count()
    // keep several committed spills: an in-flight reader may hold a frame a
    // few swaps stale, and its parquet files must outlive it
    val staleV = committedVersions(dir).sorted.dropRight(4)
    staleV.foreach(v => fs(spillPath(dir, v)).delete(spillPath(dir, v), true))
    val staleD = committedDeltas(dir).filter(_ <= version - 4)
    staleD.foreach(v => fs(deltaPath(dir, v)).delete(deltaPath(dir, v), true))
    deltasSinceSnapshot = 0
    reread
  }

  /** Replace the state with `build(current)` — the read-modify-write runs
    * UNDER this lock, so concurrent writers serialize on the same base
    * frame and cannot lose each other's updates. Materializes, spills per
    * the cadence (forced while append-deltas are pending on disk — see the
    * class doc), then swaps; frames superseded one generation ago are
    * released. */
  def swap(build: DataFrame => DataFrame): Unit = synchronized {
    val next0 = build(frame)
    version += 1
    val next = stateDir match {
      case Some(dir) if version % spillEvery == 0 || deltasSinceSnapshot > 0 =>
        writeSnapshot(dir, next0)
      case None if version % spillEvery == 0 =>
        // no durable dir: truncate lineage in-memory instead
        deltasSinceSnapshot = 0
        next0.localCheckpoint(true)
      case _ =>
        deltasSinceSnapshot = 0
        val p = next0.persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
    }
    frame = next
    val superseded = leaves
    leaves = List(next)
    retire(superseded)
  }

  /** Grow the state by `buildDelta(current)` (bag union). Runs under the
    * same lock as [[swap]]. An empty delta is a complete no-op. A non-empty
    * delta is materialized (and, with a `stateDir`, spilled to
    * `d<version>/` — write ∝ delta) and UNIONED onto the current frame;
    * the superseded smaller union is not retired because the new frame
    * still reads its leaves. Every `compactEvery`-th pending delta
    * compacts into one full snapshot, bounding lineage depth and restore
    * fan-in.
    *
    * Returns the materialized delta (`None` if empty). The returned frame
    * is backed by this state's cache and stays valid until roughly two
    * further mutations — consume it promptly (e.g. a back-fill in the same
    * micro-batch), don't hold it. */
  def appendDelta(buildDelta: DataFrame => DataFrame): Option[DataFrame] = synchronized {
    val built = buildDelta(frame)
    val delta0 =
      if (built.storageLevel == StorageLevel.NONE) built.persist(StorageLevel.MEMORY_AND_DISK)
      else built
    if (delta0.count() == 0L) {
      delta0.unpersist(blocking = false)
      None
    } else {
      version += 1
      // The delta leaf must be SELF-ROOTED (a file scan or a checkpointed
      // RDD). The raw `buildDelta` plan typically references the current
      // frame (e.g. an anti-join against it), so chaining raw deltas would
      // embed each previous chain in the next — an exponentially-growing
      // plan tree even though execution is cached.
      val deltaLeaf = stateDir match {
        case Some(dir) =>
          val dDir = deltaPath(dir, version)
          delta0.write.mode("overwrite").parquet(dDir.toString)
          delta0.unpersist(blocking = false)
          val reread = readSpill(dDir).persist(StorageLevel.MEMORY_AND_DISK)
          reread.count()
          reread
        case None =>
          val cp = delta0.localCheckpoint(true)
          delta0.unpersist(blocking = false)
          cp
      }
      deltasSinceSnapshot += 1
      val unioned = frame.unionByName(deltaLeaf)
      if (deltasSinceSnapshot >= compactEvery) {
        val compacted = stateDir match {
          case Some(dir) => writeSnapshot(dir, unioned)
          case None =>
            deltasSinceSnapshot = 0
            unioned.localCheckpoint(true)
        }
        // every pre-compaction leaf (incl. this delta's) is superseded by
        // the self-rooted snapshot; release after the reader grace generation
        frame = compacted
        val superseded = leaves :+ deltaLeaf
        leaves = List(compacted)
        retire(superseded)
      } else {
        // new frame READS the old leaves + this one — nothing is superseded
        frame = unioned
        leaves = leaves :+ deltaLeaf
        retire(Nil)
      }
      Some(deltaLeaf)
    }
  }

  /** Release the cached state (spilled parquet versions are left on disk —
    * they are the durable copy a successor instance restores from). */
  def release(): Unit = synchronized {
    retire(Nil)
    leaves.foreach(releaseFrame)
    leaves = Nil
  }
}
