package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** TRANSPARENT manifest pruning — the round-15 verdict task 1: where
  * [[PrunedScan.prunedParquet]] is an explicit API (the caller hands over
  * [[FileProbe]]s), this `FileIndex` derives the probes FROM THE QUERY'S
  * OWN pushed filters, so a plain `df.where(...)` — or `spark.sql` over a
  * registered view — gets q98's `numFiles` savings with zero opt-in. This
  * is the exact mechanism Delta/Iceberg use: data-skipping statistics
  * consulted during file LISTING, upstream of the parquet reader, so a
  * pruned file is never listed, opened, or footer-read.
  *
  * Plumbing: Spark's `FileSourceScanExec` materializes its input as
  * `relation.location.listFiles(partitionFilters, dataFilters)` — the
  * pushed-down data filters arrive at the index as Catalyst expressions.
  * We subclass the stock [[InMemoryFileIndex]] (which owns listing and
  * `file_id=k` partition inference) and intersect its answer with the
  * manifest's survivor set for every conjunct we can translate:
  *
  *  - `c = v`            → [[EqualProbe]] (Bloom-sharpened when a sidecar
  *                         for `c` was supplied)
  *  - `c > v, >=, <, <=` → [[CompareProbe]]
  *  - `c IS NULL`        → [[NullProbe]]
  *  - `c LIKE 'p%'`      → [[PrefixProbe]] (startsWith)
  *  - `c IN (v…)`        → union of per-value [[EqualProbe]] survivors
  *                         (bounded fan-out; larger IN-lists fall back)
  *
  * Everything else — casts, functions of `c`, disjunctions, filters on
  * columns the manifest has no stats for — translates to NOTHING, i.e. no
  * pruning from that conjunct: the verdict language is conservative in
  * the pruning direction ONLY, so the scan's answer is always exactly the
  * full scan's (ManifestFileIndexSpec pins both directions; q104
  * hash-checks it against the oracle).
  *
  * Scale contract: the manifest is planner state — KB-sized, pinned by
  * the caller (localCheckpoint) — and each distinct filter's survivor set
  * is computed once (driver-side job over the manifest rows, the Delta
  * data-skipping shape) and memoized, so re-planning the same predicate
  * costs a map lookup. The corpus is never touched at planning time.
  *
  * Reference anchor: the on-demand key trick
  * (`…/dodetl/imtu/InMemoryTableUpdater.scala:142-146`) at file
  * granularity, made implicit.
  */
class ManifestFileIndex(
    spark: SparkSession, dir: String, manifest: DataFrame,
    blooms: Map[String, BloomSidecar] = Map.empty)
  extends InMemoryFileIndex(
    spark, Seq(new Path(dir)), Map("basePath" -> dir), None) {

  // IDENTITY equality: the parent compares rootPaths only, under which
  // this index would equal a PLAIN index — or another manifest's index —
  // over the same directory, and Spark's scan/exchange reuse could then
  // substitute a pruned scan for a full one (or vice versa) inside a
  // single query. Losing reuse between genuinely identical manifest
  // reads is the safe direction.
  override def equals(other: Any): Boolean = other match {
    case m: ManifestFileIndex => m eq this
    case _ => false
  }
  override def hashCode(): Int = System.identityHashCode(this)

  /** Columns the manifest carries stats for (`<c>_min/_max/_nulls`). */
  private val statCols: Set[String] = manifest.columns.iterator
    .filter(_.endsWith("_min")).map(_.stripSuffix("_min")).toSet

  /** One survivor set per distinct translated filter — planning cache.
    * Concurrent (listFiles can be invoked from parallel query threads)
    * and bounded: a long-lived index over a high-cardinality predicate
    * stream would otherwise grow one Set per distinct literal. */
  private val survivorCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[Long]]()
  private val MaxCachedPredicates = 128

  /** Manifest unit path → file_id, when the manifest carries a `path`
    * column (the [[FooterManifest.fromFooters]] shape): lets the index
    * prune INDIVIDUAL FILES of a plain `df.write.parquet` table, which
    * has no `file_id=` partition values to filter on. Scheme-free path
    * form on both sides. */
  private val idByPath: Map[String, Long] =
    if (!manifest.columns.contains("path")) Map.empty
    else manifest.select("path", "file_id").collect()
      .map(r => new Path(r.getString(0)).toUri.getPath -> r.getLong(1))
      .toMap

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    survivorsFor(dataFilters) match {
      case None => base
      case Some(keep) if idByPath.nonEmpty =>
        // file-granularity pruning: a file whose path (or parent dir —
        // the assignedWrite unit) maps to a pruned id is dropped; a file
        // the manifest does not know is KEPT (conservative)
        base.map { pd =>
          pd.copy(files = pd.files.filter { f =>
            val p = f.getPath.toUri.getPath
            val unit = idByPath.get(p)
              .orElse(idByPath.get(new Path(p).getParent.toUri.getPath))
            unit.forall(keep.contains)
          })
        }.filter(_.files.nonEmpty)
      case Some(keep) => base.filter(pd =>
        // a partition value we cannot read as a file id is kept —
        // conservative in the pruning direction, like everything here
        fileIdOf(pd.values).forall(keep.contains))
    }
  }

  private def fileIdOf(values: InternalRow): Option[Long] = {
    val fields = partitionSpec().partitionColumns.fields
    val idx = fields.indexWhere(_.name == "file_id")
    if (idx < 0 || values.isNullAt(idx)) None
    else fields(idx).dataType match {
      case IntegerType => Some(values.getInt(idx).toLong)
      case LongType => Some(values.getLong(idx))
      case _ => None
    }
  }

  /** None = nothing translatable (full listing); Some(ids) = the files
    * that can hold a matching row under every translated conjunct. */
  private def survivorsFor(filters: Seq[Expression]): Option[Set[Long]] = {
    val conjuncts = filters.flatMap(split)
    val ands = Seq.newBuilder[FileProbe]
    val anyOfs = Seq.newBuilder[Seq[FileProbe]]
    conjuncts.foreach(c => translate(c).foreach {
      case scala.util.Left(p) => ands += p
      case scala.util.Right(ps) => anyOfs += ps
    })
    val (andProbes, anyOfProbes) = (ands.result(), anyOfs.result())
    if (andProbes.isEmpty && anyOfProbes.isEmpty) None
    else {
      val key = conjuncts.map(_.canonicalized.toString).sorted.mkString(";")
      val cached = survivorCache.get(key)
      if (cached != null) Some(cached)
      else {
        // compute OUTSIDE any map lock — survivorIds runs Spark jobs
        val sets =
          (if (andProbes.nonEmpty)
             Seq(PrunedScan.survivorIds(manifest, andProbes, blooms).toSet)
           else Nil) ++
            anyOfProbes.map(_.map(p =>
              PrunedScan.survivorIds(manifest, Seq(p), blooms).toSet)
              .reduce(_ union _))
        val ids = sets.reduce(_ intersect _)
        if (survivorCache.size >= MaxCachedPredicates) survivorCache.clear()
        survivorCache.put(key, ids)
        Some(ids)
      }
    }
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(a, b) => split(a) ++ split(b)
    case other => Seq(other)
  }

  private def covered(a: AttributeReference): Boolean =
    statCols.contains(a.name)

  private def litCol(l: Literal): Column =
    org.apache.spark.sql.GraftExpr.column(l)

  /** A conjunct → one probe (Left), an any-of probe set (Right), or
    * nothing (no pruning from this conjunct). Only bare attribute vs
    * non-null literal shapes translate; IN fan-out is capped so the
    * per-value survivor jobs stay trivially bounded. */
  private def translate(
      e: Expression): Option[Either[FileProbe, Seq[FileProbe]]] = {
    val MaxInFanout = 16
    def nn(l: Literal): Boolean = l.value != null
    e match {
      case EqualTo(a: AttributeReference, l: Literal)
          if covered(a) && nn(l) =>
        Some(scala.util.Left(EqualProbe(a.name, litCol(l))))
      case EqualTo(l: Literal, a: AttributeReference)
          if covered(a) && nn(l) =>
        Some(scala.util.Left(EqualProbe(a.name, litCol(l))))
      case EqualNullSafe(a: AttributeReference, l: Literal) if covered(a) =>
        Some(scala.util.Left(if (nn(l)) EqualProbe(a.name, litCol(l))
        else NullProbe(a.name)))
      case EqualNullSafe(l: Literal, a: AttributeReference) if covered(a) =>
        Some(scala.util.Left(if (nn(l)) EqualProbe(a.name, litCol(l))
        else NullProbe(a.name)))
      case GreaterThan(a: AttributeReference, l: Literal)
          if covered(a) && nn(l) =>
        Some(scala.util.Left(CompareProbe(a.name, ">", litCol(l))))
      case GreaterThan(l: Literal, a: AttributeReference)
          if covered(a) && nn(l) =>
        Some(scala.util.Left(CompareProbe(a.name, "<", litCol(l))))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
          if covered(a) && nn(l) =>
        Some(scala.util.Left(CompareProbe(a.name, ">=", litCol(l))))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
          if covered(a) && nn(l) =>
        Some(scala.util.Left(CompareProbe(a.name, "<=", litCol(l))))
      case LessThan(a: AttributeReference, l: Literal)
          if covered(a) && nn(l) =>
        Some(scala.util.Left(CompareProbe(a.name, "<", litCol(l))))
      case LessThan(l: Literal, a: AttributeReference)
          if covered(a) && nn(l) =>
        Some(scala.util.Left(CompareProbe(a.name, ">", litCol(l))))
      case LessThanOrEqual(a: AttributeReference, l: Literal)
          if covered(a) && nn(l) =>
        Some(scala.util.Left(CompareProbe(a.name, "<=", litCol(l))))
      case LessThanOrEqual(l: Literal, a: AttributeReference)
          if covered(a) && nn(l) =>
        Some(scala.util.Left(CompareProbe(a.name, ">=", litCol(l))))
      case IsNull(a: AttributeReference) if covered(a) =>
        Some(scala.util.Left(NullProbe(a.name)))
      case StartsWith(a: AttributeReference, l: Literal)
          if covered(a) && l.value != null &&
            a.dataType == org.apache.spark.sql.types.StringType =>
        Some(scala.util.Left(PrefixProbe(a.name, l.value.toString)))
      case In(a: AttributeReference, vs)
          if covered(a) && vs.nonEmpty && vs.size <= MaxInFanout &&
            vs.forall { case l: Literal => l.value != null; case _ => false } =>
        Some(scala.util.Right(vs.map(v =>
          EqualProbe(a.name, litCol(v.asInstanceOf[Literal])))))
      case InSet(a: AttributeReference, set)
          if covered(a) && set.nonEmpty && set.size <= MaxInFanout &&
            !set.contains(null) =>
        Some(scala.util.Right(set.toSeq.map(v =>
          EqualProbe(a.name, litCol(Literal(v, a.dataType))))))
      case _ => None
    }
  }
}

/** The user-facing constructor for a transparently-pruned table. */
object ManifestFileIndex {

  /** Read `dir` (a [[graft.operators.Layout.assignedWrite]] layout) as a
    * DataFrame whose scans consult `manifest` at listing time: every
    * plain `.where(...)` over it is file-pruned by its own pushed
    * filters — no [[FileProbe]]s, no opt-in. `manifest` must be PINNED
    * (localCheckpoint) — it is read per distinct predicate at planning
    * time. Pass `blooms` to sharpen equality probes on unsorted columns
    * (the q97 sidecars). The returned frame is schema-identical to
    * `spark.read.option("basePath", dir).parquet(dir)`. */
  def manifestParquet(
      spark: SparkSession, dir: String, manifest: DataFrame,
      blooms: Map[String, BloomSidecar] = Map.empty): DataFrame = {
    val index = new ManifestFileIndex(spark, dir, manifest, blooms)
    val dataSchema = StructType(
      spark.read.option("basePath", dir).parquet(dir)
        .schema.filterNot(f =>
          index.partitionSpec().partitionColumns.fieldNames
            .contains(f.name)))
    val relation = HadoopFsRelation(
      index, index.partitionSpec().partitionColumns, dataSchema, None,
      new ParquetFileFormat, Map("basePath" -> dir))(spark)
    spark.baseRelationToDataFrame(relation)
  }

  /** The LIVE twin: transparent pruning against the manifest (+ Bloom
    * sidecars) a [[graft.streaming.StreamingManifest]] attach maintains —
    * [[PrunedScan.prunedParquetLive]] with the probes derived from each
    * query instead of handed in. None before the first committed
    * trigger. */
  def manifestParquetLive(
      spark: SparkSession, dir: String, statePath: String,
      bloomShapes: Map[String, (Int, Int)] = Map.empty): Option[DataFrame] =
    graft.streaming.StreamingManifest.currentManifest(spark, statePath)
      .map { man =>
        val blooms = bloomShapes.flatMap { case (c, (mBits, k)) =>
          graft.streaming.StreamingManifest
            .currentBloom(spark, statePath, c)
            .map(regs => c -> BloomSidecar(regs, mBits, k))
        }
        manifestParquet(spark, dir, man.localCheckpoint(true), blooms)
      }
}
