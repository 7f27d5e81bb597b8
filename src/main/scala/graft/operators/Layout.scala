package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering for scan
  * pruning: interleave the bits of per-dimension bucket indices so rows
  * close in EVERY dimension are close in ONE sort key, then range-partition
  * and sort files by it. At 100 TB this is how a parquet lake serves
  * selective multi-column predicates: each file covers a tight z-range =
  * a tight box in every dimension, so min/max footer stats prune files for
  * predicates on ANY prefix of the layout dims — where a lexicographic
  * sort only prunes on the leading column.
  *
  * North-star extension (not in the reference — the reference's H2 tables
  * have no layout control at all). All arithmetic is INTEGER (exact bucket
  * = `(x − min)·2^bits DIV (max − min + 1)`, unrolled shift/mask
  * interleave) — no floating point anywhere, so a SQL oracle replays the
  * z-values bit-for-bit and the layout is reproducible across engines.
  *
  * Scale shape: one broadcast min/max aggregate (row-count-independent),
  * then a pure per-row map — the z column adds NO shuffle; [[zOrderWrite]]
  * adds the one range-exchange any clustered write needs. */
object Layout {

  /** Per-dimension bucket index in `[0, 2^bits)` — exact integer math,
    * engine-portable (`DIV` truncation on non-negative operands). A
    * constant dimension (max == min) buckets to 0. The span guard lives
    * INSIDE the CASE (branch short-circuiting), not alongside it: codegen's
    * common-subexpression elimination hoists the repeated bucket expression
    * above any sibling guard column, so a standalone guard would lose the
    * race to the ANSI overflow on `_max − _min + 1`. */
  private def bucket(c: String, bits: Int): Column =
    expr(s"""CASE WHEN _max_$c = _min_$c THEN CAST(0 AS BIGINT)
             WHEN try_subtract(_max_$c, _min_$c) IS NULL
                  OR try_subtract(_max_$c, _min_$c) >= ${1L << (63 - bits)}
             THEN raise_error(concat(
                    'layout span overflow: column $c spans ',
                    coalesce(CAST(try_subtract(_max_$c, _min_$c) AS STRING),
                             '>2^63'),
                    ' >= 2^${63 - bits}; bucket the column first'))
             ELSE (CAST($c AS BIGINT) - _min_$c) * ${1L << bits}
                  DIV (_max_$c - _min_$c + 1) END""")

  /** The SQL text of [[bucket]] with explicit bounds — shared with oracle
    * generation (see [[zValueSql]]). */
  private def bucketSql(c: String, bits: Int): String =
    s"""CASE WHEN mm._max_$c = mm._min_$c THEN CAST(0 AS BIGINT)
        ELSE (CAST($c AS BIGINT) - mm._min_$c) * ${1L << bits}
             // (mm._max_$c - mm._min_$c + 1) END"""

  /** Shared layout-column precondition: integrality is a hard plan-time
    * requirement (fractional casts diverge across engines — Spark
    * truncates, DuckDB rounds) for every curve ([[withZValue]],
    * [[withHilbertValue]], [[withHilbertValueN]]). */
  private def requireIntegral(df: DataFrame, cols: Seq[String]): Unit = {
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    cols.foreach { c =>
      val f = df.schema.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"layout column $c not in schema"))
      require(integral.contains(f.dataType),
        s"layout column $c must be integral (byte/short/int/long), " +
          s"got ${f.dataType.simpleString} — floor/bucket it first")
    }
  }

  /** The one-row broadcast min/max frame every curve buckets against. */
  private def minMaxFrame(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggExprs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"_min_$c"),
      max(col(c)).cast("long").as(s"_max_$c")))
    df.agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** Append `zCol`: the Morton interleave of `cols`' bucket indices
    * (`bits` per dimension, dimension 0 owns the most significant bit of
    * each group). Null dimension values bucket to 0 (they sort first).
    * Supports up to `63 / cols.size` bits per dimension.
    *
    * Range constraint (ENFORCED): each column's span `max − min` must stay
    * below `2^(63−bits)` or the exact bucket product overflows — true for
    * every realistic layout key (ids, dates, small measures). A wide-span
    * column (e.g. a full-width hash) raises at runtime via a guard over the
    * already-computed min/max frame; bucket it first. Layout columns must
    * be INTEGRAL (checked at plan time): the bucket casts to BIGINT, and
    * fractional casts diverge across engines (Spark truncates, DuckDB
    * rounds) — floor a double column into an integer bucket before passing
    * it here. */
  def withZValue(
      df: DataFrame, cols: Seq[String], bits: Int = 8,
      zCol: String = "z_value"): DataFrame = {
    require(cols.nonEmpty, "at least one layout column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*dims must fit a signed long, got $bits x ${cols.size}")
    requireIntegral(df, cols)
    val mm = minMaxFrame(df, cols)
    val n = cols.size
    // the runtime span guard (wide span => descriptive raise_error, not a
    // wrapped/ANSI-overflowed z-value) lives inside bucket()'s CASE
    val z = cols.zipWithIndex.flatMap { case (c, d) =>
      val b = coalesce(bucket(c, bits), lit(0L))
      (0 until bits).map(i =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + (n - 1 - d)))
    }.reduce(_.bitwiseOR(_))
    df.crossJoin(broadcast(mm))
      .withColumn(zCol, z)
      .drop(cols.flatMap(c => Seq(s"_min_$c", s"_max_$c")): _*)
  }

  /** DuckDB-dialect SQL for the same z-value over `table` — generated
    * (not hand-unrolled) so queries can oracle any dims/bits combination.
    * Mirrors [[withZValue]] term for term: integer buckets, shift/mask
    * interleave, nulls to 0. */
  def zValueSql(table: String, cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val mins = cols.map(c =>
      s"MIN(CAST($c AS BIGINT)) AS _min_$c, MAX(CAST($c AS BIGINT)) AS _max_$c")
      .mkString(", ")
    val terms = cols.zipWithIndex.flatMap { case (c, d) =>
      val b = s"COALESCE(${bucketSql(c, bits)}, 0)"
      (0 until bits).map(i => s"((($b >> $i) & 1) << ${i * n + (n - 1 - d)})")
    }
    s"""SELECT t.*, (${terms.mkString(" | ")}) AS z_value
        FROM $table t CROSS JOIN (SELECT $mins FROM $table) mm"""
  }

  /** Append `hCol`: the 2-D HILBERT index of `cols`' bucket indices —
    * same bucketing contract as [[withZValue]] (integral columns, span
    * guard, nulls bucket to 0), better locality: consecutive Hilbert
    * indices are always grid neighbors, where the Z curve jumps across
    * the plane at every power-of-two boundary, so files cut from a
    * Hilbert-sorted order cover tighter (day × key)-style boxes and
    * prune harder on two-column predicates (q92b measures the gap).
    * The walk itself is the [[graft.functions.HilbertIndex]] native
    * kernel — a per-level state dependency that would grow ~4^bits
    * expression nodes as a Column fold. */
  def withHilbertValue(
      df: DataFrame, cols: Seq[String], bits: Int = 8,
      hCol: String = "h_value"): DataFrame = {
    require(cols.size == 2, s"hilbert layout takes exactly 2 columns, got ${cols.size}")
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    requireIntegral(df, cols)
    val mm = minMaxFrame(df, cols)
    val bx = coalesce(bucket(cols(0), bits), lit(0L))
    val by = coalesce(bucket(cols(1), bits), lit(0L))
    df.crossJoin(broadcast(mm))
      .withColumn(hCol, org.apache.spark.sql.GraftExpr.column(
        graft.functions.HilbertIndex(
          org.apache.spark.sql.GraftExpr.expression(bx),
          org.apache.spark.sql.GraftExpr.expression(by), bits)))
      .drop(cols.flatMap(c => Seq(s"_min_$c", s"_max_$c")): _*)
  }

  /** DuckDB-dialect SQL for the same Hilbert index over `table` —
    * GENERATED like [[zValueSql]], but as a chain of `bits` CTE levels
    * (each materializing the walk state (hx, hy, hd) once — the linear
    * form of the sequential dependency the native kernel loops over).
    * Returns a complete `WITH … SELECT carryCols…, h_value` statement;
    * embed as a parenthesized subquery. Mirrors [[withHilbertValue]]
    * term for term: same buckets, nulls to 0, same reflect/swap walk. */
  def hilbertSql(
      table: String, colA: String, colB: String, bits: Int,
      carryCols: Seq[String]): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    require(carryCols.nonEmpty, "carryCols must be non-empty")
    val mins = Seq(colA, colB).map(c =>
      s"MIN(CAST($c AS BIGINT)) AS _min_$c, MAX(CAST($c AS BIGINT)) AS _max_$c")
      .mkString(", ")
    val carry = carryCols.mkString(", ")
    val levels = (0 until bits).map { k =>
      val s = 1L << (bits - 1 - k)
      s"""h${k + 1} AS (SELECT $carry,
            CASE WHEN (hy & $s) = 0
                 THEN (CASE WHEN (hx & $s) > 0 THEN $s - 1 - hy ELSE hy END)
                 ELSE hx END AS hx,
            CASE WHEN (hy & $s) = 0
                 THEN (CASE WHEN (hx & $s) > 0 THEN $s - 1 - hx ELSE hx END)
                 ELSE hy END AS hy,
            hd + ${s * s} * xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
                                (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)) AS hd
          FROM h$k)"""
    }
    s"""WITH hmm AS (SELECT $mins FROM $table),
        h0 AS (SELECT $carry,
                 COALESCE(${bucketSql(colA, bits)}, 0) AS hx,
                 COALESCE(${bucketSql(colB, bits)}, 0) AS hy,
                 CAST(0 AS BIGINT) AS hd
               FROM $table t CROSS JOIN hmm mm),
        ${levels.mkString(",\n")}
        SELECT $carry, hd AS h_value FROM h$bits"""
  }

  /** [[withHilbertValue]] generalized to N dimensions (round-14 verdict
    * task 6) — same bucketing contract (integral columns, span guard,
    * nulls bucket to 0), Skilling's transpose walk instead of the 2-D
    * reflect/swap ([[graft.functions.HilbertKernel]]); `bits·dims ≤ 63`.
    * 3-4 layout columns is the common lake case, and it is where
    * Hilbert's tighter boxes beat z-order hardest (q92d measures it at
    * 3 dims the way q92b did at 2). */
  def withHilbertValueN(
      df: DataFrame, cols: Seq[String], bits: Int = 6,
      hCol: String = "h_value"): DataFrame = {
    require(cols.size >= 2, s"need >= 2 layout columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*dims must fit a signed long, got $bits x ${cols.size}")
    requireIntegral(df, cols)
    val mm = minMaxFrame(df, cols)
    val bucketExprs = cols.map(c =>
      org.apache.spark.sql.GraftExpr.expression(
        coalesce(bucket(c, bits), lit(0L))))
    df.crossJoin(broadcast(mm))
      .withColumn(hCol, org.apache.spark.sql.GraftExpr.column(
        graft.functions.HilbertIndexN(bucketExprs, bits)))
      .drop(cols.flatMap(c => Seq(s"_min_$c", s"_max_$c")): _*)
  }

  /** DuckDB-dialect SQL replaying [[withHilbertValueN]] — GENERATED as a
    * CTE chain like [[hilbertSql]], but unrolling Skilling's walk: one
    * CTE per (level, dimension) exchange/invert step (the i-loop is
    * order-dependent through word 0, so it cannot collapse into one
    * SELECT), then gray-encode, the t-fold, and the interleave. Returns
    * a complete `WITH … SELECT carryCols…, h_value` statement. */
  def hilbertSqlN(
      table: String, cols: Seq[String], bits: Int,
      carryCols: Seq[String]): String = {
    require(cols.size >= 2, s"need >= 2 layout columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*dims must fit a signed long, got $bits x ${cols.size}")
    require(carryCols.nonEmpty, "carryCols must be non-empty")
    val n = cols.size
    val carry = carryCols.mkString(", ")
    val xs = (0 until n).map(i => s"x$i")
    val mins = cols.map(c =>
      s"MIN(CAST($c AS BIGINT)) AS _min_$c, MAX(CAST($c AS BIGINT)) AS _max_$c")
      .mkString(", ")
    val h0 =
      s"""hn0 AS (SELECT $carry,
            ${cols.zipWithIndex.map { case (c, i) =>
              s"COALESCE(${bucketSql(c, bits)}, 0) AS x$i" }.mkString(",\n            ")}
          FROM $table t CROSS JOIN hnmm mm)"""
    // exchange/invert steps: level q = 2^(bits-1) … 2, word i = 0 … n-1
    var step = 0
    val steps = scala.collection.mutable.ArrayBuffer.empty[String]
    for (lb <- (1 until bits).reverse; i <- 0 until n) {
      val q = 1L << lb
      val p = q - 1
      val prev = if (step == 0) "hn0" else s"hns$step"
      step += 1
      val outCols = xs.indices.map { j =>
        if (i == 0 && j == 0)
          s"CASE WHEN (x0 & $q) != 0 THEN xor(x0, $p) ELSE x0 END AS x0"
        else if (j == 0)
          s"""CASE WHEN (x$i & $q) != 0 THEN xor(x0, $p)
              ELSE xor(x0, xor(x0, x$i) & $p) END AS x0"""
        else if (j == i)
          s"""CASE WHEN (x$i & $q) != 0 THEN x$i
              ELSE xor(x$i, xor(x0, x$i) & $p) END AS x$i"""
        else s"x$j"
      }
      steps += s"""hns$step AS (SELECT $carry,
            ${outCols.mkString(",\n            ")}
          FROM $prev)"""
    }
    val lastStep = if (step == 0) "hn0" else s"hns$step"
    // gray encode: xg_i = x0 ^ … ^ x_i (cumulative xor of the originals)
    val grayCols = xs.indices.map { i =>
      val folded = (0 to i).map(j => s"x$j")
        .reduce((a, b) => s"xor($a, $b)")
      s"$folded AS x$i"
    }
    // t = fold over levels of (x_{n-1} & q ? q-1 : 0)
    val tExpr = (1 until bits).reverse
      .map { lb =>
        val q = 1L << lb
        s"(CASE WHEN (x${n - 1} & $q) != 0 THEN ${q - 1} ELSE 0 END)"
      }
      .reduceOption((a, b) => s"xor($a, $b)").getOrElse("0")
    val g =
      s"""hng AS (SELECT $carry, ${grayCols.mkString(", ")}
          FROM $lastStep)"""
    val f =
      s"""hnf AS (SELECT $carry,
            ${xs.map(x => s"xor($x, $tExpr) AS $x").mkString(",\n            ")}
          FROM hng)"""
    val interleave = (0 until bits).flatMap { lvl =>
      (0 until n).map(j =>
        s"(((x$j >> $lvl) & 1) << ${lvl * n + (n - 1 - j)})")
    }.mkString(" | ")
    s"""WITH hnmm AS (SELECT $mins FROM $table),
        $h0,
        ${steps.mkString(",\n        ")},
        $g,
        $f
        SELECT $carry, ($interleave) AS h_value FROM hnf"""
  }

  /** Write `df` z-clustered: range-partition on the z-value into
    * `numFiles` tasks and sort each by z before writing, so every parquet
    * file covers a DISJOINT z-range (one box chain in dimension space) and
    * footer min/max stats prune multi-column predicates. The z column is
    * kept in the files — it is the clustering key a reader prunes on. */
  def zOrderWrite(
      df: DataFrame, cols: Seq[String], path: String,
      bits: Int = 8, numFiles: Int = 8): Unit =
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, col("z_value"))
      .sortWithinPartitions("z_value")
      .write.mode("overwrite").parquet(path)

  /** [[zOrderWrite]]'s Hilbert twin: same disjoint-range file contract on
    * `h_value`, tighter per-file boxes (q92b: −38% total box area on the
    * same buckets). Two dims only — the [[withHilbertValue]] constraint. */
  def hilbertOrderWrite(
      df: DataFrame, cols: Seq[String], path: String,
      bits: Int = 8, numFiles: Int = 8): Unit =
    withHilbertValue(df, cols, bits)
      .repartitionByRange(numFiles, col("h_value"))
      .sortWithinPartitions("h_value")
      .write.mode("overwrite").parquet(path)

  /** Compaction stats: the before/after file inventory [[compactFiles]]
    * reports. Content identity is deliberately NOT in here — it is the
    * caller's hash check (q82 pins it through the DuckDB oracle; LayoutSpec
    * pins it row-for-row). */
  final case class CompactionStats(
      nFilesIn: Long, bytesIn: Long, nFilesOut: Long, bytesOut: Long,
      targetFiles: Long)

  /** Exact-rank file assignment: adds `file_id` ∈ [0, nFiles) — file k
    * holds global-rank rows `[k·N/nFiles, (k+1)·N/nFiles)` under the TOTAL
    * order `orderCols` (supply a tie-free order: append a unique id). This
    * is the deterministic, engine-replayable form of what
    * `repartitionByRange(n).write` does with SAMPLED boundaries: the
    * assignment is a pure function of content (the [[graft.operators.Packing.globalRunningSum]]
    * distributed prefix sum — range exchange + bounded per-slice windows +
    * broadcast offsets, never a single-task global window), so the same
    * data yields the same file set on any layout, engine, or rerun — which
    * is what lets [[fileManifest]]'s per-file stats be hash-checked by an
    * oracle that recomputes the SAME assignment. Balanced by construction:
    * every file gets ⌈N/nFiles⌉ or ⌊N/nFiles⌋ rows. */
  def fileAssignments(
      df: DataFrame, orderCols: Seq[Column], nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val ranked = Packing.globalRunningSum(
      df.withColumn("_fm_one", lit(1L)), orderCols, "_fm_one", "_fm_rank")
    // N rides a broadcast one-row frame, not a driver collect; the integer
    // product (rank−1)·nFiles stays exact to N ≈ 9.2e18/nFiles
    val n = df.agg(count(lit(1)).as("_fm_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("file_id",
        expr(s"CAST((_fm_rank - 1) * $nFiles AS BIGINT) DIV _fm_n"))
      .drop("_fm_one", "_fm_rank", "_fm_n")
  }

  /** Write `df` under the [[fileAssignments]] contract a
    * [[graft.sources.PrunedScan]] reader prunes against: file `k` holds
    * exactly the rows `fileAssignments` maps to it, lands under
    * `path/file_id=k/` as ONE physical file (hash exchange on `file_id`
    * puts each id wholly in one task), and is sorted by `orderCols`
    * within, so parquet row-group footer stats nest inside the manifest's
    * file stats. The matching [[fileManifest]] over the same `df` is
    * byte-for-byte the written layout's statistics — deterministic by the
    * prefix-sum assignment, which is what lets an oracle replay the
    * survivor set. */
  def assignedWrite(
      df: DataFrame, orderCols: Seq[Column], nFiles: Int,
      path: String): Unit =
    fileAssignments(df, orderCols, nFiles)
      // EXPLICIT partition count (round-17, guide §2.5): a bare
      // `repartition(col)` lets AQE size the exchange by shuffle bytes,
      // which at local/small scale coalesces to ONE partition — all
      // nFiles file writes then run in a single task, serially. Pinning
      // the count to nFiles keeps parallelism ∝ the layout (each id
      // still lands wholly in one task → still one physical file per
      // directory, sorted within), and is scale-free: at 100 TB nFiles
      // IS the natural write fan-out.
      .repartition(nFiles, col("file_id"))
      .sortWithinPartitions(col("file_id") +: orderCols: _*)
      .write.mode("overwrite").partitionBy("file_id").parquet(path)

  /** [[assignedWrite]] and its matching [[fileManifest]], run as
    * CONCURRENT driver actions (round-17, guide §5 driver floor: the two
    * are independent deterministic jobs over the same input, and the
    * serial form paid the write's wall before the manifest's); returns
    * the PINNED manifest. Semantics identical to the sequential pair. */
  def writeWithManifest(
      df: DataFrame, orderCols: Seq[Column], nFiles: Int, path: String,
      statCols: Seq[String]): DataFrame = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val wF = Future(assignedWrite(df, orderCols, nFiles, path))
    val man = fileManifest(df, orderCols, nFiles, statCols)
      .localCheckpoint(true)
    Await.result(wF, Duration.Inf)
    man
  }

  /** Q88 — the write-time pruning manifest: per [[fileAssignments]] file,
    * exact `n_rows` plus `<col>_min` / `<col>_max` / `<col>_nulls` for each
    * stat column — the footer-stats table a 100 TB planner consults
    * INSTEAD of listing and opening files. One map-side-combined
    * aggregation over the assigned frame (shuffle ∝ nFiles rows); at a
    * real lake this fold runs inside the writer's task and costs nothing
    * extra. min/max ignore nulls (SQL semantics); an all-null file carries
    * null bounds and a full null count, so a range probe skips it and an
    * IS NULL probe keeps it. */
  def fileManifest(
      df: DataFrame, orderCols: Seq[Column], nFiles: Int,
      statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "fileManifest: no stat columns")
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    }
    fileAssignments(df, orderCols, nFiles)
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** The scan-pruning estimator over a [[fileManifest]]: answers "which
    * files can predicate P touch, and how many rows is that" from the
    * manifest ALONE — zero corpus I/O, the q85/q86 planner-statistics
    * family applied to file skipping. Adds one boolean `outCol` per probe:
    *  - `range(lo, hi)`  — true iff `[min, max] ∩ [lo, hi)` ≠ ∅
    *  - `equalTo(v)`     — true iff `min <= v <= max`
    *  - `isNull`         — true iff the file holds any null
    * A file with null bounds (all-null column) only matches `isNull`.
    * These are conservative (a surviving file may hold no matching row —
    * bounds are boxes, not bitmaps) but never wrong in the pruning
    * direction: a pruned file provably holds no match, so a scan over
    * surviving files is EXACT, not approximate. */
  def pruneRange(
      manifest: DataFrame, statCol: String, lo: Column, hi: Column,
      outCol: String): DataFrame =
    // coalesce: null bounds (all-null file) = documented non-match, not a
    // null verdict a consumer could mistake for "maybe"
    manifest.withColumn(outCol,
      coalesce(col(s"${statCol}_max") >= lo && col(s"${statCol}_min") < hi,
        lit(false)))

  /** Equality-probe variant of [[pruneRange]] (see there). */
  def pruneEqual(
      manifest: DataFrame, statCol: String, v: Column,
      outCol: String): DataFrame =
    manifest.withColumn(outCol,
      coalesce(col(s"${statCol}_min") <= v && col(s"${statCol}_max") >= v,
        lit(false)))

  private def listParquet(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Q82 — lakehouse small-file compaction (bin-packing maintenance): read
    * a fragmented parquet directory and rewrite it as
    * `ceil(inputBytes / targetFileBytes)` files, preserving the clustering
    * contract the table was written under — with `sortCol` (e.g.
    * [[zOrderWrite]]'s `z_value`), output files again cover DISJOINT sorted
    * ranges (range exchange + within-partition sort, the zOrderWrite
    * recipe), so footer min/max pruning survives compaction; without it,
    * plain bin-packing. This is the at-rest half of the 100 TB story: a
    * streaming ingest lands thousands of KB-sized files per hour, and scan
    * cost at that scale is dominated by file-open overhead until a
    * maintenance pass repacks them — content-identically, which is exactly
    * what the q82 oracle hash-checks (the fingerprint of the compacted copy
    * must equal the fingerprint DuckDB computes over the ORIGINAL table).
    *
    * The range exchange here is layout-only: which file a row lands in is
    * allowed to vary across Spark versions (RangePartitioner samples); the
    * CONTENT and the disjoint-range contract are what's pinned (LayoutSpec).
    * Returns the before/after inventory. */
  def compactFiles(
      spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileBytes: Long,
      sortCol: Option[String] = None): CompactionStats = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0")
    // in-place compaction is a data-loss trap (round-13 advice): the
    // overwrite-mode write lazily re-reads inPath WHILE clearing it —
    // Spark rejects it at best, and a stale file listing silently loses
    // rows at worst. Compare fully-qualified paths so `dir` vs `./dir` vs
    // `file:///...dir` spellings can't slip past the guard.
    val hconf = spark.sparkContext.hadoopConfiguration
    def qualified(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      // makeQualified absolutizes; URI.normalize folds `..`/`.` segments
      // (Hadoop Path keeps them literal)
      new org.apache.hadoop.fs.Path(
        hp.getFileSystem(hconf).makeQualified(hp).toUri.normalize())
    }
    require(qualified(inPath) != qualified(outPath),
      s"compactFiles: outPath must differ from inPath (${qualified(inPath)})" +
        " — an overwrite write cannot re-read the directory it is clearing")
    val inFiles = listParquet(spark, inPath)
    require(inFiles.nonEmpty, s"no parquet files under $inPath")
    val bytesIn = inFiles.map(_._2).sum
    val n = math.max(1L, (bytesIn + targetFileBytes - 1) / targetFileBytes).toInt
    val src = spark.read.parquet(inPath)
    val packed = sortCol match {
      case Some(c) =>
        src.repartitionByRange(n, col(c)).sortWithinPartitions(c)
      case None => src.repartition(n)
    }
    packed.write.mode("overwrite").parquet(outPath)
    val outFiles = listParquet(spark, outPath)
    CompactionStats(
      inFiles.size.toLong, bytesIn, outFiles.size.toLong,
      outFiles.map(_._2).sum, n.toLong)
  }
}
