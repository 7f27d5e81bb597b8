package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Manifest bootstrap for EXISTING tables (round-15 verdict task 2):
  * [[graft.operators.Layout.fileManifest]] recomputes per-file statistics
  * from the data frame — correct for a table you are writing, wasteful
  * for one you are adopting: parquet files already carry min/max/null
  * counts in their FOOTERS. `fromFooters` builds the same manifest frame
  * from one driver-side footer read per file — never a corpus scan — so
  * [[PrunedScan]] / [[ManifestFileIndex]] work on any parquet directory,
  * exactly how Delta's `CONVERT TO DELTA` adopts a plain table: harvest
  * footer stats once, plan from the manifest forever after.
  *
  * File identity: a file under a `file_id=k/` directory (the
  * [[graft.operators.Layout.assignedWrite]] layout) keeps that id — and
  * files sharing one id fold into ONE manifest row (the id is the
  * pruning unit; `path` is then the directory). A plain
  * `df.write.parquet` layout has no ids, so each file gets its rank in
  * the sorted file listing — deterministic for a fixed directory — and
  * `path` is the file itself, which [[PrunedScan.prunedParquetPaths]]
  * reads back selectively.
  *
  * Type coverage (DECLARED — fail-loudly beyond it): byte/short/int/
  * long/float/double/date/string. Strings compare by unsigned UTF-8
  * byte order — the same ordering Spark's min/max use — via parquet's
  * own Binary comparator. A column chunk with missing statistics (or an
  * unset null count) on a non-empty file raises rather than fabricating
  * bounds: a wrong bound would prune a file that holds matches, and the
  * whole contract here is that pruning is provably lossless. Spark- and
  * parquet-mr-written files always carry chunk statistics for these
  * types.
  */
object FooterManifest {

  private val FileIdDir = "file_id=(\\d+)".r

  /** Build the manifest frame — `file_id, path, n_rows,
    * <c>_min/_max/_nulls` per stat column — from footers alone. Column
    * types mirror the table's Spark schema, so the frame is
    * drop-in-compatible with [[graft.operators.Layout.pruneRange]] /
    * [[PrunedScan]] probes and (modulo the extra `path` column) with a
    * [[graft.operators.Layout.fileManifest]] built from the data. */
  def fromFooters(
      spark: SparkSession, dir: String,
      statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "fromFooters: no stat columns")
    val tableSchema = spark.read.option("basePath", dir).parquet(dir).schema
    val colType: Map[String, DataType] =
      statCols.map { c =>
        val f = tableSchema.find(_.name == c).getOrElse(throw
          new IllegalArgumentException(s"fromFooters: $c not in $dir schema"))
        f.dataType match {
          case t @ (ByteType | ShortType | IntegerType | LongType |
                    FloatType | DoubleType | DateType | StringType) => c -> t
          case other => throw new IllegalArgumentException(
            s"fromFooters: unsupported stat type ${other.simpleString} " +
              s"for $c — declared coverage is integral/float/date/string")
        }
      }.toMap

    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    // one level of nesting covers both layouts (flat and file_id=k/);
    // `_`/`.`-prefixed names are metadata (Spark's hidden-path rule —
    // _SUCCESS, and [[GraftTable]]'s own _graft_manifest dir), never data
    def visible(p: Path): Boolean =
      !p.getName.startsWith("_") && !p.getName.startsWith(".")
    val files = {
      val it = fs.listStatus(root).toSeq.filter(s => visible(s.getPath))
      val flat = it.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val nested = it.filter(_.isDirectory).flatMap(d =>
        fs.listStatus(d.getPath).toSeq
          .filter(s => s.isFile && visible(s.getPath) &&
            s.getPath.getName.endsWith(".parquet")))
      (flat ++ nested).map(_.getPath).sortBy(_.toString)
    }
    require(files.nonEmpty, s"fromFooters: no parquet files under $dir")

    // (file_id, unit path): id from the dir name when present, else the
    // sorted rank; the unit path is what a reader opens for that id
    val idOf: Path => Option[Long] = p => p.getParent.getName match {
      case FileIdDir(k) => Some(k.toLong)
      case _ => None
    }
    val anyIds = files.exists(idOf(_).isDefined)
    // a MIXED layout (file_id=k/ dirs plus stray flat files) would hand
    // flat files rank ids that collide with real dir ids and silently
    // drop rows from an id-addressed pruned read — fail loudly instead
    require(!anyIds || files.forall(idOf(_).isDefined),
      s"fromFooters: $dir mixes file_id= dirs with flat parquet files — " +
        "clean the strays or adopt the two layouts separately")
    val keyed: Seq[(Long, String, Path)] = files.zipWithIndex.map {
      case (p, rank) => idOf(p) match {
        case Some(k) if anyIds => (k, p.getParent.toUri.getPath, p)
        case _ => (rank.toLong, p.toUri.getPath, p)
      }
    }

    // per-file footer fold: (n_rows, per-col (min, max, nulls))
    final case class ColStats(min: Any, max: Any, nulls: Long)
    def footerStats(p: Path): (Long, Map[String, ColStats]) = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val nRows = blocks.map(_.getRowCount).sum
        val per = statCols.map { c =>
          var mn: Any = null
          var mx: Any = null
          var nulls = 0L
          blocks.foreach { b =>
            val ccm = b.getColumns.asScala
              .find(_.getPath.toDotString == c).getOrElse(throw
                new IllegalStateException(s"fromFooters: $p has no chunk for $c"))
            val st = ccm.getStatistics
            require(st != null && st.isNumNullsSet,
              s"fromFooters: $p chunk $c carries no null count — cannot " +
                "build a lossless manifest from this footer")
            nulls += st.getNumNulls
            if (st.hasNonNullValue) {
              val (bMin, bMax) = (st.genericGetMin, st.genericGetMax)
              if (mn == null || cmp(bMin, mn) < 0) mn = bMin
              if (mx == null || cmp(bMax, mx) > 0) mx = bMax
            } else require(st.getNumNulls == b.getRowCount || b.getRowCount == 0L,
              s"fromFooters: $p chunk $c has values but no min/max " +
                "statistics — cannot build a lossless manifest")
          }
          val pt = reader.getFooter.getFileMetaData.getSchema
            .getColumnDescription(Array(c)).getPrimitiveType
          c -> ColStats(decode(mn, pt, colType(c), c),
            decode(mx, pt, colType(c), c), nulls)
        }.toMap
        (nRows, per)
      } finally reader.close()
    }

    def cmp(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)

    // fold files sharing an id (multi-file file_id=k/ dirs) into one row
    val rows = keyed.groupBy { case (id, unit, _) => (id, unit) }.toSeq
      .sortBy(_._1._1)
      .map { case ((id, unit), group) =>
        val stats = group.map { case (_, _, p) => footerStats(p) }
        val nRows = stats.map(_._1).sum
        val folded = statCols.map { c =>
          val cs = stats.map(_._2(c))
          val mins = cs.map(_.min).filter(_ != null)
          val maxs = cs.map(_.max).filter(_ != null)
          ColStats(
            if (mins.isEmpty) null else mins.reduce((a, b) => if (extCmp(a, b, colType(c)) <= 0) a else b),
            if (maxs.isEmpty) null else maxs.reduce((a, b) => if (extCmp(a, b, colType(c)) >= 0) a else b),
            cs.map(_.nulls).sum)
        }
        Row.fromSeq(Seq(id, unit, nRows) ++
          folded.flatMap(s => Seq(s.min, s.max, s.nulls)))
      }

    val schema = StructType(
      Seq(StructField("file_id", LongType, nullable = false),
        StructField("path", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false)) ++
        statCols.flatMap(c => Seq(
          StructField(s"${c}_min", colType(c)),
          StructField(s"${c}_max", colType(c)),
          StructField(s"${c}_nulls", LongType, nullable = false))))
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Bloom sidecar for an ADOPTED table (round-16 verdict task 5):
    * [[fromFooters]] gives min/max/null pruning, but equality probes on a
    * column the layout is NOT sorted by stay unsharpened — exactly q97's
    * honest failure case, reopened for adoption. This is the declared
    * single data pass that closes it: read the table once (column-pruned
    * to `column` + file identity — a columnar scan reads only that
    * column's bytes), key each row by its manifest unit, and fold
    * [[graft.operators.Bloom.registers]] per file. Feed the result to
    * [[PrunedScan]] / [[ManifestFileIndex]] as a [[BloomSidecar]].
    *
    * File identity mirrors [[fromFooters]]: a `file_id=k/` layout keys by
    * the partition value; a flat layout keys by FILENAME joined against
    * the manifest's `path` basenames (broadcast, manifest-sized) —
    * filenames in one directory are unique by construction, and the
    * nested-arbitrary-dir case where basenames could collide fails
    * loudly rather than mis-keying a register. */
  def bloomSidecar(
      spark: SparkSession, dir: String, manifest: DataFrame,
      bloomCol: String, mBits: Int, k: Int): DataFrame =
    graft.operators.Bloom.registers(
      withUnitIds(spark, dir, manifest, Seq(bloomCol)),
      Seq("file_id"), bloomCol, mBits, k)

  /** Read the table column-pruned to `cols`, each row keyed by its
    * manifest unit as `file_id` — the shared plumbing of every
    * data-derived sidecar over an adopted table ([[bloomSidecar]], the
    * [[GraftTable]] MG key summaries). `file_id=k/` layouts key by the
    * partition value; flat layouts key by filename against the
    * manifest's `path` basenames (broadcast, manifest-sized; unique in
    * one directory by construction, fail-loud otherwise). */
  def withUnitIds(
      spark: SparkSession, dir: String, manifest: DataFrame,
      cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = spark.read.option("basePath", dir).parquet(dir)
    if (t.columns.contains("file_id"))
      t.select(col("file_id").cast("long").as("file_id") +: cols.map(col): _*)
    else {
      val ids = manifest
        .select(col("file_id").cast("long"),
          element_at(split(col("path"), "/"), -1))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      require(ids.map(_._2).distinct.length == ids.length,
        "withUnitIds: manifest unit basenames collide — flat-layout " +
          "keying needs unique filenames (re-adopt per subdirectory)")
      val idsDf = spark.createDataFrame(ids).toDF("file_id", "_fb_base")
      t.select(cols.map(col): _*)
        .withColumn("_fb_base",
          element_at(split(input_file_name(), "/"), -1))
        .join(broadcast(idsDf), Seq("_fb_base"))
        .select(col("file_id") +: cols.map(col): _*)
    }
  }

  /** Footer value → Spark external value under the declared coverage. */
  private def decode(v: Any, pt: org.apache.parquet.schema.PrimitiveType,
      target: DataType, c: String): Any = {
    if (v == null) return null
    (pt.getPrimitiveTypeName, target) match {
      case (PrimitiveTypeName.INT32, DateType) =>
        pt.getLogicalTypeAnnotation match {
          case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
            java.sql.Date.valueOf(
              java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
          case other => throw new IllegalStateException(
            s"fromFooters: $c is DateType but parquet annotation is $other")
        }
      case (PrimitiveTypeName.INT32, IntegerType) => v
      case (PrimitiveTypeName.INT32, ShortType) =>
        v.asInstanceOf[Int].toShort
      case (PrimitiveTypeName.INT32, ByteType) => v.asInstanceOf[Int].toByte
      case (PrimitiveTypeName.INT64, LongType) => v
      case (PrimitiveTypeName.FLOAT, FloatType) => v
      case (PrimitiveTypeName.DOUBLE, DoubleType) => v
      case (PrimitiveTypeName.BINARY, StringType) =>
        v.asInstanceOf[Binary].toStringUsingUTF8
      case (p, t) => throw new IllegalStateException(
        s"fromFooters: $c physical $p does not decode to ${t.simpleString}")
    }
  }

  /** Ordering on DECODED externals (cross-file fold): numeric/natural for
    * the scalar types; strings re-compare by UTF-8 bytes (the parquet
    * and Spark ordering, not UTF-16 code units). */
  private def extCmp(a: Any, b: Any, t: DataType): Int = t match {
    case StringType => Binary.fromString(a.asInstanceOf[String])
      .compareTo(Binary.fromString(b.asInstanceOf[String]))
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
  }
}
