package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink operators (SURVEY §2.2).
  *
  * K1 text/csv, K2 JDBC (batched upsert-free insert with NaN→0 coercion),
  * K3 upsert (see [[graft.streaming.DimensionMaintainer]] /
  * [[graft.operators.Compaction.applyUpserts]]), K5 delete-by-key
  * ([[graft.operators.Compaction.deleteKeys]]), K6 drop
  * (`spark.catalog.dropTempView`).
  */
object Sinks {

  /** K1 — text/CSV file sink (reference `TextIO.write().to("oee")`,
    * `…/dodetl/stp/BeamStreamProcessor.scala:115-118`). */
  def csv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  /** K1 streaming form — attach to a streaming frame:
    * `df.writeStream.format("csv").option("path", …).option("checkpointLocation", …)`. */
  def csvStreamWriter(df: DataFrame, path: String, checkpoint: String) =
    df.writeStream
      .format("csv")
      .option("path", path)
      .option("checkpointLocation", checkpoint)

  /** ORC sink — [[graft.sources.Sources.orcTable]]'s writer half. */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** P14 — processing-time stamp, the reference's `NOW(3)` on each sunk row
    * (`…/dodetl/utils/JDBCSink.scala:24`). Applied at the sink (batch or
    * foreachBatch), so the stamp is the processing time of the micro-batch
    * that landed the row. */
  def withIngestTime(df: DataFrame, colName: String = "ingest_ts"): DataFrame =
    df.withColumn(colName, current_timestamp())

  /** K2 — JDBC insert sink with the reference's NaN→0.0 coercion
    * (`…/dodetl/utils/JDBCSink.scala:8-32`, NaN at `:21`). Double AND float
    * columns are nanvl'd (the reference coerces per value, type-blind);
    * writes are Spark's batched JDBC inserts (the reference batched via
    * `addBatch`/`executeBatch`; `spark.write.jdbc` batches with `batchsize`,
    * default 1000). */
  def jdbcAppend(
      df: DataFrame, url: String, table: String,
      props: Map[String, String] = Map.empty): Unit = {
    val cleaned = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.DoubleType =>
          acc.withColumn(f.name, nanvl(col(f.name), lit(0.0)))
        case org.apache.spark.sql.types.FloatType =>
          acc.withColumn(f.name, nanvl(col(f.name), lit(0.0f)).cast("float"))
        case _ => acc
      }
    }
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    cleaned.write.mode(SaveMode.Append).jdbc(url, table, p)
  }

  /** K2 streaming form — foreachBatch JDBC append (idempotence is the
    * table's concern, as in the reference's fire-and-forget insert). */
  def jdbcForeachBatch(
      stream: DataFrame, url: String, table: String, checkpoint: String,
      props: Map[String, String] = Map.empty) =
    stream.writeStream
      .foreachBatch((batch: DataFrame, _: Long) => jdbcAppend(batch, url, table, props))
      .option("checkpointLocation", checkpoint)

  /** Create a table via plain JDBC DDL (reference K4 generated DDL from Avro
    * schemas, `…/dodetl/imtu/DatabaseManager.scala:101-126`; here the Spark
    * schema drives the column types). For engines Spark's JDBC writer can't
    * auto-create (or when indexes/PKs are wanted). */
  def createTableFromSchema(
      url: String, table: String, df: DataFrame,
      primaryKey: Option[String] = None): Unit = {
    val typeMap: org.apache.spark.sql.types.DataType => String = {
      case org.apache.spark.sql.types.LongType => "BIGINT"
      case org.apache.spark.sql.types.IntegerType => "INT"
      case org.apache.spark.sql.types.DoubleType => "DOUBLE"
      // REAL = 4-byte float on Derby/H2/Postgres — matches jdbcAppend's
      // FloatType handling (a VARCHAR here would stringify appended floats)
      case org.apache.spark.sql.types.FloatType => "REAL"
      case org.apache.spark.sql.types.TimestampType => "TIMESTAMP"
      case org.apache.spark.sql.types.BooleanType => "BOOLEAN"
      case _ => "VARCHAR(1024)"
    }
    // Identifiers are validated, not quoted: quoting would freeze case and
    // mismatch Spark's UNQUOTED JDBC references to the same table (Derby/H2
    // fold unquoted identifiers to upper case). The whitelist regex prevents
    // DDL injection (spaces, quotes, semicolons cannot appear); separately,
    // common SQL reserved words are rejected because unquoted they produce
    // broken DDL (the list is the ANSI core both Derby and H2 reserve — not
    // exhaustive, but it catches the names people actually try). Leading
    // underscores stay rejected: Derby's grammar refuses them UNQUOTED, and
    // this sink never quotes (the engine's `_`-prefixed columns are internal
    // plan columns that are projected away before any sink).
    val ident = "[A-Za-z][A-Za-z0-9_]*".r
    val reserved = Set(
      "select", "from", "where", "group", "order", "by", "having", "join",
      "inner", "outer", "left", "right", "on", "union", "insert", "update",
      "delete", "create", "drop", "alter", "table", "index", "primary",
      "key", "not", "null", "and", "or", "in", "is", "as", "distinct",
      "between", "like", "exists", "case", "when", "then", "else", "end",
      "user", "current_date", "current_time", "current_timestamp")
    def validate(kind: String, name: String): String = {
      require(
        ident.matches(name),
        s"$kind identifier '$name' is not a plain [A-Za-z][A-Za-z0-9_]* name")
      require(
        !reserved.contains(name.toLowerCase(java.util.Locale.ROOT)),
        s"$kind identifier '$name' is a SQL reserved word and would need quoting")
      name
    }
    validate("table", table)
    val cols = df.schema.fields.map { f =>
      val notNull = if (primaryKey.contains(f.name)) " NOT NULL" else ""
      s"${validate("column", f.name)} ${typeMap(f.dataType)}$notNull"
    }
    val pk = primaryKey
      .map(k => s", PRIMARY KEY (${validate("primary key", k)})").getOrElse("")
    val conn: Connection = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(s"CREATE TABLE $table (${cols.mkString(", ")}$pk)")
      st.close()
    } finally conn.close()
  }

  /** Persist a table bucketed (and per-bucket sorted) by its join/agg keys —
    * the storage-side half of shuffle elimination at 100 TB. Two tables
    * bucketed the same way (same columns, same `numBuckets`) equi-join on
    * those columns WITHOUT either side shuffling (`HashPartitioning`
    * satisfies the join's distribution requirement), and aggregations on the
    * bucket keys skip their exchange too. For a fact table re-joined every
    * batch/round (the reference's per-event dimension lookups, this engine's
    * dedup-pair attaches), one bucketed write amortizes the per-query
    * shuffle away.
    *
    * Bucket count sizes the parallelism of every downstream bucket-local
    * join: pick ≈ (table bytes / 128 MB), NOT the cluster core count.
    * `sortCols` default to the bucket keys — per-bucket sorted files let the
    * reader skip the sort for sort-merge plans. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String] = Nil, mode: SaveMode = SaveMode.Overwrite,
      path: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val sorts = if (sortCols.isEmpty) bucketCols else sortCols
    val w = df.write
      .mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
    // explicit path -> external table (data owned by the caller's location);
    // otherwise managed under spark.sql.warehouse.dir
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Morton/Z-value of two non-negative ints: their low `bits` bits
    * interleaved (a in the even positions, b in the odd). Rows close in
    * BOTH dimensions are close on the curve — the clustering key
    * [[writeZOrdered]] sorts by. Pure shift/mask expression tree
    * (2×`bits` terms), whole-stage-codegen'd; no UDF. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val bound = 1L << bits
    // fail LOUDLY on out-of-range input: silently masking the high bits
    // would collide far-apart keys onto the same curve position and the
    // promised pruning would quietly never materialize (negatives would
    // produce garbage via sign extension). Two comparisons per row — noise
    // against the write this feeds.
    def checked(c: Column, name: String): Column =
      when(c.isNull || c.cast("long") < 0 || c.cast("long") >= bound,
        raise_error(concat(
          lit(s"zValue: $name out of [0, $bound) for bits=$bits, got "),
          coalesce(c.cast("string"), lit("NULL")))).cast("long"))
        .otherwise(c.cast("long"))
    val al = checked(a, "a")
    val bl = checked(b, "b")
    (0 until bits)
      .map { i =>
        shiftleft(shiftright(al, i) % 2, 2 * i) +
          shiftleft(shiftright(bl, i) % 2, 2 * i + 1)
      }
      .reduce(_ + _)
  }

  /** Write `df` clustered on the Z-order curve of (`colA`, `colB`) — the
    * multi-dimensional counterpart of a linear sort, for scan pruning at
    * rest. A linear sort on A gives parquet row-group min/max stats that
    * prune A-predicates only; Z-order clustering gives BOTH columns
    * locality, so a 2-D range predicate (the "this day × this key range"
    * shape every operational query has) skips row groups on both
    * dimensions. Columns must be non-negative ints (epoch buckets, ids,
    * quantile ranks — rank/bucket continuous values first, e.g.
    * [[graft.operators.Quantiles.withQuantileBucket]]).
    *
    * `targetFiles` range-partitions the curve before writing (≈ table
    * bytes / 128 MB, like bucket counts); each file then holds one tight
    * curve segment and the per-file AND per-row-group stats stay narrow.
    * Measured pruning evidence: SCALE.md (Z-order matrix). */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      targetFiles: Int, bits: Int = 16,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    df.withColumn("_graft_z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(targetFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode(mode).parquet(path)
  }
}
