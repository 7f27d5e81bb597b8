package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source operators (SURVEY §2.1).
  *
  * S1-S3 (Kafka) are expressed as reader builders: the sandbox ships no Kafka
  * broker or spark-sql-kafka module, so these return the configured reader
  * plans the production deployment would `.load()`. Everything else (JDBC,
  * JSON config, parquet, file streams) is live and exercised by tests.
  */
object Sources {

  /** S1 — unbounded operational stream: Kafka topic of JSON string values
    * (reference `…/dodetl/stp/BeamStreamProcessor.scala:43-50`). Returns the
    * configured reader; `.load().selectExpr("CAST(value AS STRING) AS value")`
    * then [[graft.streaming.Pipeline.parseJsonEvents]] yields typed rows. */
  def kafkaStreamReader(
      spark: SparkSession, brokers: String, topic: String) =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")

  /** S2 — bounded CDC snapshot: batch read of a Kafka topic from earliest to
    * the end offsets at planning time (reference seek-to-beginning +
    * read-to-endOffsets, `…/dodetl/imtu/InMemoryTableUpdater.scala:106-127`). */
  def kafkaSnapshotReader(
      spark: SparkSession, brokers: String, topic: String) =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")

  /** S3 — incremental CDC tail: the same topic as an unbounded stream
    * feeding [[graft.streaming.DimensionMaintainer.attachTo]]. */
  def kafkaCdcTailReader(
      spark: SparkSession, brokers: String, topic: String) =
    kafkaStreamReader(spark, brokers, topic)

  /** File-based streaming source — the sandbox-testable unbounded source
    * (drop parquet/csv files into `dir`; each file becomes a micro-batch).
    * Used by streaming tests alongside MemoryStream. */
  def fileStream(
      spark: SparkSession, dir: String, format: String, schemaDdl: String): DataFrame =
    spark.readStream
      .format(format)
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
      .load(dir)

  /** S5 — JDBC table scan (reference `memTable=false` mode reading MySQL
    * directly, `…/dodetl/imtu/DatabaseManager.scala:22-28,38-42`).
    * `predicates`/partitioning options go through `props` (e.g.
    * `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions` for a
    * parallel scan — at scale a single-connection scan is a non-starter). */
  def jdbcTable(
      spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, p)
  }

  /** Columnar interchange beyond parquet: ORC read (Spark-native reader —
    * the orc-core jars ship in every Spark distribution, so a lake that
    * standardized on ORC plugs in with predicate pushdown and column
    * pruning intact; IoSpec pins a parquet == ORC content round-trip). */
  def orcTable(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-explicit CSV scan (interchange ingest): header + declared DDL
    * schema, no inference pass — at 100 TB an inference pre-scan of every
    * file is an extra full read, so the schema is part of the contract. */
  def csvTable(
      spark: SparkSession, path: String, schemaDdl: String,
      header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
      .csv(path)

  /** Manifest-driven pruned parquet scan — see [[PrunedScan.prunedParquet]]
    * (the q88/q91/q97 statistics consulted in the read path; only
    * surviving `file_id=` dirs are listed into the reader). This
    * forwarder keeps the source surface in one place. */
  def prunedParquet(
      spark: SparkSession, dir: String,
      manifest: DataFrame, probes: Seq[FileProbe],
      blooms: Map[String, BloomSidecar] = Map.empty): DataFrame =
    PrunedScan.prunedParquet(spark, dir, manifest, probes, blooms)

  /** Open a SELF-DESCRIBING graft table from its path alone — the
    * persisted `_graft_manifest/` sidecar ([[GraftTable]]) reconstructs
    * the transparently-pruned frame in any session: plain `.where(...)`
    * / `spark.sql` over it prunes files with zero handed-over state.
    * Fails loudly when the sidecar is missing or stale. */
  def graftTable(spark: SparkSession, dir: String): DataFrame =
    GraftTable.open(spark, dir)

  /** S6 — JSON config source (driver-side, not data-plane): parse a config
    * file into [[graft.model.GlobalConfig]] via Spark's own JSON reader so no
    * extra JSON dependency is needed. See [[graft.model.Config.load]]. */
  def configJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
}
