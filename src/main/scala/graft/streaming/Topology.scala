package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.model.{GlobalConfig, TableConfig}

/** Config-driven assembly of the reference's whole application — the Spark
  * restatement of `…/dodetl/DODETL.scala:14-31` (load config, spawn the
  * dimension replicators, start the stream processor) and
  * `…/dodetl/imtu/InMemoryTableUpdaterManager.scala:28-41` (one updater
  * thread per metadata table → here one streaming query per table).
  *
  * For each non-operational [[TableConfig]]:
  *  - a [[DimensionMaintainer]] with a DURABLE snapshot under
  *    `<checkpointRoot>/<table>/snapshot` (restart restores it — the
  *    reference's topic re-dump rebuild);
  *  - its CDC stream attaches under `<checkpointRoot>/<table>/cdc`;
  *  - `filterColumn` set ⇒ ON-DEMAND replication: CDC rows apply only when
  *    their key is in the operational stream's [[ObservedKeySet]] (the
  *    DOD-ETL paper's core pruning idea — maintained state ∝ ACTIVE keys,
  *    which is what makes dimension replication viable at 100 TB).
  *
  * The operational stream then runs the buffered multi-dimension pipeline
  * ([[Pipeline.operationalQueryBufferedMulti]]): observed-key registration,
  * all-dimensions-present gating with a durable [[LateDataBuffer]], metric
  * columns, caller's sink.
  *
  * Streams are injected (`table → streaming DataFrame`), keeping the
  * topology source-agnostic: Kafka readers
  * ([[graft.sources.Sources.kafkaCdcTailReader]]) in production,
  * MemoryStream in tests — the plans are identical either way.
  */
final class Topology(
    spark: SparkSession,
    cfg: GlobalConfig,
    checkpointRoot: String,
    dimSchemas: Map[String, StructType]) {

  /** One maintainer per metadata table, durable under the checkpoint root. */
  val maintainers: Map[String, DimensionMaintainer] =
    cfg.metadata.map { t =>
      t.tableName -> new DimensionMaintainer(
        spark, t.tableName, t.keyColumns, t.ordColumn,
        dimSchemas(t.tableName),
        stateDir = Some(s"$checkpointRoot/${t.tableName}/snapshot"))
    }.toMap

  /** Observed operational keys (one registry, as in the reference manager).
    * Durability is per NON-EMPTY DELTA ([[DurableState.appendDelta]]): the
    * key-registration stream's checkpoint commits offsets per batch, and
    * every batch's newly observed keys are spilled before those offsets
    * commit — a crash can never permanently lose a key (whose CDC rows
    * would be on-demand-pruned forever). Per-batch write is ∝ the new keys,
    * usually zero on a warm stream. */
  val observedKeys: ObservedKeySet = {
    val opKey = cfg.operational.keyColumns.head
    // key TYPE comes from the dimension key the on-demand semi-join
    // compares against (hardcoding BIGINT would corrupt the durable key-set
    // state for string-keyed configs)
    val keyType = cfg.metadata.headOption
      .flatMap(t => dimSchemas.get(t.tableName)
        .map(sch => sch(t.keyColumns.head).dataType.sql))
      .getOrElse("BIGINT")
    new ObservedKeySet(
      spark, opKey, keyType,
      stateDir = Some(s"$checkpointRoot/_observed_keys"),
      spillEvery = 1)
  }

  /** Start one metadata table's CDC replication (on-demand when the config
    * declares a `filterColumn`). */
  def startDimension(t: TableConfig, cdc: DataFrame): StreamingQuery = {
    val m = maintainers(t.tableName)
    val ckpt = s"$checkpointRoot/${t.tableName}/cdc"
    t.filterColumn match {
      case Some(fc) => m.attachToOnDemand(cdc, ckpt, () => observedKeys.current, fc)
      case None => m.attachTo(cdc, ckpt)
    }
  }

  /** Start every configured dimension replication. */
  def startDimensions(cdcStreams: String => DataFrame): Map[String, StreamingQuery] =
    cfg.metadata.map(t => t.tableName -> startDimension(t, cdcStreams(t.tableName))).toMap

  /** Start observed-key registration off the operational stream (reference
    * `…/imtu/InMemoryTableUpdaterManager.scala:55-65`), with AUTOMATED
    * on-demand back-fill: when a batch observes keys for the first time,
    * every on-demand dimension with a `cdcSnapshots` source re-applies its
    * compacted-topic snapshot BOUNDED to those keys
    * ([[DimensionMaintainer.backfill]]) — the reference's re-dump-on-key-
    * set-growth (`…/dodetl/imtu/InMemoryTableUpdater.scala:66-70,106-127`)
    * without its full-topic rescan. Until this runs, events for a
    * late-observed key park in the late-data buffer; afterwards the next
    * operational batch drains them enriched.
    *
    * `cdcSnapshots`: per on-demand table, a BATCH read of the compacted CDC
    * topic ([[graft.sources.Sources.kafkaSnapshotReader]] in production, a
    * file/memory frame in tests). Tables without a source keep the manual
    * back-fill contract. */
  def startKeyRegistration(
      events: DataFrame,
      cdcSnapshots: Map[String, () => DataFrame] = Map.empty): StreamingQuery = {
    val opKey = cfg.operational.keyColumns.head
    val onDemandDims = cfg.metadata
      .filter(_.filterColumn.isDefined)
      .flatMap(t => cdcSnapshots.get(t.tableName).map(snap => (t.tableName, snap)))
    observedKeys.attachTo(
      events.select(opKey),
      s"$checkpointRoot/_observed_keys/ckpt",
      onNewKeys = (newKeys, id) => onDemandDims.foreach { case (table, snap) =>
        maintainers(table).backfill(snap(), newKeys, opKey, id)
      })
  }

  /** Start the operational pipeline: buffered multi-dimension enrichment +
    * metric columns + the caller's sink, with the config's watermark delay
    * and a durable late-data buffer. `dims` defaults to every configured
    * metadata table joined on (operational key = its first key column). */
  def startOperational(
      events: DataFrame, tsCol: String, eventSchema: StructType,
      metricCols: Seq[(String, org.apache.spark.sql.Column)],
      dims: Option[Seq[DimSpec]] = None)(
      writeBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val specs = dims.getOrElse(cfg.metadata.map { t =>
      DimSpec(
        t.tableName, () => maintainers(t.tableName).current,
        cfg.operational.keyColumns.head, t.keyColumns.head,
        dimSchemas(t.tableName).fieldNames.toSeq
          .diff(t.keyColumns :+ t.ordColumn))
    })
    val buffer = new LateDataBuffer(
      spark, eventSchema, stateDir = Some(s"$checkpointRoot/_late_buffer"))
    Pipeline.operationalQueryBufferedMulti(
        events, tsCol, specs, metricCols, buffer, cfg.watermarkDelay)(writeBatch)
      .option("checkpointLocation", s"$checkpointRoot/_operational")
      .start()
  }
}
