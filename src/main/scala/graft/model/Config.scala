package graft.model

import org.apache.spark.sql.SparkSession

/** Engine configuration (SURVEY S6/F5) — the reference's JSON config layer
  * (`…/dodetl/config/GlobalConfig.scala:3-28`,
  * `…/dodetl/config/TableConfig.scala:3-4`, loaded by
  * `…/dodetl/config/ConfigLoader.scala:11-32`), restated for the Spark
  * engine: per-table CDC/topic/key metadata plus engine-wide settings.
  */
final case class TableConfig(
    tableName: String,
    isOperational: Boolean,
    keyColumns: Seq[String],
    ordColumn: String,
    filterColumn: Option[String],
    topicName: Option[String],
    retentionDays: Option[Int])

final case class GlobalConfig(
    brokers: Option[String],
    jdbcUrl: Option[String],
    watermarkDelay: String,
    shufflePartitions: Int,
    tables: Seq[TableConfig]) {

  /** F5 — driver-side config predicates (reference `…/dodetl/DODETL.scala:23-24`). */
  def operational: TableConfig = tables.filter(_.isOperational).head
  def metadata: Seq[TableConfig] = tables.filterNot(_.isOperational)
}

object Config {

  /** Load a JSON config file. Uses Spark's JSON reader (multiLine) so the
    * engine needs no extra JSON dependency; runs at the driver, not in the
    * data plane. */
  def load(spark: SparkSession, path: String): GlobalConfig = {
    val df = spark.read.option("multiLine", "true").json(path)
    val row = df.head()
    def optStr(name: String): Option[String] =
      if (df.columns.contains(name) && !row.isNullAt(row.fieldIndex(name)))
        Some(row.getAs[String](name))
      else None
    val tables = row
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("tables")
      .map { t =>
        def tOptStr(name: String): Option[String] =
          if (t.schema.fieldNames.contains(name) && !t.isNullAt(t.fieldIndex(name)))
            Some(t.getAs[String](name))
          else None
        TableConfig(
          tableName = t.getAs[String]("tableName"),
          isOperational = t.getAs[Boolean]("isOperational"),
          keyColumns = t.getAs[scala.collection.Seq[String]]("keyColumns").toSeq,
          ordColumn = t.getAs[String]("ordColumn"),
          filterColumn = tOptStr("filterColumn"),
          topicName = tOptStr("topicName"),
          retentionDays =
            if (t.schema.fieldNames.contains("retentionDays") &&
              !t.isNullAt(t.fieldIndex("retentionDays")))
              Some(t.getAs[Long]("retentionDays").toInt)
            else None)
      }
      .toSeq
    GlobalConfig(
      brokers = optStr("brokers"),
      jdbcUrl = optStr("jdbcUrl"),
      watermarkDelay =
        optStr("watermarkDelay").getOrElse("10 minutes"),
      shufflePartitions =
        if (df.columns.contains("shufflePartitions") &&
          !row.isNullAt(row.fieldIndex("shufflePartitions")))
          row.getAs[Long]("shufflePartitions").toInt
        else 32,
      tables = tables)
  }
}
