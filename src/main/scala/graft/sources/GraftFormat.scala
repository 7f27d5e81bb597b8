package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{
  BaseRelation, DataSourceRegister, RelationProvider}

/** The `graft` DataSource short name — the SQL-surface front door of the
  * self-describing table format: once a directory carries a
  * `_graft_manifest/` sidecar ([[GraftTable.write]]/[[GraftTable.adopt]]/
  * [[GraftTable.publishLive]]),
  *
  * {{{
  *   spark.read.format("graft").load(dir)
  *   CREATE TEMPORARY VIEW t USING graft OPTIONS (path '<dir>')
  * }}}
  *
  * both serve the transparently-pruned, metadata-aggregate-serving frame
  * [[Sources.graftTable]] returns — no Scala API needed, which is what a
  * SQL-only user of a lake format actually touches. Registered via the
  * standard `META-INF/services/org.apache.spark.sql.sources
  * .DataSourceRegister` file; freshness is gated at every open
  * ([[GraftTable.openRelation]]'s fail-loud contract). */
class GraftFormat extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft datasource: 'path' option is required"))
    GraftTable.openRelation(sqlContext.sparkSession, path)
  }
}
