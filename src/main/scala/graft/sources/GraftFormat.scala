package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister,
  RelationProvider}

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
class GraftFormat extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft datasource: 'path' option is required"))
    GraftTable.openRelation(sqlContext.sparkSession, path)
  }

  /** The WRITE path — `df.write.format("graft").option("orderBy",
    * "c1,c2").save(dir)` runs [[GraftTable.write]] (assignedWrite layout
    * + persisted sidecars). Options:
    *  - `orderBy` (required): comma-separated TIE-FREE total order (the
    *    assignedWrite contract — append a unique id column);
    *  - `nFiles` (default 32), `stats` (default = orderBy columns),
    *    `blooms` (`col:mBits:k`, comma-separated).
    * Modes: Overwrite rewrites table + sidecars; ErrorIfExists requires
    * a table-free dir. Append/Ignore are REFUSED — an append would
    * silently break the rank-slice layout and every persisted stat
    * (re-write, or adopt after an out-of-band append). */
  override def createRelation(
      sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft datasource: 'path' option is required"))
    val orderBy = parameters.getOrElse("orderBy",
      throw new IllegalArgumentException(
        "graft datasource write: 'orderBy' option is required " +
          "(comma-separated tie-free total order)"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(orderBy.nonEmpty, "graft datasource write: empty orderBy")
    val nFiles = parameters.getOrElse("nFiles", "32").toInt
    val stats = parameters.get("stats")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(orderBy)
    val blooms = parameters.get("blooms").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
      .map { s =>
        s.split(":") match {
          case Array(c, m, k) => (c, m.toInt, k.toInt)
          case _ => throw new IllegalArgumentException(
            s"graft datasource write: bloom spec '$s' is not col:mBits:k")
        }
      }
    mode match {
      case SaveMode.Overwrite => ()
      case SaveMode.ErrorIfExists =>
        if (GraftTable.isGraftTable(spark, path))
          throw new IllegalStateException(
            s"graft datasource write: $path already holds a graft table " +
              "(mode ErrorIfExists)")
      case other => throw new UnsupportedOperationException(
        s"graft datasource write: mode $other would break the rank-slice " +
          "layout and its persisted statistics — use Overwrite, or adopt " +
          "after an out-of-band append")
    }
    GraftTable.write(spark, data, orderBy.map(col), nFiles, path, stats,
      bloomCols = blooms)
    GraftTable.openRelation(spark, path)
  }
}
