package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real surface lives in [[Queries]] / [[QueriesExt]]; this object only
  * adapts it to the driver's shape. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the OEE-analog metric pipeline
    * (scan → join → conditional metric math), the reference's hot path in
    * batch form. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("q06_oee")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.byName

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Keys absent here are non-SQL-expressible ops
    * (xxhash64-based LSH/SimHash/fingerprints) → rows-only check. */
  def oracleSql: Map[String, String] = Queries.oracles

  /** Queries that are rows-only BY DESIGN — not missing oracles, but
    * measurements whose value IS the approximation being audited, where a
    * SQL replay is impossible or tautological. Every declared query is
    * either in [[oracleSql]] or here; nothing is unaccounted.
    *
    * - `s21_pca_recall`: recall@10 of 16-d PCA retrieval. The eigensolve
    *   has no SQL form, and the MEASURED sub-unit recall on near-isotropic
    *   data is the audit's answer. Its hash-checkable invariant lives in
    *   `s21b_pca_fullrank_recall` (full-rank PCA is an isometry ⇒ recall
    *   ≡ 1 exactly — any orthogonality bug in the eigensolve breaks the
    *   hash). */
  def rowsOnlyByDesign: Set[String] = Set("s21_pca_recall")
}
