package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtensionCatalog, QueryCatalog}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * north-star extension ops (dedup / similarity / text / multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries ++ ExtensionCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryCatalog.oracleSql ++ ExtensionCatalog.oracleSql
}
