package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query (SURVEY.md §2 inventory)
  * with its DuckDB oracle SQL. Query registries live in graft.queries.*;
  * each entry documents the reference citation it re-expresses.
  */
object SparkEntry {

  /** All registered queries, name → Q(fn, oracle, doc). */
  def registry: Map[String, Q] =
    CoreQueries.all ++ PipelineQueries.all ++ EndToEndQueries.all ++
      ExtendedQueries.all ++ CurationQueries.all ++ QualityQueries.all ++
      TpchQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("a1_monthly_pnl").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql), _)) => k -> sql }
}
