package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{EtlParity, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 + extension surface) to
  * DataFrame builders over a scale-factor directory; `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's hash compare. Column names/aliases
  * MUST match between the two — the compare sorts columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "etl_enrich_sessions" -> (EtlParity.enrichSessions _),
    "etl_events_json_extract" -> (EtlParity.eventsJsonExtract _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.q1PricingSummarySql,
    "etl_enrich_sessions" -> EtlParity.enrichSessionsSql,
    "etl_events_json_extract" -> EtlParity.eventsJsonExtractSql
  )
}
