package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch relational query surface over the harness star schema.
  *
  * Each query is paired with ANSI SQL in [[graft.SparkEntry.oracleSql]] that
  * DuckDB runs on the same parquet files; the driver hash-compares results,
  * so determinism rules apply throughout:
  *
  *   - Money arithmetic is done in DECIMAL(18,2) (cast from the stored
  *     doubles) so sums are exact and order-independent — a double sum over
  *     600k rows would differ in the last bits between engines depending on
  *     reduction order.
  *   - Every computed column is aliased identically here and in the oracle
  *     SQL (the driver sorts columns by name before hashing).
  *   - No nondeterministic functions (current_timestamp etc.) in gated
  *     queries.
  */
object Relational {

  /** Cast a stored double money column to exact decimal before arithmetic. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary: the flagship scan+aggregate.
    * Single shuffle on (l_returnflag, l_linestatus) with map-side partial
    * aggregation; scan reads only the 7 referenced columns.
    */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
      |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
      |  sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
