package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function surface (SURVEY.md §2.5): date, string, math and
  * conditional functions in one oracle-gated projection over `orders` —
  * every function class the reference exercises plus the common analytics
  * set, verified value-exact against DuckDB.
  */
object ScalarQueries {

  def scalarFunctions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        // date
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
        // string
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        concat(col("o_orderstatus"), lit("/"), col("o_orderpriority")).as("status_prio"),
        lpad(col("o_orderkey").cast("string"), 10, "0").as("key_padded"),
        length(col("o_orderpriority")).cast("long").as("prio_len"),
        replace(col("o_orderpriority"), lit("-"), lit("_")).as("prio_snake"),
        // math (exact on integral/decimal operands)
        (col("o_orderkey") % 7).as("key_mod"),
        abs(col("o_orderkey") - 1000).as("key_dist"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        ceil(col("o_totalprice")).cast("long").as("price_ceil"),
        // round half-away-from-zero in exact decimal, emitted as BIGINT
        // (gate rule: never emit a decimal column — driver hash renders
        // decimals via float repr)
        round(col("o_totalprice").cast("decimal(18,2)"), 0).cast("long").as("price_round"),
        // conditional
        when(col("o_orderstatus") === "F", lit("finished"))
          .when(col("o_orderstatus") === "O", lit("open"))
          .otherwise(lit("partial")).as("status_word"),
        coalesce(nullif(col("o_orderstatus"), lit("F")), lit("X")).as("status_nn"))
      .orderBy(col("o_orderkey"))

  val scalarFunctionsSql: String =
    """SELECT o_orderkey,
      |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
      |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
      |  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS d,
      |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
      |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
      |  upper(o_orderpriority) AS prio_upper,
      |  substr(o_orderpriority, 1, 1) AS prio_code,
      |  o_orderstatus || '/' || o_orderpriority AS status_prio,
      |  lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded,
      |  CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
      |  replace(o_orderpriority, '-', '_') AS prio_snake,
      |  o_orderkey % 7 AS key_mod,
      |  abs(o_orderkey - 1000) AS key_dist,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 0) AS BIGINT) AS price_round,
      |  CASE o_orderstatus WHEN 'F' THEN 'finished'
      |                     WHEN 'O' THEN 'open'
      |                     ELSE 'partial' END AS status_word,
      |  coalesce(nullif(o_orderstatus, 'F'), 'X') AS status_nn
      |FROM orders
      |WHERE o_orderkey <= 2000
      |ORDER BY o_orderkey""".stripMargin
}
