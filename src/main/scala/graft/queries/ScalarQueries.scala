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

  /** Second scalar battery: array construction/manipulation, regex,
    * date arithmetic, bit operations and numeric edge functions — the
    * rest of the everyday scalar surface, value-exact against DuckDB.
    * Array-valued results are emitted as joined strings (the engines'
    * arrow list types differ only in inner field NAME, which would trip
    * schema compares; the elements are identical). dayofweek bridges the
    * engines' conventions explicitly (Spark 1=Sunday vs DuckDB dow
    * 0=Sunday).
    */
  def scalarFunctionsArray(spark: SparkSession, sfDir: String): DataFrame =
    // orderedBelow: the battery's split/transform/regex columns must not
    // re-run inside a range sample (r12 double-evaluation class); the
    // o_orderkey<=2000 predicate pushes to the scan below it either way.
    QueryShapes.orderedBelow(
        Tables.orders(spark, sfDir).filter(col("o_orderkey") <= 2000),
        col("o_orderkey"))
      .select(
        col("o_orderkey"),
        // date arithmetic
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd")
          .as("plus_30d"),
        date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd")
          .as("plus_2m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
          .as("month_end"),
        date_format(trunc(col("o_orderdate"), "month"), "yyyy-MM-dd")
          .as("month_start"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate"))
          .cast("long").as("days_to_eoy98"),
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow_sun0"),
        // arrays
        array_join(split(col("o_orderpriority"), "-"), "|").as("prio_parts"),
        element_at(split(col("o_orderpriority"), "-"), 1).as("prio_first"),
        size(split(col("o_orderpriority"), "-")).cast("long")
          .as("prio_n_parts"),
        array_contains(split(col("o_orderpriority"), "-"), "URGENT")
          .as("has_urgent"),
        array_join(sort_array(split(col("o_orderpriority"), "-")), "|")
          .as("prio_sorted"),
        array_join(reverse(split(col("o_orderpriority"), "-")), "|")
          .as("prio_reversed"),
        array_join(slice(split(col("o_orderpriority"), "-"), 1, 1), "|")
          .as("prio_head"),
        array_join(transform(sequence(lit(1),
          (col("o_orderkey") % 3 + 1).cast("int")),
          x => x.cast("string")), ",").as("seq_csv"),
        // regex + string
        regexp_extract(col("o_orderpriority"), "^(\\d+)", 1).as("prio_num"),
        regexp_replace(col("o_orderpriority"), "[0-9]", "#").as("prio_masked"),
        translate(col("o_orderpriority"), "-", "_").as("prio_translated"),
        repeat(col("o_orderstatus"), 3).as("status_x3"),
        reverse(col("o_orderstatus")).as("status_rev"),
        instr(col("o_orderpriority"), "-").cast("long").as("dash_pos"),
        // bit + numeric
        (col("o_orderkey").bitwiseAND(255)).as("key_and"),
        (col("o_orderkey").bitwiseXOR(lit(170L))).as("key_xor"),
        shiftleft(col("o_orderkey") % 16, 3).cast("long").as("key_shl"),
        signum(col("o_orderkey") - 1000).cast("long").as("key_sign"),
        greatest(col("o_orderkey") % 7, col("o_orderkey") % 11,
          col("o_orderkey") % 13).as("key_greatest"),
        pow(lit(2), col("o_orderkey") % 10).cast("long").as("key_pow2"))

  val scalarFunctionsArraySql: String =
    """SELECT o_orderkey,
      |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d,
      |  strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE),
      |    '%Y-%m-%d') AS plus_2m,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
      |    AS month_end,
      |  strftime(CAST(date_trunc('month', CAST(o_orderdate AS DATE))
      |    AS DATE), '%Y-%m-%d') AS month_start,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
      |    AS BIGINT) AS days_to_eoy98,
      |  CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow_sun0,
      |  array_to_string(str_split(o_orderpriority, '-'), '|') AS prio_parts,
      |  str_split(o_orderpriority, '-')[1] AS prio_first,
      |  CAST(len(str_split(o_orderpriority, '-')) AS BIGINT)
      |    AS prio_n_parts,
      |  list_contains(str_split(o_orderpriority, '-'), 'URGENT')
      |    AS has_urgent,
      |  array_to_string(list_sort(str_split(o_orderpriority, '-')), '|')
      |    AS prio_sorted,
      |  array_to_string(list_reverse(str_split(o_orderpriority, '-')), '|')
      |    AS prio_reversed,
      |  array_to_string(str_split(o_orderpriority, '-')[1:1], '|')
      |    AS prio_head,
      |  array_to_string(list_transform(range(1, o_orderkey % 3 + 2),
      |    x -> x::VARCHAR), ',') AS seq_csv,
      |  regexp_extract(o_orderpriority, '^(\d+)', 1) AS prio_num,
      |  regexp_replace(o_orderpriority, '[0-9]', '#', 'g') AS prio_masked,
      |  translate(o_orderpriority, '-', '_') AS prio_translated,
      |  repeat(o_orderstatus, 3) AS status_x3,
      |  reverse(o_orderstatus) AS status_rev,
      |  CAST(instr(o_orderpriority, '-') AS BIGINT) AS dash_pos,
      |  o_orderkey & 255 AS key_and,
      |  xor(o_orderkey, 170) AS key_xor,
      |  CAST((o_orderkey % 16) << 3 AS BIGINT) AS key_shl,
      |  CAST(sign(o_orderkey - 1000) AS BIGINT) AS key_sign,
      |  greatest(o_orderkey % 7, o_orderkey % 11, o_orderkey % 13)
      |    AS key_greatest,
      |  CAST(power(2, o_orderkey % 10) AS BIGINT) AS key_pow2
      |FROM orders
      |WHERE o_orderkey <= 2000
      |ORDER BY o_orderkey""".stripMargin
}
