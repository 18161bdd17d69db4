package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining exact-aggregate surface: argmin/argmax (min_by/max_by),
  * boolean and bitwise aggregates, and wide→long reshaping (unpivot — the
  * inverse of the pivot exercised by events_pivot_per_user). All integer/
  * boolean-exact, so the oracle comparison is bit-for-bit.
  */
object AggregatesMore {

  /** Per market segment: the customer holding the max/min balance
    * (argmax/argmin — one pass, no self-join or window), whether every/any
    * balance is positive, and bit-AND/OR folds over the key space.
    */
  def aggExtrema(spark: SparkSession, sfDir: String): DataFrame = {
    // Deterministic argmax ordering key: (balance, custkey) folded into one
    // exact BIGINT (cents × 10M + key) — a struct tiebreak isn't portable
    // to the oracle's arg_max, an integer encoding is.
    val ordKey = (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long") *
      10000000L + col("c_custkey")
    Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(
        max_by(col("c_custkey"), ordKey).as("richest_cust"),
        min_by(col("c_custkey"), ordKey).as("poorest_cust"),
        every(col("c_acctbal") > 0).as("all_positive"),
        some(col("c_acctbal") > 9000).as("any_very_rich"),
        bit_and(col("c_custkey")).as("key_bit_and"),
        bit_or(col("c_custkey")).as("key_bit_or"))
      .orderBy(col("c_mktsegment"))
  }

  val aggExtremaSql: String =
    """WITH keyed AS (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000
      |      + c_custkey AS ord_key
      |  FROM customer)
      |SELECT c_mktsegment,
      |  arg_max(c_custkey, ord_key) AS richest_cust,
      |  arg_min(c_custkey, ord_key) AS poorest_cust,
      |  bool_and(c_acctbal > 0) AS all_positive,
      |  bool_or(c_acctbal > 9000) AS any_very_rich,
      |  bit_and(c_custkey) AS key_bit_and,
      |  bit_or(c_custkey) AS key_bit_or
      |FROM keyed
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Wide→long reshape: unpivot the per-line charge components into
    * (measure, amount) rows and re-aggregate — the melt that feeds a
    * metrics store. Unpivot is a zero-shuffle map-side expansion; the only
    * exchange is the final groupBy.
    */
  def unpivotCharges(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        col("l_discount").cast("decimal(18,2)").as("discount"),
        col("l_tax").cast("decimal(18,2)").as("tax"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("price"), col("discount"), col("tax")),
        "measure", "amount")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(sum(col("amount")).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("measure"))

  val unpivotChargesSql: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |    CAST(l_discount AS DECIMAL(18,2)) AS discount,
      |    CAST(l_tax AS DECIMAL(18,2)) AS tax
      |  FROM lineitem),
      |long AS (
      |  SELECT l_returnflag, measure, amount
      |  FROM wide UNPIVOT (amount FOR measure IN (price, discount, tax)))
      |SELECT l_returnflag, measure,
      |  CAST(sum(amount) AS DOUBLE) AS total, count(*) AS n
      |FROM long
      |GROUP BY l_returnflag, measure
      |ORDER BY l_returnflag, measure""".stripMargin

  // ------------------------------------------------ null semantics battery

  /** Null-propagation semantics in one projection: null-safe equality
    * (`<=>` ≙ IS NOT DISTINCT FROM), nvl/nvl2 chains, nullif round-trips,
    * null ordering inside scalar conditionals, and null-tolerant
    * aggregates (count vs count(col) vs count distinct on a nullable
    * derivation) — the semantics corner every SQL port gets subtly
    * wrong, pinned value-exact cross-engine. The nullable column is
    * derived deterministically (`nullif(status,'F')`) so both engines
    * see identical null positions.
    */
  def nullSemanticsBattery(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        nullif(col("o_orderstatus"), lit("F")).as("maybe"))
    o.select(
      col("o_orderkey"),
      (col("maybe") <=> lit("O")).as("nullsafe_eq_o"),
      (col("maybe") <=> lit(null).cast("string")).as("nullsafe_eq_null"),
      (col("maybe") === lit("O")).as("plain_eq_o"), // null where maybe null
      coalesce(col("maybe"), lit("fallback")).as("nvl_value"),
      when(col("maybe").isNull, "was_null").otherwise("had_value")
        .as("nvl2_branch"),
      isnull(col("maybe")).as("is_null_flag"),
      nullif(coalesce(col("maybe"), lit("F")), lit("F")).as("roundtrip"))
      .filter(col("o_orderkey") <= 2000)
      .orderBy(col("o_orderkey"))
  }

  val nullSemanticsBatterySql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    nullif(o_orderstatus, 'F') AS maybe
      |  FROM orders)
      |SELECT o_orderkey,
      |  maybe IS NOT DISTINCT FROM 'O' AS nullsafe_eq_o,
      |  maybe IS NOT DISTINCT FROM CAST(NULL AS VARCHAR)
      |    AS nullsafe_eq_null,
      |  maybe = 'O' AS plain_eq_o,
      |  coalesce(maybe, 'fallback') AS nvl_value,
      |  CASE WHEN maybe IS NULL THEN 'was_null' ELSE 'had_value' END
      |    AS nvl2_branch,
      |  maybe IS NULL AS is_null_flag,
      |  nullif(coalesce(maybe, 'F'), 'F') AS roundtrip
      |FROM o
      |WHERE o_orderkey <= 2000
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------ union-by-name drift

  /** Schema-drift-tolerant ingestion: two projections of the same table
    * with different column ORDER and one side missing a column are
    * merged with `unionByName(allowMissingColumns)` — the append-only
    * ingest pattern when a feed adds fields mid-stream. The missing
    * column nulls in, the aggregate counts both sides — DuckDB's
    * `UNION ALL BY NAME` replays it exactly.
    */
  def unionByNameDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val v1 = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderstatus"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val v2 = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus")) // no cents: drifted
    v1.unionByName(v2.withColumn("cents", lit(null).cast("long")),
        allowMissingColumns = true)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("cents")).as("n_with_cents"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("o_orderstatus"))
  }

  val unionByNameDriftSql: String =
    """WITH merged AS (
      |  SELECT o_orderstatus, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL BY NAME
      |  SELECT o_orderkey, o_orderstatus, CAST(NULL AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(cents) AS BIGINT) AS n_with_cents,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM merged
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------ string distance matrix

  /** Pairwise edit-distance matrix over the (bounded, 5-value) order
    * priority domain — the fuzzy-matching primitive (`levenshtein`)
    * value-pinned cross-engine, with both lengths alongside (the length
    * difference lower-bounds the distance — the cheap pre-filter real
    * fuzzy joins use). The pairing is DISTINCT values × DISTINCT values
    * (25 rows) after aggregation — a bounded-domain broadcast nested
    * loop, never a row-level cross join.
    */
  def stringDistanceMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val vals = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("s")).distinct()
    vals.toDF("s_a").crossJoin(broadcast(vals.toDF("s_b")))
      .filter(col("s_a") < col("s_b"))
      .select(col("s_a"), col("s_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long").as("edit_dist"),
        length(col("s_a")).cast("long").as("len_a"),
        length(col("s_b")).cast("long").as("len_b"))
      .orderBy(col("s_a"), col("s_b"))
  }

  val stringDistanceMatrixSql: String =
    """WITH v AS (SELECT DISTINCT o_orderpriority AS s FROM orders)
      |SELECT a.s AS s_a, b.s AS s_b,
      |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS edit_dist,
      |  CAST(length(a.s) AS BIGINT) AS len_a,
      |  CAST(length(b.s) AS BIGINT) AS len_b
      |FROM v a JOIN v b ON a.s < b.s
      |ORDER BY s_a, s_b""".stripMargin
}
