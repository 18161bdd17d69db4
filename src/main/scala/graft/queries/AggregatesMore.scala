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
}
