package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Second batch of relational shapes (TPC-H Q4/Q12/Q14/Q18/Q2 analogs over
  * the harness schema): EXISTS-against-filtered-child, CASE-inside-
  * aggregate, ratio-of-sums, HAVING + IN-subquery, and min-per-group
  * correlated lookup. Same oracle rules as [[Relational]].
  */
object RelationalMore {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Q4-analog: orders (by priority) having at least one line shipped
    * after the order date — EXISTS with a correlated predicate; Catalyst
    * plans a left-semi join on the filtered child.
    */
  def q4PriorityCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val late = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    ord.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4PriorityCheckSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q12-analog: CASE inside aggregates — per linestatus, how many lines
    * belong to high- vs low-priority orders.
    */
  def q12PriorityClasses(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))

  val q12PriorityClassesSql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** Q14-analog: promo revenue share. The ratio divides two exact decimal
    * sums AFTER converting to double (decimal→double is IEEE-deterministic
    * in both engines), rounded to 6 decimals.
    */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val revenue = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0).cast("decimal(18,2)")))
          .as("__promo_dec"),
        sum(revenue).as("__total_dec"))
      .select(col("l_returnflag"),
        col("__promo_dec").cast("double").as("promo_revenue"),
        col("__total_dec").cast("double").as("total_revenue"),
        round(col("__promo_dec").cast("double") / col("__total_dec").cast("double"), 6)
          .as("promo_share"))
      .orderBy(col("l_returnflag"))
  }

  val q14PromoShareSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN p_type = 'PROMO'
      |           THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
      |  round(CAST(sum(CASE WHEN p_type = 'PROMO'
      |           THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |        / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Q18-analog: large-volume orders — HAVING on a grouped child feeding an
    * IN-style join back to orders+customer.
    */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("__qty_dec"))
      .filter(col("__qty_dec") > 150)
    Tables.orders(spark, sfDir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, sfDir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_totalprice"),
        col("__qty_dec").cast("double").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18LargeOrdersSql: String =
    """SELECT c_name, o_orderkey, o_totalprice, total_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150) b
      |  ON o_orderkey = b.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** Q2-analog: min-per-group correlated lookup — the cheapest part within
    * each (p_type, p_size) group, via a rank-1 window (equivalent to the
    * correlated MIN subquery, one shuffle instead of a self-join).
    */
  def q2CheapestPart(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("p_type"), col("p_size"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
    Tables.part(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_type"), col("p_size"), col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_type"), col("p_size"))
  }

  val q2CheapestPartSql: String =
    """SELECT p_type, p_size, p_partkey, p_retailprice FROM (
      |  SELECT p_type, p_size, p_partkey, p_retailprice,
      |    row_number() OVER (PARTITION BY p_type, p_size
      |                       ORDER BY p_retailprice, p_partkey) AS rn
      |  FROM part)
      |WHERE rn = 1
      |ORDER BY p_type, p_size""".stripMargin
}
