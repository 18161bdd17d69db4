package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Third batch of relational shapes (TPC-H Q10/Q19/Q22 analogs): returned-
  * item revenue ranking, disjunctive join predicates (OR-of-ANDs, where the
  * per-side conjuncts must still push below the join), and a scalar-
  * subquery threshold with NOT EXISTS. Same oracle-parity rules as
  * [[Relational]] — money in DECIMAL, thresholds in exact arithmetic.
  */
object RelationalThird {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def revenue: Column =
    dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))

  /** Q10-analog: revenue lost to returned items per customer, top 20.
    * lineitem(filter R)⋈orders(filter year) shuffles on the orderkey;
    * nation broadcasts; the customer join shuffles on custkey (customer
    * grows with SF — not a broadcast candidate at scale).
    */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revenue.as("rev"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(col("rev")).cast("double").as("lost_revenue"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedItemsSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS lost_revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY lost_revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Q19-analog: disjunctive brand/size/quantity predicate — an OR of
    * conjunctions spanning both join sides. Catalyst extracts the
    * per-relation residuals (p_brand IN (...), l_quantity bounds) below
    * the join, so each scan still prunes; the full disjunction applies
    * after the (broadcast) join.
    */
  def q19DisjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)),
        col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .groupBy(col("p_brand"))
      .agg(sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  val q19DisjunctiveRevenueSql: String =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Q6-analog: the forecasting-revenue-change scan — single table, three
    * pushable predicates, one global aggregate. The entire query is a
    * parquet scan with PushedFilters + one partial/final agg pair; at any
    * scale it is I/O-bound by exactly the pruned column set.
    */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  val q6ForecastRevenueSql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Q7-analog: volume shipped between two specific nations per year —
    * the dual-role dimension pattern: `nation` joins TWICE under
    * different roles (supplier nation vs customer nation), both
    * broadcast; the disjunctive nation-pair predicate applies across the
    * roles after the joins. One big co-shuffle (lineitem ⋈ orders); the
    * rest broadcasts.
    */
  def q7NationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val supNation = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val custNation = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(spark, sfDir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supNation), col("s_nationkey") === col("s_nk"))
      .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_9" && col("cust_nation") === "NATION_10") ||
        (col("supp_nation") === "NATION_10" && col("cust_nation") === "NATION_9"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7NationVolumeSql: String =
    """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      |  CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ns ON s_nationkey = ns.n_nationkey
      |JOIN nation nc ON c_nationkey = nc.n_nationkey
      |WHERE (ns.n_name = 'NATION_9' AND nc.n_name = 'NATION_10')
      |   OR (ns.n_name = 'NATION_10' AND nc.n_name = 'NATION_9')
      |GROUP BY ns.n_name, nc.n_name, EXTRACT(YEAR FROM l_shipdate)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q22-analog: market segments of well-funded customers who never
    * ordered — scalar-subquery threshold (kept in exact decimal×count
    * arithmetic so both engines compare identically) plus an anti join.
    */
  def q22IdleBalances(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val thresh = cust.filter(dec(col("c_acctbal")) > 0)
      .agg(sum(dec(col("c_acctbal"))).cast("decimal(38,2)").as("total"),
        count(lit(1)).as("n"))
    cust
      .crossJoin(broadcast(thresh))
      // c_acctbal > avg  ⇔  c_acctbal · n > total, all in exact decimal
      .filter(dec(col("c_acctbal")) * col("n") > col("total"))
      // anti side restricted to URGENT orders: every customer in the
      // synthetic data has SOME order, so the TPC-H "no orders at all"
      // predicate would gate zero rows — this keeps the identical plan
      // shape (broadcast scalar threshold + left anti) non-vacuous
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q17-analog: small-quantity lines — lines below 20% of their part's
    * average quantity, summed per brand. The per-part average stays in
    * exact arithmetic until one final double division of identical
    * operands (sums of integral quantities are exact doubles), so both
    * engines compare against the bit-identical threshold.
    *
    * The per-part stats are a whole-partition WINDOW over l_partkey rather
    * than a groupBy + self-join: ONE shuffle of lineitem and a single scan,
    * instead of two scans and two exchanges — the window's frame sum of
    * integral quantities is the same exact, order-independent value as the
    * aggregate's. Part broadcasts.
    */
  def q17SmallQuantity(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPart = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumn("sq", sum(col("l_quantity")).over(byPart))
      .withColumn("cq", count(lit(1)).over(byPart))
      .filter(col("l_quantity") < lit(0.2) * col("sq") / col("cq"))
      .join(broadcast(Tables.part(spark, sfDir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double")
        .as("small_qty_price"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  val q17SmallQuantitySql: String =
    """WITH stats AS (
      |  SELECT l_partkey AS s_partkey, sum(l_quantity) AS sq, count(*) AS cq
      |  FROM lineitem GROUP BY 1)
      |SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS small_qty_price,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN stats ON l_partkey = s_partkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_quantity < CAST(0.2 AS DOUBLE) * sq / cq
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  val q22IdleBalancesSql: String =
    """SELECT c_mktsegment, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE CAST(c_acctbal AS DECIMAL(18,2))
      |      * (SELECT count(*) FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
      |    > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2))
      |       FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin
}
