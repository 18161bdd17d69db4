package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality audit: the constraint-checking pass a pipeline runs
  * before trusting a new drop — referential integrity (FK orphans as
  * anti joins), key uniqueness, domain ranges, and cross-table temporal
  * sanity, emitted as one (check_name, n_violations, n_checked) report.
  *
  * Scale shape: every check is an independent aggregate/anti-join over
  * one scan of its table(s) — Spark runs the union's branches as
  * separate stages (a no-op union, no shuffle of its own), dimensions
  * broadcast in the FK probes, and each branch's output is ONE row.
  */
object QualityAudit {

  def dataQualityReport(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)

    def check(name: String, violations: DataFrame, checked: Long): DataFrame =
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"),
          lit(checked).as("n_checked"))

    val nOrders = orders.count()
    val nLines = lineitem.count()

    val fkOrdersCustomer = check("fk_orders_customer",
      orders.join(broadcast(customer.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti"), nOrders)
    val fkLineitemOrders = check("fk_lineitem_orders",
      lineitem.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti"), nLines)
    val pkOrdersUnique = check("pk_orders_unique",
      orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1), nOrders)
    val domainQuantity = check("domain_quantity_positive",
      lineitem.filter(col("l_quantity") <= 0), nLines)
    val domainDiscount = check("domain_discount_unit_interval",
      lineitem.filter(col("l_discount") < 0 || col("l_discount") > 1), nLines)
    val temporalShipAfterOrder = check("temporal_ship_after_order",
      lineitem.join(orders.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") < col("o_orderdate")), nLines)

    fkOrdersCustomer
      .unionByName(fkLineitemOrders)
      .unionByName(pkOrdersUnique)
      .unionByName(domainQuantity)
      .unionByName(domainDiscount)
      .unionByName(temporalShipAfterOrder)
      .orderBy(col("check_name"))
  }

  /** Exact interpolated percentile bands (p10/p50/p90) of order totals
    * per priority, long-form. Spark `percentile` and DuckDB
    * `quantile_cont` interpolate between the SAME two order statistics
    * with the same weights, so the doubles agree exactly (the pattern
    * proven on corpus_stats' median). One shuffle; percentiles sort
    * within each group only.
    */
  def percentileBands(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val bands = Seq(("p10", 0.1), ("p50", 0.5), ("p90", 0.9))
    bands.map { case (name, p) =>
      orders.groupBy(col("o_orderpriority"))
        .agg(expr(s"percentile(o_totalprice, cast($p as double))").as("band_value"),
          count(lit(1)).as("n_orders"))
        .select(col("o_orderpriority"), lit(name).as("band"),
          col("band_value"), col("n_orders"))
    }.reduce(_ unionByName _)
      .orderBy(col("o_orderpriority"), col("band"))
  }

  val percentileBandsSql: String =
    """SELECT o_orderpriority, band, band_value, n_orders FROM (
      |  SELECT o_orderpriority, 'p10' AS band,
      |    quantile_cont(o_totalprice, 0.1) AS band_value,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY o_orderpriority
      |  UNION ALL
      |  SELECT o_orderpriority, 'p50', quantile_cont(o_totalprice, 0.5),
      |    count(*)
      |  FROM orders GROUP BY o_orderpriority
      |  UNION ALL
      |  SELECT o_orderpriority, 'p90', quantile_cont(o_totalprice, 0.9),
      |    count(*)
      |  FROM orders GROUP BY o_orderpriority)
      |ORDER BY o_orderpriority, band""".stripMargin

  /** NOT IN vs NOT EXISTS under NULLs — the classic three-valued-logic
    * trap, pinned as a gated result. The probe list is customer keys
    * with an injected NULL: `NOT IN` must then return ZERO rows (x <>
    * NULL is UNKNOWN for every x — Spark plans a null-aware anti join),
    * while `NOT EXISTS` ignores the NULL row and returns the true
    * orphan count. Emitting both counts locks the engines' agreement on
    * the semantics, not just the plan.
    */
  def nullSemanticsAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val probe = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("k"))
      .unionByName(
        Tables.customer(spark, sfDir).limit(1)
          .select(lit(null).cast("long").as("k")))
    // NOT IN decomposed the way engines implement the null-aware anti
    // join at scale: an EQUI anti join on the non-null keys plus a
    // broadcast has-null flag that empties the result when the probe
    // list contains a NULL (x <> NULL is UNKNOWN for every x). A literal
    // disjunctive anti-join condition would plan as a nested loop over
    // |fact|x|probe| — measured 10x this formulation at sf0.1.
    val hasNull = probe.agg(
      max(when(col("k").isNull, 1).otherwise(0)).as("has_null"))
    val notExists = orders
      .join(probe.filter(col("k").isNotNull),
        col("o_custkey") === col("k"), "left_anti")
    val notIn = notExists
      .crossJoin(broadcast(hasNull))
      .filter(col("has_null") === 0)
    notIn.agg(count(lit(1)).as("n_not_in"))
      .crossJoin(notExists.agg(count(lit(1)).as("n_not_exists")))
  }

  val nullSemanticsAntiJoinSql: String =
    """WITH probe AS (
      |  SELECT c_custkey AS k FROM customer WHERE c_custkey % 2 = 0
      |  UNION ALL
      |  SELECT CAST(NULL AS BIGINT))
      |SELECT
      |  (SELECT count(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT k FROM probe)) AS n_not_in,
      |  (SELECT count(*) FROM orders
      |   WHERE NOT EXISTS (SELECT 1 FROM probe
      |                     WHERE k = o_custkey)) AS n_not_exists""".stripMargin

  val dataQualityReportSql: String =
    """SELECT 'fk_orders_customer' AS check_name,
      |  (SELECT count(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      |    AS n_violations,
      |  (SELECT count(*) FROM orders) AS n_checked
      |UNION ALL
      |SELECT 'fk_lineitem_orders',
      |  (SELECT count(*) FROM lineitem
      |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
      |  (SELECT count(*) FROM lineitem)
      |UNION ALL
      |SELECT 'pk_orders_unique',
      |  (SELECT count(*) FROM
      |    (SELECT o_orderkey FROM orders GROUP BY o_orderkey
      |     HAVING count(*) > 1)),
      |  (SELECT count(*) FROM orders)
      |UNION ALL
      |SELECT 'domain_quantity_positive',
      |  (SELECT count(*) FROM lineitem WHERE l_quantity <= 0),
      |  (SELECT count(*) FROM lineitem)
      |UNION ALL
      |SELECT 'domain_discount_unit_interval',
      |  (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1),
      |  (SELECT count(*) FROM lineitem)
      |UNION ALL
      |SELECT 'temporal_ship_after_order',
      |  (SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |   WHERE l_shipdate < o_orderdate),
      |  (SELECT count(*) FROM lineitem)
      |ORDER BY check_name""".stripMargin

  /** Snapshot drift report (data observability): compare two snapshot
    * windows of the event stream (days 1–15 vs 16–30) per event_type —
    * volumes, distinct users, exact cent sums, and the volume delta in
    * ppm of the baseline. One scan, conditional aggregation per side
    * (never two scans or a self-join); all drift arithmetic in integers
    * so the report is engine-exact. The alerting threshold (|delta| >
    * x ppm) is a consumer-side filter, deliberately not baked in.
    */
  def snapshotDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("date")
    def side(pred: Column, c: Column): Column = when(pred, c)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .filter(col("day") < lit("2024-01-31").cast("date"))
    val v1 = col("day") < cut
    ev.groupBy(col("event_type"))
      .agg(
        sum(when(v1, 1L).otherwise(0L)).as("n_v1"),
        sum(when(!v1, 1L).otherwise(0L)).as("n_v2"),
        countDistinct(side(v1, col("user_id"))).as("users_v1"),
        countDistinct(side(!v1, col("user_id"))).as("users_v2"),
        coalesce(sum(side(v1, col("cents"))), lit(0L)).as("cents_v1"),
        coalesce(sum(side(!v1, col("cents"))), lit(0L)).as("cents_v2"))
      .select(col("event_type"), col("n_v1"), col("n_v2"),
        col("users_v1"), col("users_v2"), col("cents_v1"), col("cents_v2"),
        // nullif: a type absent from the baseline window must report NULL
        // drift, not throw DIVIDE_BY_ZERO under ANSI
        expr("((n_v2 - n_v1) * 1000000L) div nullif(n_v1, 0L)")
          .as("volume_delta_ppm"))
      .orderBy(col("event_type"))
  }

  val snapshotDriftSql: String =
    """WITH ev AS (
      |  SELECT event_type, user_id, CAST(ts AS DATE) AS day,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |  WHERE CAST(ts AS DATE) < DATE '2024-01-31')
      |SELECT event_type,
      |  CAST(sum(CASE WHEN day < DATE '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_v1,
      |  CAST(sum(CASE WHEN day >= DATE '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_v2,
      |  count(DISTINCT CASE WHEN day < DATE '2024-01-16' THEN user_id END)
      |    AS users_v1,
      |  count(DISTINCT CASE WHEN day >= DATE '2024-01-16' THEN user_id END)
      |    AS users_v2,
      |  CAST(coalesce(sum(CASE WHEN day < DATE '2024-01-16' THEN cents END), 0)
      |    AS BIGINT) AS cents_v1,
      |  CAST(coalesce(sum(CASE WHEN day >= DATE '2024-01-16' THEN cents END), 0)
      |    AS BIGINT) AS cents_v2,
      |  (CAST(sum(CASE WHEN day >= DATE '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT)
      |    - CAST(sum(CASE WHEN day < DATE '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT))
      |    * 1000000
      |    // nullif(CAST(sum(CASE WHEN day < DATE '2024-01-16' THEN 1 ELSE 0 END)
      |             AS BIGINT), 0)
      |    AS volume_delta_ppm
      |FROM ev
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}
