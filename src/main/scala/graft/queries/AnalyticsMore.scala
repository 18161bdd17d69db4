package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining analytic-surface coverage: offset/first/ntile window
  * functions, CUBE grouping sets, multiset (ALL) set operations, and
  * ordered string aggregation.
  */
object AnalyticsMore {

  /** lag/lead/first_value/ntile in one pass over per-customer order
    * history (fully tiebroken ordering).
    */
  def windowAnalytics(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .filter(col("o_custkey") <= 100)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_orderdate")).over(w).as("first_order_date"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val windowAnalyticsSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  first_value(o_orderdate) OVER w AS first_order_date,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM orders
      |WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** CUBE over (returnflag, linestatus): all four grouping-set levels. */
  def aggCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val aggCubeSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Multiset set ops: INTERSECT ALL / EXCEPT ALL keep duplicate
    * cardinality (the customer keys of F-status vs urgent orders, with
    * multiplicity).
    */
  def setOpsAll(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val finished = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    finished.intersectAll(urgent).withColumn("which", lit("intersect_all"))
      .unionAll(finished.exceptAll(urgent).withColumn("which", lit("except_all")))
      .groupBy(col("which"), col("o_custkey"))
      .agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("which"), col("o_custkey"))
  }

  val setOpsAllSql: String =
    """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |     u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |combined AS (
      |  SELECT o_custkey, 'intersect_all' AS which FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM u)
      |  UNION ALL
      |  SELECT o_custkey, 'except_all' AS which FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM u))
      |SELECT which, o_custkey, count(*) AS multiplicity
      |FROM combined
      |GROUP BY which, o_custkey
      |ORDER BY which, o_custkey""".stripMargin

  /** Value-based (RANGE) window frame: for each order, the customer's
    * rolling 30-day order-value total. Spark expresses the interval frame
    * as rangeBetween on epoch seconds; the oracle as RANGE BETWEEN
    * INTERVAL. Equal-date peers are all in-frame in both engines (value
    * frames are tiebreak-free), and the frame sum is an exact decimal.
    */
  def windowRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, sfDir)
      .filter(col("o_custkey") <= 200)
      .withColumn("rolling_30d_value",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("rolling_30d_value"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val windowRangeFrameSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS rolling_30d_value
      |FROM orders
      |WHERE o_custkey <= 200
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** Explicit GROUPING SETS (beyond the rollup/cube shorthands): per
    * (returnflag), per (linestatus), and grand total in one pass, with
    * grouping_id disambiguating the set each row came from. Plans as one
    * Expand + one aggregation exchange, like rollup/cube.
    */
  def aggGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val aggGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Time-series resample + forward fill: each user's event values summed
    * into an hourly grid with NO missing hours — the spine is generated
    * per user from min to max hour (sequence + explode, distributed with
    * the user partition), missing buckets forward-fill the last seen sum
    * (`last(..., ignoreNulls)` over the time order). The gap-fill every
    * metrics/feature pipeline runs before windowed training features.
    */
  def eventsGapfillHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .filter(col("user_id") <= 20)
      .withColumn("bucket", date_trunc("hour", col("ts")))
    val hourly = ev.groupBy(col("user_id"), col("bucket"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("hour_value"))
    val spine = ev.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR")))
          .as("bucket"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("user_id", "bucket"), "left")
      .withColumn("filled_value", last(col("hour_value"), ignoreNulls = true).over(w))
      // date_trunc yields LTZ; emit NTZ like the stored events timestamps
      // (session tz is UTC, so the instant is unchanged)
      .select(col("user_id"), col("bucket").cast("timestamp_ntz").as("bucket"),
        col("hour_value"), col("filled_value"))
      .orderBy(col("user_id"), col("bucket"))
  }

  val eventsGapfillHourlySql: String =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, value
      |  FROM events WHERE user_id <= 20),
      |hourly AS (
      |  SELECT user_id, bucket,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hour_value
      |  FROM ev GROUP BY user_id, bucket),
      |spine AS (
      |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      |  FROM (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
      |        FROM ev GROUP BY user_id))
      |SELECT s.user_id, s.bucket, h.hour_value,
      |  last_value(h.hour_value IGNORE NULLS) OVER (
      |    PARTITION BY s.user_id ORDER BY s.bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      |FROM spine s LEFT JOIN hourly h
      |  ON s.user_id = h.user_id AND s.bucket = h.bucket
      |ORDER BY s.user_id, s.bucket""".stripMargin

  /** Ordered string aggregation: comma-joined sorted customer names per
    * segment (array_sort + concat_ws ≡ string_agg ... ORDER BY).
    */
  def stringAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .filter(col("c_custkey") <= 50)
      .groupBy(col("c_mktsegment"))
      .agg(concat_ws(",", array_sort(collect_list(col("c_name")))).as("names"),
        count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))

  val stringAggSql: String =
    """SELECT c_mktsegment,
      |  string_agg(c_name, ',' ORDER BY c_name) AS names,
      |  count(*) AS n
      |FROM customer
      |WHERE c_custkey <= 50
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin
}
