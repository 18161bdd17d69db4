package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Change-data-capture and behavioral-sequence shapes: SCD2 dimension
  * versioning (the batch MERGE/upsert face) and ordered funnel analysis
  * over the event stream.
  */
object CdcQueries {

  /** SCD2 merge: apply an update batch to a dimension, emitting the full
    * version history — every key keeps its closed versions
    * (valid_from/valid_to) plus one open current row. The update batch
    * here is deterministic (every 10th customer gets a +100 balance
    * adjustment effective 2000-01-01) so the oracle replays it.
    *
    * Shape: union(current-as-v0, updates-as-v1) → ONE shuffle on the key
    * for the lead() window that closes superseded versions — the same
    * union+window trick as the as-of join, no full-outer self-join, no
    * MERGE-specific engine support needed. At scale the union reads both
    * sides once and the window carries (key, version) only.
    */
  def scd2Merge(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val base = cust.select(col("c_custkey"), col("c_acctbal"),
      lit("1995-01-01").cast("timestamp_ntz").as("eff"))
    val updates = cust.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), (col("c_acctbal") + 100).as("c_acctbal"),
        lit("2000-01-01").cast("timestamp_ntz").as("eff"))
    val byKey = Window.partitionBy(col("c_custkey")).orderBy(col("eff"))
    base.unionByName(updates)
      .withColumn("valid_to",
        coalesce(lead(col("eff"), 1).over(byKey),
          lit("9999-12-31").cast("timestamp_ntz")))
      .withColumn("is_current",
        (col("valid_to") === lit("9999-12-31").cast("timestamp_ntz"))
          .cast("long"))
      .select(col("c_custkey"), col("c_acctbal"),
        col("eff").as("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  val scd2MergeSql: String =
    """WITH versions AS (
      |  SELECT c_custkey, c_acctbal, TIMESTAMP '1995-01-01 00:00:00' AS eff
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal + 100, TIMESTAMP '2000-01-01 00:00:00'
      |  FROM customer WHERE c_custkey % 10 = 0)
      |SELECT c_custkey, c_acctbal, eff AS valid_from,
      |  coalesce(lead(eff, 1) OVER (PARTITION BY c_custkey ORDER BY eff),
      |           TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
      |  CAST(coalesce(lead(eff, 1) OVER (PARTITION BY c_custkey ORDER BY eff),
      |                TIMESTAMP '9999-12-31 00:00:00')
      |       = TIMESTAMP '9999-12-31 00:00:00' AS BIGINT) AS is_current
      |FROM versions
      |ORDER BY c_custkey, valid_from""".stripMargin

  /** SCD2 read path: the point-in-time (temporal) lookup every versioned
    * dimension exists for — each order joins the customer VERSION that
    * was valid on its order date (equi join on the key + a range
    * residual on [valid_from, valid_to)), then revenue aggregates by
    * whether it hit the current or a superseded version. Orders placed
    * before the dimension's history begins (1995) drop out — the
    * standard inner temporal join contract. One shuffle pair on
    * c_custkey; the residual never becomes a range-only join.
    */
  def scd2PointInTime(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = scd2Merge(spark, sfDir)
      .select(col("c_custkey"), col("valid_from"), col("valid_to"),
        col("is_current"))
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(dim, col("o_custkey") === col("c_custkey") &&
        col("o_orderdate").cast("timestamp_ntz") >= col("valid_from") &&
        col("o_orderdate").cast("timestamp_ntz") < col("valid_to"))
      .groupBy(col("is_current"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("cents")).as("revenue_cents"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("is_current"))
  }

  val scd2PointInTimeSql: String =
    """WITH versions AS (
      |  SELECT c_custkey, TIMESTAMP '1995-01-01 00:00:00' AS eff
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, TIMESTAMP '2000-01-01 00:00:00'
      |  FROM customer WHERE c_custkey % 10 = 0),
      |dim AS (
      |  SELECT c_custkey, eff AS valid_from,
      |    coalesce(lead(eff, 1) OVER (PARTITION BY c_custkey ORDER BY eff),
      |             TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
      |    CAST(coalesce(lead(eff, 1) OVER (PARTITION BY c_custkey ORDER BY eff),
      |                  TIMESTAMP '9999-12-31 00:00:00')
      |         = TIMESTAMP '9999-12-31 00:00:00' AS BIGINT) AS is_current
      |  FROM versions)
      |SELECT is_current, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents,
      |  count(DISTINCT o_custkey) AS n_customers
      |FROM orders
      |JOIN dim ON o_custkey = c_custkey
      |  AND CAST(o_orderdate AS TIMESTAMP) >= valid_from
      |  AND CAST(o_orderdate AS TIMESTAMP) < valid_to
      |GROUP BY is_current
      |ORDER BY is_current""".stripMargin

  /** Strict ordered funnel signup → view → click → purchase: each stage
    * counts users whose FIRST qualifying event happens at-or-after their
    * entry into the previous stage (not merely "did both ever happen").
    * Four aggregations, all shuffling on user_id — co-partitioned, so
    * AQE plans one real exchange per stage input and the stage tables
    * are tiny (one row per surviving user). Conversion ratios divide
    * identical long counts — cross-engine exact.
    */
  def funnelStages(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    def stage(prev: DataFrame, prevTs: String, etype: String, out: String): DataFrame =
      ev.filter(col("event_type") === etype)
        .join(prev, "user_id")
        .filter(col("ts") >= col(prevTs))
        .groupBy(col("user_id")).agg(min(col("ts")).as(out))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = stage(s1, "t1", "view", "t2")
    val s3 = stage(s2, "t2", "click", "t3")
    val s4 = stage(s3, "t3", "purchase", "t4")
    val counts = s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_view")))
      .crossJoin(s3.agg(count(lit(1)).as("n_click")))
      .crossJoin(s4.agg(count(lit(1)).as("n_purchase")))
    counts.select(col("n_signup"), col("n_view"), col("n_click"),
      col("n_purchase"),
      (col("n_view").cast("double") / col("n_signup").cast("double"))
        .as("view_rate"),
      (col("n_purchase").cast("double") / col("n_signup").cast("double"))
        .as("purchase_rate"))
  }

  /** A/B experiment readout: users hash-split 50/50 (md5 — deterministic
    * assignment, the same primitive as split_train_test), purchase values
    * compared via Welch's t. Cross-engine exactness: values quantize to
    * integer cents, so every moment (n, Σx, Σx²) is an order-free exact
    * long; the final mean/variance/t expressions are division/sqrt chains
    * over identical operands — and sqrt is IEEE exactly-rounded (unlike
    * libm ln/exp), so even the t-statistic hash-matches the oracle.
    */
  def abTestLift(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("variant",
        expr("cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)" +
          " as bigint) % 2"))
    def m(v: Int, e: String): Column = sum(when(col("variant") === v, expr(e))
      .otherwise(lit(0L)))
    assigned.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
        m(0, "cents").as("sum_a"), m(1, "cents").as("sum_b"),
        m(0, "cents * cents").as("ssq_a"), m(1, "cents * cents").as("ssq_b"))
      .selectExpr(
        "n_a", "n_b",
        "cast(sum_a as double) / cast(n_a as double) / 100.0 as mean_a",
        "cast(sum_b as double) / cast(n_b as double) / 100.0 as mean_b",
        "cast(sum_b as double) / cast(n_b as double) / 100.0" +
          " - cast(sum_a as double) / cast(n_a as double) / 100.0 as lift",
        // Welch t on the cent scale: var = (ssq - sum^2/n)/(n-1)
        "(cast(sum_b as double) / cast(n_b as double)" +
          " - cast(sum_a as double) / cast(n_a as double))" +
          " / sqrt((cast(ssq_a as double) - cast(sum_a as double)" +
          " * cast(sum_a as double) / cast(n_a as double))" +
          " / (cast(n_a as double) - 1.0) / cast(n_a as double)" +
          " + (cast(ssq_b as double) - cast(sum_b as double)" +
          " * cast(sum_b as double) / cast(n_b as double))" +
          " / (cast(n_b as double) - 1.0) / cast(n_b as double)) as t_stat")
  }

  val abTestLiftSql: String =
    """WITH a AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
      |      AS variant
      |  FROM events WHERE event_type = 'purchase'),
      |mo AS (
      |  SELECT
      |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN variant = 0 THEN cents ELSE 0 END) AS BIGINT) AS sum_a,
      |    CAST(sum(CASE WHEN variant = 1 THEN cents ELSE 0 END) AS BIGINT) AS sum_b,
      |    CAST(sum(CASE WHEN variant = 0 THEN cents * cents ELSE 0 END) AS BIGINT) AS ssq_a,
      |    CAST(sum(CASE WHEN variant = 1 THEN cents * cents ELSE 0 END) AS BIGINT) AS ssq_b
      |  FROM a)
      |SELECT n_a, n_b,
      |  CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mean_a,
      |  CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 AS mean_b,
      |  CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0
      |    - CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS lift,
      |  (CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      |    - CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE))
      |    / sqrt((CAST(ssq_a AS DOUBLE) - CAST(sum_a AS DOUBLE)
      |    * CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE))
      |    / (CAST(n_a AS DOUBLE) - 1.0) / CAST(n_a AS DOUBLE)
      |    + (CAST(ssq_b AS DOUBLE) - CAST(sum_b AS DOUBLE)
      |    * CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      |    / (CAST(n_b AS DOUBLE) - 1.0) / CAST(n_b AS DOUBLE)) AS t_stat
      |FROM mo""".stripMargin

  val funnelStagesSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |  WHERE event_type = 'view' AND ts >= t1 GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |  WHERE event_type = 'click' AND ts >= t2 GROUP BY e.user_id),
      |s4 AS (
      |  SELECT e.user_id, min(ts) AS t4 FROM events e JOIN s3 USING (user_id)
      |  WHERE event_type = 'purchase' AND ts >= t3 GROUP BY e.user_id)
      |SELECT
      |  (SELECT count(*) FROM s1) AS n_signup,
      |  (SELECT count(*) FROM s2) AS n_view,
      |  (SELECT count(*) FROM s3) AS n_click,
      |  (SELECT count(*) FROM s4) AS n_purchase,
      |  CAST((SELECT count(*) FROM s2) AS DOUBLE)
      |    / CAST((SELECT count(*) FROM s1) AS DOUBLE) AS view_rate,
      |  CAST((SELECT count(*) FROM s4) AS DOUBLE)
      |    / CAST((SELECT count(*) FROM s1) AS DOUBLE) AS purchase_rate""".stripMargin

  /** SCD1 compaction / CDC latest-snapshot: one row per user carrying
    * the LATEST event's attributes — via `max(struct(ts, event_id, …))`,
    * whose lexicographic comparison makes "latest by (ts, event_id)" a
    * plain mergeable aggregate: ONE hash shuffle, partial combine on the
    * map side, no per-key window sort anywhere (the window formulation
    * the oracle uses must sort every key's history). This is the
    * compaction step every CDC consumer runs to turn a change stream
    * into current state, and (ts, event_id) uniqueness makes the winner
    * deterministic under any merge order.
    */
  def cdcLatestSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("last"))
      .select(col("user_id"), col("n_events"),
        col("last.ts").as("last_ts"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"))
      .orderBy(col("user_id"))
  }

  val cdcLatestSnapshotSql: String =
    """WITH ranked AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
      |    value,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events)
      |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
      |  ts AS last_ts, event_id AS last_event_id,
      |  event_type AS last_type, value AS last_value
      |FROM ranked
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** Time-to-convert distribution: whole days from each user's FIRST
    * signup to their first purchase at-or-after it, bucketed — the
    * survival-curve input behind activation dashboards. Users who signed
    * up but never purchased afterward land in the `days = -1` bucket
    * (right-censored), so the histogram accounts for every signup. Two
    * per-user min-aggregations and one tiny groupBy — integer day
    * arithmetic off epoch-µs, no timezone dependence.
    */
  def signupToPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
    val converted = ev.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("ts") >= col("t_signup"))
      .groupBy(col("user_id"), col("t_signup"))
      .agg(min(col("ts")).as("t_purchase"))
    signup.join(converted.select(col("user_id"), col("t_purchase")),
        Seq("user_id"), "left")
      .withColumn("days",
        when(col("t_purchase").isNull, lit(-1L))
          .otherwise(
            expr("(unix_micros(cast(t_purchase as timestamp))" +
              " - unix_micros(cast(t_signup as timestamp))) div 86400000000")))
      .groupBy(col("days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("days"))
  }

  val signupToPurchaseSql: String =
    """WITH s AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_signup
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, s.t_signup,
      |    min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND CAST(e.ts AS TIMESTAMP) >= s.t_signup
      |  GROUP BY e.user_id, s.t_signup),
      |d AS (
      |  SELECT s.user_id,
      |    CASE WHEN c.t_purchase IS NULL THEN -1
      |         ELSE (epoch_us(c.t_purchase) - epoch_us(s.t_signup))
      |              // 86400000000 END AS days
      |  FROM s LEFT JOIN c ON c.user_id = s.user_id)
      |SELECT CAST(days AS BIGINT) AS days,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM d
      |GROUP BY days
      |ORDER BY days""".stripMargin
}
