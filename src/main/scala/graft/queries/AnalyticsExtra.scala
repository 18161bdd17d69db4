package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Distribution window functions and the bucketed band join — the two
  * remaining analytic shapes: rank-position analytics (percent_rank /
  * cume_dist / nth_value) and a numeric range join that never goes
  * through a nested loop.
  */
object AnalyticsExtra {

  /** Rank-distribution analytics per order priority: percent_rank,
    * cume_dist and the partition's 3rd-smallest total. The window orders
    * by (o_totalprice, o_orderkey) — fully tiebroken, so both engines
    * place every row identically and the (rank−1)/(n−1) style divisions
    * see identical integer operands. The output keeps every 37th order
    * AFTER the windows are computed (a transparent output prune — window
    * values are over the full partition either way).
    */
  def windowDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("third_smallest", nth_value(col("o_totalprice"), 3).over(w))
      .filter(col("o_orderkey") % 37 === 0)
      .orderBy(col("o_orderkey"))
  }

  val windowDistributionSql: String =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_orderpriority, o_totalprice,
      |    percent_rank() OVER w AS pct_rank,
      |    cume_dist() OVER w AS cume,
      |    nth_value(o_totalprice, 3) OVER w AS third_smallest
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority
      |               ORDER BY o_totalprice, o_orderkey))
      |WHERE o_orderkey % 37 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** NTILE quartile bands per priority — the last member of the rank
    * family (with rank / dense_rank / row_number / percent_rank /
    * cume_dist / nth_value, all gated): quartile assignment over the
    * fully tiebroken (cents, o_orderkey) order, then per-(priority,
    * quartile) occupancy and exact integer cent bounds. Both engines
    * implement the SQL-standard ntile distribution (first n mod 4
    * buckets take the extra row), so the band edges hash-match.
    */
  def ntileQuartiles(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cents"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      // numbered priority repartition: the projected orders are ~1 MB,
      // so AQE coalesces the window exchange to ONE task and all five
      // priorities' ordered scans serialize (r9 sweep flag); pinning the
      // count keeps one task per priority
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("o_orderpriority"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"))
      .orderBy(col("o_orderpriority"), col("quartile"))
  }

  val ntileQuartilesSql: String =
    """WITH q AS (
      |  SELECT o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(ntile(4) OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
      |      AS BIGINT) AS quartile
      |  FROM orders)
      |SELECT o_orderpriority, quartile,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  min(cents) AS lo_cents, max(cents) AS hi_cents
      |FROM q
      |GROUP BY o_orderpriority, quartile
      |ORDER BY o_orderpriority, quartile""".stripMargin

  /** Banded numeric join via bucketing: cross-brand part pairs priced
    * within 25 cents of each other. Prices quantize to integer cents
    * (round(p·100) — exact, cross-engine), the band becomes bucket
    * arithmetic (bucket = cents div 25), and the probe side explodes its
    * 3 candidate buckets {b−1, b, b+1} while the build side keeps its
    * single bucket — so every qualifying pair meets on EXACTLY one
    * bucket (no post-dedup) and the plan is an equi shuffle join, never
    * a nested loop. This is the scale template for every |a−b| ≤ δ join:
    * work is Σ per-bucket products, not |A|·|B|.
    */
  def rangeJoinBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
      .withColumn("bucket", expr("cents div 25"))
    val probe = parts
      .select(col("p_partkey").as("a_key"), col("p_brand").as("a_brand"),
        col("cents").as("a_cents"),
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1))
          .as("j_bucket"))
    val build = parts
      .select(col("p_partkey").as("b_key"), col("p_brand").as("b_brand"),
        col("cents").as("b_cents"), col("bucket").as("j_bucket"))
    probe.join(build, "j_bucket")
      .filter(col("a_key") < col("b_key") &&
        col("a_brand") =!= col("b_brand") &&
        abs(col("a_cents") - col("b_cents")) <= 25)
      .groupBy(col("a_brand"), col("b_brand"))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("a_cents") - col("b_cents"))).as("min_gap_cents"))
      .orderBy(col("a_brand"), col("b_brand"))
  }

  /** Z-order (Morton) clustering key over (user_id, hour-of-stream):
    * interleaving the low 16 bits of the two dimensions gives a single
    * sort key under which rows close in EITHER dimension land close in
    * the file — the layout trick behind multi-dimensional data skipping
    * (sort-by-z before write ⇒ per-file min/max ranges stay tight on
    * BOTH columns, so either predicate prunes). Pure integer shifts and
    * masks, bit-identical everywhere; emitted here as the keyed sample
    * a writer would sort by.
    */
  def zorderKey(spark: SparkSession, sfDir: String): DataFrame = {
    def interleave(x: String, y: String): String =
      (0 until 16).map(i =>
        s"(shiftleft(shiftright($x, $i) & 1, ${2 * i})" +
          s" + shiftleft(shiftright($y, $i) & 1, ${2 * i + 1}))")
        .mkString(" + ")
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        expr("cast(date_diff(HOUR, timestamp_ntz'1995-01-01 00:00:00', ts) as bigint)")
          .as("hour_bucket"))
      .withColumn("zval", expr(interleave("user_id", "hour_bucket")))
      .filter(col("event_id") % 53 === 0)
      .select(col("event_id"), col("user_id"), col("hour_bucket"), col("zval"))
      .orderBy(col("zval"), col("event_id"))
  }

  val zorderKeySql: String = {
    def interleave(x: String, y: String): String =
      (0 until 16).map(i =>
        s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
    s"""WITH base AS (
       |  SELECT event_id, user_id,
       |    CAST(date_diff('hour', TIMESTAMP '1995-01-01 00:00:00', ts)
       |         AS BIGINT) AS hour_bucket
       |  FROM events)
       |SELECT event_id, user_id, hour_bucket,
       |  ${interleave("user_id", "hour_bucket")} AS zval
       |FROM base
       |WHERE event_id % 53 = 0
       |ORDER BY zval, event_id""".stripMargin
  }

  /** Top-3 orders per priority via the bounded mergeable
    * [[graft.functions.TopKAggregator]] instead of a window sort: partial
    * buffers cap at k entries per map task and the shuffle carries ≤
    * k·partitions rows — no full per-group sort anywhere, which is the
    * 100 TB answer to "top-k per group". The oracle is the row_number()
    * WINDOW formulation, so the hash match proves heap-top-k ≡ sort-top-k
    * under the shared total order (score desc, id asc).
    */
  def topkAggPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val topK = graft.functions.TopKAggregator.topK(3)
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(topK(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("o_orderpriority"), (col("i") + 1).cast("long").as("rnk"),
        col("t._2").as("o_orderkey"), col("t._1").as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rnk"))
  }

  val topkAggPerGroupSql: String =
    """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      |  FROM orders)
      |WHERE rnk <= 3
      |ORDER BY o_orderpriority, rnk""".stripMargin

  /** Decayed moving average over each user's purchase sequence: an
    * 8-term EWMA with α = 1/2, i.e. Σ_{k=0..7} lag_k(value)/2^(k+1).
    * Halving is EXACT in IEEE doubles and the 8-term sum is written in
    * one fixed left-to-right order in both engines, so the result is
    * bit-identical — the general-α EWMA (recursive, α^k powers) is not
    * cross-engine stable and a 100 TB pipeline wants the replayable
    * variant anyway. One shuffle (user window); missing lags coalesce
    * to 0 with the matching weight renormalization left OUT deliberately
    * (warm-up rows are partial sums, documented behavior).
    */
  def eventsEwma(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val terms = (0 to 7).map(k =>
      coalesce(lag(col("value"), k).over(w), lit(0.0)) / lit(math.pow(2, k + 1)))
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("ewma", terms.reduceLeft(_ + _))
      .filter(col("user_id") % 7 === 0)
      .select(col("user_id"), col("event_id"), col("value"), col("ewma"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val eventsEwmaSql: String = {
    val terms = (0 to 7).map(k =>
      s"coalesce(lag(value, $k) OVER w, CAST(0 AS DOUBLE)) / ${1L << (k + 1)}")
      .mkString("\n      |    + ")
    s"""SELECT user_id, event_id, value, ewma FROM (
       |  SELECT user_id, ts, event_id, value,
       |    ${terms} AS ewma
       |  FROM events
       |  WHERE event_type = 'purchase'
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |WHERE user_id % 7 = 0
       |ORDER BY user_id, event_id""".stripMargin
  }

  /** Sliding-window distinct: users active in the trailing 7 days, per
    * day. Spark (like every engine) cannot do COUNT(DISTINCT) over a
    * moving frame directly; the scale shape is the CONTRIBUTION EXPLODE —
    * each (day, user) activity row contributes to the 7 window-end days
    * it is visible from, then one exact distinct-count per day. Work is
    * 7× the distinct daily actives (tiny vs the event count), all
    * map-side until a single groupBy.
    */
  def rollingDistinctUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    daily
      .select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("k"),
        col("day"))
      .select(col("user_id"), date_add(col("day"), col("k")).as("win_end"))
      // clip to days that exist in the data so every emitted row is a
      // real calendar day with a full-or-partial trailing window
      .join(daily.select(col("day").as("win_end")).distinct(), "win_end")
      .groupBy(col("win_end"))
      .agg(countDistinct(col("user_id")).as("active_users_7d"))
      .orderBy(col("win_end"))
  }

  val rollingDistinctUsersSql: String =
    """WITH daily AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |contrib AS (
      |  SELECT user_id, day + CAST(k AS INTEGER) AS win_end
      |  FROM daily, (SELECT unnest(range(0, 7)) AS k))
      |SELECT win_end, count(DISTINCT user_id) AS active_users_7d
      |FROM contrib
      |JOIN (SELECT DISTINCT day AS win_end FROM daily) d USING (win_end)
      |GROUP BY win_end
      |ORDER BY win_end""".stripMargin

  val rangeJoinBucketsSql: String =
    """WITH p AS (
      |  SELECT p_partkey, p_brand,
      |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
      |    CAST(round(p_retailprice * 100) AS BIGINT) // 25 AS bucket
      |  FROM part),
      |probe AS (
      |  SELECT p_partkey AS a_key, p_brand AS a_brand, cents AS a_cents,
      |    unnest([bucket - 1, bucket, bucket + 1]) AS j_bucket
      |  FROM p),
      |build AS (
      |  SELECT p_partkey AS b_key, p_brand AS b_brand, cents AS b_cents,
      |    bucket AS j_bucket
      |  FROM p)
      |SELECT a_brand, b_brand, count(*) AS n_pairs,
      |  CAST(min(abs(a_cents - b_cents)) AS BIGINT) AS min_gap_cents
      |FROM probe JOIN build USING (j_bucket)
      |WHERE a_key < b_key AND a_brand <> b_brand
      |  AND abs(a_cents - b_cents) <= 25
      |GROUP BY a_brand, b_brand
      |ORDER BY a_brand, b_brand""".stripMargin
}
