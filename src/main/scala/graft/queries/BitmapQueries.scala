package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Checkpoints.StableCheckpoint
import graft.functions.BitmapAggregator

/** Round-6 exact-set-algebra family built on the Roaring-bitmap
  * aggregator ([[graft.functions.BitmapAggregator]]): exact distinct
  * counts and exact audience intersections where the HLL family
  * (`sketch_hll_distinct`, `hll_overlap_estimate`,
  * `weekly_user_jaccard`) gives estimates or pays a self-join.
  *
  * The scale story, stated once for all three queries: the aggregation
  * ships ONE compressed bitmap per group across the shuffle (map-side
  * combined), and every set operation afterwards runs on the
  * POST-AGGREGATION table whose row count is the bounded group domain
  * (days, weeks, 5 event types) — never on raw events. The oracles
  * compute the same exact numbers the relational way (distinct +
  * self-join), which is precisely the comparison that shows what the
  * bitmap buys: same answer, no second pass over raw rows.
  */
object BitmapQueries {

  // ---------------------------------------------------- exact daily DAU

  /** Exact daily active users from per-day Roaring bitmaps, alongside
    * raw event volume — the exactness proof for the aggregator (oracle
    * is a plain `COUNT(DISTINCT)`), and at scale the cheaper plan: the
    * bitmap GROUP BY is one pass + map-side combine, where
    * `count(distinct)` under a second grouping key expands to a
    * two-phase distinct-expand shuffle.
    */
  def bitmapDistinctDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val bagg = BitmapAggregator.bitmapAgg
    graft.functions.BitmapAggregator.register(spark)
    Tables.events(spark, sfDir)
      .select(
        expr("datediff(cast(ts as date), date'2024-01-01')")
          .cast("long").as("day"),
        col("user_id"))
      .groupBy(col("day"))
      .agg(bagg(col("user_id")).as("bm"), count(lit(1)).as("n_events"))
      .select(col("day"),
        expr("bitmap_cardinality(bm)").as("n_users"), col("n_events"))
      .orderBy(col("day"))
  }

  val bitmapDistinctDailySql: String =
    """SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
      |    AS BIGINT) AS day,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM events
      |GROUP BY 1
      |ORDER BY day""".stripMargin

  // ------------------------------------------------ exact week retention

  /** Week-over-week retention, EXACT, from adjacent-week bitmap ANDs —
    * the `weekly_user_jaccard` question answered without the user-keyed
    * self-join: per-week bitmaps aggregate once, then the intersection
    * runs on the n_weeks-row table. retained_pct is the one double
    * division.
    */
  def bitmapRetentionWeeks(spark: SparkSession, sfDir: String): DataFrame = {
    val bagg = BitmapAggregator.bitmapAgg
    graft.functions.BitmapAggregator.register(spark)
    val wk = Tables.events(spark, sfDir)
      .select(
        expr("datediff(cast(ts as date), date'2024-01-01') div 7")
          .cast("long").as("wk"),
        col("user_id"))
      .groupBy(col("wk"))
      .agg(bagg(col("user_id")).as("bm"))
      .stableCheckpoint() // reused as both sides of the adjacent-week join
    wk.toDF("wa", "bm_a")
      .join(wk.toDF("wb", "bm_b").withColumn("wa", col("wb") - 1), Seq("wa"))
      .select(col("wa").as("week"),
        expr("bitmap_cardinality(bm_a)").as("n_prev"),
        expr("bitmap_cardinality(bm_b)").as("n_next"),
        expr("bitmap_and_count(bm_a, bm_b)").as("n_retained"))
      .withColumn("retained_pct",
        col("n_retained").cast("double") / col("n_prev").cast("double"))
      .orderBy(col("week"))
  }

  val bitmapRetentionWeeksSql: String =
    """WITH ev AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
      |      AS BIGINT) AS wk
      |  FROM events),
      |sizes AS (
      |  SELECT wk, CAST(count(*) AS BIGINT) AS n_users FROM ev GROUP BY wk),
      |common AS (
      |  SELECT a.wk AS wa, CAST(count(*) AS BIGINT) AS n_retained
      |  FROM ev a JOIN ev b ON a.user_id = b.user_id AND b.wk = a.wk + 1
      |  GROUP BY a.wk)
      |SELECT p.wk AS week, p.n_users AS n_prev, n.n_users AS n_next,
      |  coalesce(c.n_retained, 0) AS n_retained,
      |  CAST(coalesce(c.n_retained, 0) AS DOUBLE) / CAST(p.n_users AS DOUBLE)
      |    AS retained_pct
      |FROM sizes p
      |JOIN sizes n ON n.wk = p.wk + 1
      |LEFT JOIN common c ON c.wa = p.wk
      |ORDER BY week""".stripMargin

  // ------------------------------------------- audience overlap matrix

  /** Exact pairwise audience overlap across the 5 event types — the
    * full |A ∩ B| matrix from 5 bitmaps and a 5×5 post-aggregation
    * join (upper triangle, type_a < type_b). Compare
    * `hll_overlap_estimate` (one estimated cell) and
    * `event_type_venn` (all 31 atoms via bit masks): this is the exact
    * pairwise view at bitmap cost, no per-user state wider than a
    * compressed id set.
    */
  def bitmapTypeOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val bagg = BitmapAggregator.bitmapAgg
    graft.functions.BitmapAggregator.register(spark)
    val bm = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"))
      .groupBy(col("event_type"))
      .agg(bagg(col("user_id")).as("bm"))
      .stableCheckpoint() // both sides of the 5×5 pair join
    bm.toDF("type_a", "bm_a")
      .join(bm.toDF("type_b", "bm_b"), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        expr("bitmap_cardinality(bm_a)").as("n_a"),
        expr("bitmap_cardinality(bm_b)").as("n_b"),
        expr("bitmap_and_count(bm_a, bm_b)").as("n_both"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val bitmapTypeOverlapSql: String =
    """WITH ev AS (
      |  SELECT DISTINCT event_type, user_id FROM events),
      |sizes AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
      |  FROM ev GROUP BY event_type),
      |common AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(count(*) AS BIGINT) AS n_both
      |  FROM ev a JOIN ev b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT sa.event_type AS type_a, sb.event_type AS type_b,
      |  sa.n_users AS n_a, sb.n_users AS n_b,
      |  coalesce(c.n_both, 0) AS n_both
      |FROM sizes sa
      |JOIN sizes sb ON sa.event_type < sb.event_type
      |LEFT JOIN common c
      |  ON c.type_a = sa.event_type AND c.type_b = sb.event_type
      |ORDER BY type_a, type_b""".stripMargin
}
