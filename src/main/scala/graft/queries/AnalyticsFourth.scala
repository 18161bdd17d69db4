package graft.queries

import graft.Checkpoints.StableCheckpoint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Customer-behaviour analytics: cohort retention, RFM segmentation,
  * market-basket association rules, and a skyline (Pareto-frontier) query.
  *
  * All four follow the cross-engine-exactness rules (integer cents, no
  * emitted decimals, double ratios only over identical integer operands)
  * and are shaped for the 100 TB cluster, not just the local gate:
  * retention and RFM are shuffle-once aggregations, the basket self-join
  * keys on orderkey (bounded basket size bounds the pair blow-up), and the
  * skyline avoids the classic O(n²) dominance self-join by reducing to the
  * distinct-price domain first.
  */
object AnalyticsFourth {

  /** Monthly cohort retention: customers are cohorted by the month of
    * their first order; for each (cohort, months-since-first) we count the
    * distinct customers who ordered. The per-customer first-order date is
    * a window min over one `o_custkey` shuffle (no join back needed), and
    * the retention matrix is a second, tiny aggregation — at 100 TB both
    * shuffles carry only (custkey, month) pairs, not order payloads.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate"))
      .withColumn("first_dt", min(col("o_orderdate")).over(byCust))
      .select(
        col("o_custkey"),
        // month-1 so cm decodes cleanly: cm div 12 = calendar year,
        // cm % 12 = 0-based month (December stays in its own year).
        (year(col("first_dt")) * 12 + month(col("first_dt")) - 1).cast("long").as("cm"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).cast("long").as("om"))
      .select(
        expr("cm div 12").as("cohort_year"),
        expr("cm % 12").as("cohort_month0"),
        (col("om") - col("cm")).as("months_since"),
        col("o_custkey"))
      .groupBy(col("cohort_year"), col("cohort_month0"), col("months_since"))
      .agg(countDistinct(col("o_custkey")).as("n_active"))
      .orderBy(col("cohort_year"), col("cohort_month0"), col("months_since"))
  }

  val cohortRetentionSql: String =
    """WITH f AS (
      |  SELECT o_custkey, min(o_orderdate) AS fd FROM orders GROUP BY 1),
      |b AS (
      |  SELECT o.o_custkey,
      |    CAST(EXTRACT(YEAR FROM f.fd) * 12 + EXTRACT(MONTH FROM f.fd) - 1 AS BIGINT) AS cm,
      |    CAST(EXTRACT(YEAR FROM o.o_orderdate) * 12
      |      + EXTRACT(MONTH FROM o.o_orderdate) - 1 AS BIGINT) AS om
      |  FROM orders o JOIN f USING (o_custkey))
      |SELECT cm // 12 AS cohort_year, cm % 12 AS cohort_month0,
      |  om - cm AS months_since,
      |  count(DISTINCT o_custkey) AS n_active
      |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** RFM segmentation: per-customer recency (days since last order, vs the
    * corpus max date), frequency (order count) and monetary (total spend
    * in exact cents), each bucketed into quartiles. Quartile assignment is
    * threshold-based (exact percentiles broadcast as three scalars per
    * metric), NOT `ntile` over a global sort — ntile needs a total order
    * of every customer through one task, while thresholds keep the
    * assignment map-only after a single aggregate. Quartile 1 holds the
    * lowest metric values (most-recent / least-frequent / lowest-spend);
    * ties fall into the lower quartile in both engines because the
    * comparison is `<=` against identical double thresholds interpolated
    * from identical long operands.
    */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey"))
      .agg(
        max(col("o_orderdate")).as("last_dt"),
        count(lit(1)).as("freq"),
        sum(col("cents")).as("money"))
    val mx = per.agg(max(col("last_dt")).as("mxd"))
    val rfm = per.crossJoin(broadcast(mx))
      .select(
        col("o_custkey"),
        datediff(col("mxd"), col("last_dt")).cast("long").as("rec"),
        col("freq"), col("money"))
    val th = rfm.agg(
      expr("percentile(rec, array(0.25D, 0.5D, 0.75D))").as("rt"),
      expr("percentile(freq, array(0.25D, 0.5D, 0.75D))").as("ft"),
      expr("percentile(money, array(0.25D, 0.5D, 0.75D))").as("mt"))
    def quart(c: String, t: String): org.apache.spark.sql.Column =
      expr(s"CAST(CASE WHEN $c <= $t[0] THEN 1 WHEN $c <= $t[1] THEN 2 " +
        s"WHEN $c <= $t[2] THEN 3 ELSE 4 END AS BIGINT)")
    rfm.crossJoin(broadcast(th))
      .select(
        quart("rec", "rt").as("r_q"),
        quart("freq", "ft").as("f_q"),
        quart("money", "mt").as("m_q"),
        col("money"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"), sum(col("money")).as("money_cents"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  val rfmSegmentsSql: String =
    """WITH per AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_dt, count(*) AS freq,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS money
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT max(last_dt) AS mxd FROM per),
      |rfm AS (
      |  SELECT o_custkey,
      |    CAST(date_diff('day', last_dt, mxd) AS BIGINT) AS rec, freq, money
      |  FROM per, mx),
      |th AS (
      |  SELECT quantile_cont(rec, [0.25, 0.5, 0.75]) AS rt,
      |    quantile_cont(freq, [0.25, 0.5, 0.75]) AS ft,
      |    quantile_cont(money, [0.25, 0.5, 0.75]) AS mt
      |  FROM rfm),
      |seg AS (
      |  SELECT
      |    CAST(CASE WHEN rec <= rt[1] THEN 1 WHEN rec <= rt[2] THEN 2
      |      WHEN rec <= rt[3] THEN 3 ELSE 4 END AS BIGINT) AS r_q,
      |    CAST(CASE WHEN freq <= ft[1] THEN 1 WHEN freq <= ft[2] THEN 2
      |      WHEN freq <= ft[3] THEN 3 ELSE 4 END AS BIGINT) AS f_q,
      |    CAST(CASE WHEN money <= mt[1] THEN 1 WHEN money <= mt[2] THEN 2
      |      WHEN money <= mt[3] THEN 3 ELSE 4 END AS BIGINT) AS m_q,
      |    money
      |  FROM rfm, th)
      |SELECT r_q, f_q, m_q, count(*) AS n_customers,
      |  CAST(sum(money) AS BIGINT) AS money_cents
      |FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Market-basket association rules over parts co-ordered in the same
    * order: pair support, and lift = P(a,b) / (P(a)·P(b)) computed as one
    * double ratio of exact integer counts. The pair generator self-joins
    * the distinct (order, part) item set on orderkey — a shuffle equi-join
    * whose output is bounded by Σ basket_size², NOT n² (TPC-H baskets are
    * ≤ a few dozen lines; a 100 TB corpus with pathological baskets would
    * cap basket size upstream). Per-part counts are a small dimension
    * (|parts| ≪ |lineitem|) and broadcast back onto the pairs; the final
    * top-20 plans as TakeOrderedAndProject, never a global sort.
    */
  def marketBasketLift(spark: SparkSession, sfDir: String): DataFrame = {
    // Hot-basket guard: the pair self-join is quadratic per basket, so a
    // pathological 10⁴-item basket (a crawler session, a bot cart) would
    // emit 10⁸ pairs into one key. Cap every basket at its 64
    // smallest-partkey items — a deterministic truncation mirrored
    // verbatim in the oracle; TPC-H baskets (≤7 items) are unaffected.
    val perOrder = Window.partitionBy(col("ok")).orderBy(col("pk"))
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .dropDuplicates("ok", "pk")
      .withColumn("rn", row_number().over(perOrder))
      .filter(col("rn") <= 64)
      .drop("rn")
      .stableCheckpoint() // reused 4× below (both join sides, counts, total)
    val nOrders = items.agg(countDistinct(col("ok")).as("n_orders"))
    val partCnt = items.groupBy(col("pk")).agg(count(lit(1)).as("pc"))
    // pair generation via the sorted_pairs codegen kernel over the SAME
    // capped item relation (per-part counts and the order total must
    // count capped items, so `items` keeps its checkpoint and window):
    // one numbered ok exchange + collect_set + compiled pair loop
    // replaces the sort-merge self-join of the two item reads
    graft.functions.SortedPairs.register(spark)
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    items
      .repartition(nPart, col("ok"))
      .groupBy(col("ok"))
      .agg(collect_set(col("pk")).as("ps"))
      .select(explode(call_function("sorted_pairs", col("ps"))).as("e"))
      .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= 2)
      .join(broadcast(partCnt.toDF("pa", "ca")), Seq("pa"))
      .join(broadcast(partCnt.toDF("pb", "cb")), Seq("pb"))
      .crossJoin(broadcast(nOrders))
      .select(
        col("pa").as("part_a"), col("pb").as("part_b"), col("pair_cnt"),
        ((col("pair_cnt") * col("n_orders")).cast("double") /
          (col("ca") * col("cb")).cast("double")).as("lift"))
      .orderBy(col("pair_cnt").desc, col("lift").desc,
        col("part_a"), col("part_b"))
      .limit(20)
  }

  val marketBasketLiftSql: String =
    """WITH items AS (
      |  SELECT ok, pk FROM (
      |    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
      |  QUALIFY row_number() OVER (PARTITION BY ok ORDER BY pk) <= 64),
      |n AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
      |pc AS (SELECT pk, count(*) AS c FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS pair_cnt
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT part_a, part_b, CAST(pair_cnt AS BIGINT) AS pair_cnt,
      |  CAST(pair_cnt * n.n_orders AS DOUBLE)
      |    / CAST(ca.c * cb.c AS DOUBLE) AS lift
      |FROM pairs, n
      |JOIN pc ca ON ca.pk = pairs.part_a
      |JOIN pc cb ON cb.pk = pairs.part_b
      |ORDER BY pair_cnt DESC, lift DESC, part_a, part_b LIMIT 20""".stripMargin

  /** Skyline (Pareto frontier) of parts minimizing price and maximizing
    * size: a part survives iff no other part is cheaper-or-equal AND
    * larger-or-equal with one strict. The naive formulation is an O(n²)
    * dominance self-join; this one reduces to the distinct-price domain
    * first (groupBy price → max size), runs the strictly-cheaper running
    * max over that small table, and broadcast-joins the 4-row frontier
    * back. The unpartitioned window is safe because it orders DISTINCT
    * prices — a bounded domain (cents) — never the raw rows.
    */
  def skylineParts(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select(
      col("p_partkey"),
      round(col("p_retailprice") * 100).cast("long").as("price_cents"),
      col("p_size").cast("long").as("size"))
    val perPrice = p.groupBy(col("price_cents")).agg(max(col("size")).as("mx_size"))
    val cheaper = Window.orderBy(col("price_cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perPrice
      .withColumn("prev_mx", max(col("mx_size")).over(cheaper))
      .filter(col("prev_mx").isNull || col("prev_mx") < col("mx_size"))
      .select(col("price_cents"), col("mx_size"))
    p.join(broadcast(frontier), Seq("price_cents"))
      .filter(col("size") === col("mx_size"))
      .select(col("p_partkey"), col("price_cents"), col("size"))
      .orderBy(col("price_cents"), col("p_partkey"))
  }

  val skylinePartsSql: String =
    """WITH p AS (
      |  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
      |    CAST(p_size AS BIGINT) AS size
      |  FROM part),
      |pp AS (SELECT price_cents, max(size) AS mx_size FROM p GROUP BY 1),
      |rm AS (
      |  SELECT price_cents, mx_size, max(mx_size) OVER (
      |    ORDER BY price_cents
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_mx
      |  FROM pp),
      |sky AS (
      |  SELECT price_cents, mx_size FROM rm
      |  WHERE prev_mx IS NULL OR prev_mx < mx_size)
      |SELECT p.p_partkey, p.price_cents, p.size
      |FROM p JOIN sky USING (price_cents)
      |WHERE p.size = sky.mx_size
      |ORDER BY p.price_cents, p.p_partkey""".stripMargin

  /** Event-sequence pattern matching (MATCH_RECOGNIZE-style path
    * analysis): each user's history becomes the string of event-type
    * initials in (ts, event_id) order, and `v[ces]*p` counts
    * view→purchase conversions with no second view in between. The
    * pattern is deterministic across regex engines BY CONSTRUCTION: the
    * repeated class excludes both delimiters, so greedy-vs-lazy
    * semantics collapse — each match has exactly one possible extent
    * (Java regex here ≡ RE2 in the oracle). Hot-key guard: paths are
    * truncated to each user's EARLIEST 1000 events (WindowGroupLimit
    * partial top-k, mirrored in the oracle) so one bot account can't
    * build an unbounded per-key string; real deployments additionally
    * sessionize upstream.
    */
  def sequencePatternMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val firstK = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(firstK))
      .filter(col("rn") <= 1000)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("event_type")).as("e"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(array_sort(collect_list(col("e"))),
          x => substring(x.getField("event_type"), 1, 1)), "").as("path"))
      .select(col("user_id"), col("n_events"),
        size(expr("regexp_extract_all(path, 'v[ces]*p', 0)")).cast("long")
          .as("n_conversions"))
      .orderBy(col("user_id"))
  }

  val sequencePatternMatchSql: String =
    """WITH capped AS (
      |  SELECT user_id, event_id, ts, event_type FROM events
      |  QUALIFY row_number() OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id) <= 1000),
      |paths AS (
      |  SELECT user_id, count(*) AS n_events,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
      |      AS path
      |  FROM capped GROUP BY user_id)
      |SELECT user_id, n_events,
      |  CAST(len(regexp_extract_all(path, 'v[ces]*p')) AS BIGINT)
      |    AS n_conversions
      |FROM paths
      |ORDER BY user_id""".stripMargin
}
