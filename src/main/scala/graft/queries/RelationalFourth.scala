package graft.queries

import graft.Checkpoints.StableCheckpoint
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Fourth batch of relational shapes, completing the 22-query TPC-H analog
  * suite (q8/q9/q11/q13/q15/q16/q20/q21). The harness schema has no
  * `partsupp` and no commit/receipt dates, so the canonical queries are
  * adapted — the PLAN SHAPES (multi-way star join + ratio, profit expression,
  * group-HAVING vs scalar subquery, outer-join distribution, max-of-aggregate
  * view, distinct-count with NOT-IN, correlated dominance threshold,
  * EXISTS/NOT-EXISTS self-joins) are the canonical ones:
  *  - supplier-part relation := SELECT DISTINCT (l_partkey, l_suppkey)
  *  - "late" := l_shipdate > o_orderdate + 60 days
  * Oracle-parity rules as [[Relational]]: money arithmetic in DECIMAL, final
  * emits cast to DOUBLE, ratios divided only after both operands are exact.
  */
object RelationalFourth {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def revenue: Column =
    dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))

  /** Q8-analog: national market share. Revenue in region-ASIA customer
    * markets for ECONOMY parts, 1995–1996, and the share supplied by
    * NATION_5. The big fact co-shuffle is lineitem⋈orders; part, supplier,
    * customer, nation, region all broadcast (dims stay small relative to
    * the fact at every SF). Share = ratio of two exact decimal sums,
    * divided after the cast to double (identical operands both engines).
    */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val custRegion = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir).filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", revenue)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("nation_rev"),
        sum(revenue).cast("double").as("total_rev"),
        count(lit(1)).as("n_lines"))
      .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
      .orderBy(col("o_year"))
  }

  val q8MarketShareSql: String =
    """WITH base AS (
      |  SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev,
      |    ns.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation nc ON c_nationkey = nc.n_nationkey
      |  JOIN region ON nc.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ns ON s_nationkey = ns.n_nationkey
      |  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
      |SELECT CAST(yr AS BIGINT) AS o_year,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
      |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_rev,
      |  CAST(sum(rev) AS DOUBLE) AS total_rev,
      |  count(*) AS n_lines,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
      |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(sum(rev) AS DOUBLE) AS mkt_share
      |FROM base
      |GROUP BY yr
      |ORDER BY o_year""".stripMargin

  /** Q9-analog: product-type profit per supplier nation per year. No
    * `partsupp`, so cost := p_retailprice · l_quantity (the analog of
    * ps_supplycost · l_quantity); parts restricted by the name pattern as
    * in the canonical query. Profit stays in exact DECIMAL(·,4) until the
    * final emit: (18,2)×(18,2) products are exact in both engines, and the
    * scale-4 sum is order-independent.
    */
  def q9ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val cost = dec(col("p_retailprice")) * dec(col("l_quantity"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir).filter(col("p_name").like("%gear%"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(revenue - cost).cast("double").as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProductProfitSql: String =
    """SELECT n_name AS nation,
      |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |           - CAST(p_retailprice AS DECIMAL(18,2))
      |             * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%gear%'
      |GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin

  /** Q11-analog: important inventory value. No `partsupp`, so per-part value
    * := Σ l_extendedprice over lines supplied by NATION_3 suppliers; emit
    * parts whose value exceeds 1/1000 of the national total. The HAVING
    * threshold is the canonical scalar-subquery-vs-group comparison, kept
    * in exact decimal·integer arithmetic (value·1000 > total) so both
    * engines compare identically.
    */
  def q11ImportantValue(spark: SparkSession, sfDir: String): DataFrame = {
    val natLines = Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.supplier(spark, sfDir)
          .join(broadcast(Tables.nation(spark, sfDir)
              .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), dec(col("l_extendedprice")).as("px"))
    val perPart = natLines.groupBy(col("l_partkey"))
      .agg(sum(col("px")).cast("decimal(38,2)").as("value"))
    val total = perPart.agg(sum(col("value")).cast("decimal(38,2)").as("total"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value") * 1000 > col("total"))
      .select(col("l_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  val q11ImportantValueSql: String =
    """WITH v AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS value
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_3'
      |  GROUP BY l_partkey)
      |SELECT l_partkey, CAST(value AS DOUBLE) AS value
      |FROM v
      |WHERE value * 1000 > (SELECT CAST(sum(value) AS DECIMAL(38,2)) FROM v)
      |ORDER BY value DESC, l_partkey""".stripMargin

  /** Q13-analog: customer order-count distribution. Customer LEFT OUTER
    * JOIN orders (non-urgent only — the analog of the NOT LIKE comment
    * filter), count per customer, then the distribution of those counts.
    * Two shuffles by construction (custkey, then count) — both unavoidable
    * and both tiny after the first aggregate.
    */
  def q13OrderDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(!col("o_orderpriority").like("%URGENT%"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.customer(spark, sfDir).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13OrderDistributionSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15-analog: top supplier(s) by quarterly revenue — the max-of-aggregate
    * view pattern. Per-supplier revenue stays DECIMAL so the max and the
    * equality join-back are exact (no double-rounding ties); the broadcast
    * scalar max is the same shape as q22's threshold.
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenue).cast("decimal(38,4)").as("total_rev"))
    val best = rev.agg(max(col("total_rev")).as("best"))
    rev.crossJoin(broadcast(best))
      .filter(col("total_rev") === col("best"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |      AS DECIMAL(38,4)) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT max(total_rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q16-analog: supplier diversity per part group. The supplier-part
    * relation is derived (DISTINCT l_partkey, l_suppkey — no partsupp);
    * suppliers in deficit (s_acctbal < 0, the "complaints" analog) are
    * excluded via an anti join (≡ NOT IN over non-null keys). The distinct
    * pair projection happens BEFORE the part join so the expensive
    * distinct runs on two int columns, not the widened row.
    */
  def q16SupplierDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val excluded = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    pairs
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(Tables.part(spark, sfDir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 2, 3, 4, 5, 6, 7, 8))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16SupplierDiversitySql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1,2,3,4,5,6,7,8)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q20-analog: dominant suppliers of 'small%' parts. Without
    * ps_availqty the correlated threshold becomes "shipped more than half
    * of the part's total 1996 volume" — the same correlated
    * per-group-threshold shape. The per-part total is a window over the
    * already-grouped (part, supp) aggregate: ONE shuffle on partkey after
    * the groupBy, no self-join. Quantity sums are sums of integral doubles
    * (exact), and 2·sq > total is exact integer-valued arithmetic.
    */
  def q20DominantSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val byPart = Window.partitionBy(col("l_partkey"))
    val perPartSupp = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, sfDir)
          .filter(col("p_name").like("small%")).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("sq"))
      .withColumn("part_total", sum(col("sq")).over(byPart))
    perPartSupp
      .filter(col("sq") * 2 > col("part_total"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_parts"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts"))
      .orderBy(col("s_suppkey"))
  }

  val q20DominantSuppliersSql: String =
    """WITH pq AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'small%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_partkey, l_suppkey),
      |dom AS (
      |  SELECT l_suppkey, count(*) AS n_parts
      |  FROM pq a
      |  WHERE sq * 2 > (SELECT sum(sq) FROM pq b WHERE b.l_partkey = a.l_partkey)
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, n_parts
      |FROM dom JOIN supplier ON l_suppkey = s_suppkey
      |ORDER BY s_suppkey""".stripMargin

  /** Q21-analog: suppliers who kept multi-supplier orders waiting. "Late"
    * := shipped more than 60 days after the order date (no receipt/commit
    * dates in the schema). The canonical EXISTS (another supplier on the
    * order) + NOT EXISTS (no OTHER supplier was late) pair becomes a semi
    * join and an anti join, both on l_orderkey with a non-equi supplier
    * residual — three shuffles total, all on the same orderkey, so AQE
    * reuses co-partitioning; supplier broadcasts.
    */
  def q21WaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val lines = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
      // Reused 3× below (l1 / semi / anti); without a checkpoint the
      // lineitem⋈orders join re-executes per leg (ReuseExchange does not
      // cover all three shapes) — store the small (key, suppkey, bool)
      // projection once instead.
      .stableCheckpoint()
    val l1 = lines.filter(col("late"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
    val others = lines.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val lateOthers = lines.filter(col("late"))
      .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    l1
      .join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
      .join(lateOthers, col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
      .groupBy(col("sk"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21WaitingSuppliersSql: String =
    """WITH lines AS (
      |  SELECT l_orderkey, l_suppkey,
      |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT s_name, count(*) AS numwait
      |FROM lines l1
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.late
      |  AND EXISTS (SELECT 1 FROM lines l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lines l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  // ------------------------------------------------- order-to-ship lag

  /** Fulfilment-latency histogram: days from order placement to line
    * shipment in fixed half-year buckets clamped to ±8 (the q12-style
    * shipping-SLA audit re-expressed for this schema, which has no
    * commit/receipt dates; the synthetic ship dates range ±2400 days
    * around the order date, so the clamp bounds the row count at 17
    * regardless of outliers). One keyed lineitem→orders join (Catalyst
    * broadcasts at small SF, shuffles on the natural key at scale),
    * integer day gaps, fixed buckets — no windows at all; avg lag is
    * the one final division.
    */
  def shipLagHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate"))
        .cast("long").as("lag"))
      .select(greatest(least(floor(col("lag") / 180).cast("long"), lit(8L)),
        lit(-8L)).as("bucket_order"), col("lag"))
      .groupBy(col("bucket_order"))
      .agg(count(lit(1)).as("n_items"), sum(col("lag")).as("sum_lag"))
      .select(col("bucket_order"),
        (col("bucket_order") * 180).as("bucket_lo_days"),
        col("n_items"),
        (col("sum_lag").cast("double") / col("n_items").cast("double"))
          .as("avg_lag_days"))
      .orderBy(col("bucket_order"))
  }

  val shipLagHistogramSql: String =
    """WITH l AS (
      |  SELECT GREATEST(LEAST(CAST(floor(
      |      date_diff('day', o_orderdate, l_shipdate) / 180) AS BIGINT),
      |      8), -8) AS bucket_order,
      |    CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT bucket_order,
      |  bucket_order * 180 AS bucket_lo_days,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(lag) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |    AS avg_lag_days
      |FROM l
      |GROUP BY bucket_order
      |ORDER BY bucket_order""".stripMargin

  // ------------------------------------------------- substitute parts

  /** Substitution-candidate catalog: parts interchangeable on
    * (type, size) but offered under different brands — per group, the
    * part/brand counts and the exact number of CROSS-BRAND pairs
    * `C(n,2) − Σ_brand C(c_b,2)` (pure integer identity: all pairs
    * minus same-brand pairs — no pair enumeration, just two aggregation
    * levels). The sourcing-alternatives query a procurement pipeline
    * runs; top-20 groups by substitutability.
    */
  def substituteParts(spark: SparkSession, sfDir: String): DataFrame = {
    val perBrand = Tables.part(spark, sfDir)
      .groupBy(col("p_type"), col("p_size"), col("p_brand"))
      .agg(count(lit(1)).as("c_b"))
    perBrand
      .groupBy(col("p_type"), col("p_size"))
      .agg(sum(col("c_b")).as("n_parts"),
        count(lit(1)).as("n_brands"),
        sum(expr("c_b * (c_b - 1) div 2")).as("same_brand_pairs"))
      .filter(col("n_brands") >= 2)
      .select(col("p_type"), col("p_size").cast("long").as("p_size"),
        col("n_parts"), col("n_brands"),
        (expr("n_parts * (n_parts - 1) div 2") - col("same_brand_pairs"))
          .as("n_substitute_pairs"))
      .orderBy(col("n_substitute_pairs").desc, col("p_type"), col("p_size"))
      .limit(20)
  }

  val substitutePartsSql: String =
    """WITH pb AS (
      |  SELECT p_type, p_size, p_brand, CAST(count(*) AS BIGINT) AS c_b
      |  FROM part GROUP BY p_type, p_size, p_brand),
      |g AS (
      |  SELECT p_type, p_size,
      |    CAST(sum(c_b) AS BIGINT) AS n_parts,
      |    CAST(count(*) AS BIGINT) AS n_brands,
      |    CAST(sum(c_b * (c_b - 1) // 2) AS BIGINT) AS same_brand_pairs
      |  FROM pb GROUP BY p_type, p_size)
      |SELECT p_type, CAST(p_size AS BIGINT) AS p_size, n_parts, n_brands,
      |  CAST(n_parts * (n_parts - 1) // 2 - same_brand_pairs AS BIGINT)
      |    AS n_substitute_pairs
      |FROM g
      |WHERE n_brands >= 2
      |ORDER BY n_substitute_pairs DESC, p_type, p_size
      |LIMIT 20""".stripMargin

  // ------------------------------------------------- brand return rates

  /** Return-rate league table by brand: lineitems flagged 'R' as a
    * share of each brand's volume, with the returned revenue — the
    * merchandising quality scan. One keyed lineitem→part join into a
    * brand aggregate (brands are a bounded domain); a 100-item volume
    * floor keeps rates statistically meaningful; rate is the one
    * division. Top-20 worst brands, distributed partial top-k.
    */
  def brandReturnRates(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        (col("l_returnflag") === "R").as("is_ret"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val pr = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand"))
    li.join(pr, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("is_ret"), 1L).otherwise(0L)).as("n_returned"),
        sum(when(col("is_ret"), col("cents")).otherwise(0L))
          .as("returned_cents"))
      .filter(col("n_items") >= 100)
      .select(col("p_brand"), col("n_items"), col("n_returned"),
        col("returned_cents"),
        (col("n_returned").cast("double") / col("n_items").cast("double"))
          .as("return_rate"))
      .orderBy(col("return_rate").desc, col("p_brand"))
      .limit(20)
  }

  val brandReturnRatesSql: String =
    """WITH j AS (
      |  SELECT p_brand, l_returnflag = 'R' AS is_ret,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey)
      |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CASE WHEN is_ret THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_returned,
      |  CAST(sum(CASE WHEN is_ret THEN cents ELSE 0 END) AS BIGINT)
      |    AS returned_cents,
      |  CAST(sum(CASE WHEN is_ret THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS return_rate
      |FROM j
      |GROUP BY p_brand
      |HAVING count(*) >= 100
      |ORDER BY return_rate DESC, p_brand
      |LIMIT 20""".stripMargin

  // -------------------------------------------- supplier YoY retention

  /** Supplier-base year-over-year retention: of the suppliers that
    * shipped in year y, what fraction also shipped in y+1 — the
    * supply-chain churn gauge. Distinct (year, supplier) rows, a
    * supplier-keyed self-join constrained to adjacent years, and the
    * one retention division — the `weekly_user_jaccard` shape on the
    * supplier axis.
    */
  def supplierYoyRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val active = Tables.lineitem(spark, sfDir)
      .select(year(col("l_shipdate")).cast("long").as("yr"),
        col("l_suppkey"))
      .distinct()
      .stableCheckpoint() // sizes + adjacent-year self-join
    val sizes = active.groupBy(col("yr")).agg(count(lit(1)).as("n_suppliers"))
    val retained = active.toDF("ya", "l_suppkey")
      .join(active.toDF("yb", "l_suppkey"), Seq("l_suppkey"))
      .filter(col("yb") === col("ya") + 1)
      .groupBy(col("ya")).agg(count(lit(1)).as("n_retained"))
    sizes.toDF("ya", "n_year")
      .join(sizes.toDF("yb", "n_next").withColumn("ya", col("yb") - 1),
        Seq("ya"))
      .join(retained, Seq("ya"), "left")
      .withColumn("n_retained", coalesce(col("n_retained"), lit(0L)))
      .select(col("ya").as("year"), col("n_year"), col("n_next"),
        col("n_retained"),
        (col("n_retained").cast("double") / col("n_year").cast("double"))
          .as("retention_rate"))
      .orderBy(col("year"))
  }

  val supplierYoyRetentionSql: String =
    """WITH a AS (
      |  SELECT DISTINCT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)
      |      AS yr,
      |    l_suppkey
      |  FROM lineitem),
      |sizes AS (
      |  SELECT yr, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY yr),
      |ret AS (
      |  SELECT x.yr AS ya, CAST(count(*) AS BIGINT) AS n_retained
      |  FROM a x JOIN a y
      |    ON x.l_suppkey = y.l_suppkey AND y.yr = x.yr + 1
      |  GROUP BY x.yr)
      |SELECT p.yr AS year, p.n AS n_year, q.n AS n_next,
      |  coalesce(r.n_retained, 0) AS n_retained,
      |  CAST(coalesce(r.n_retained, 0) AS DOUBLE) / CAST(p.n AS DOUBLE)
      |    AS retention_rate
      |FROM sizes p
      |JOIN sizes q ON q.yr = p.yr + 1
      |LEFT JOIN ret r ON r.ya = p.yr
      |ORDER BY year""".stripMargin

  // ---------------------------------------------------- brand margins

  /** Realized-vs-list margin by brand: per-unit realized price
    * (extendedprice/quantity) against the part's list retailprice, in
    * exact integer cents aggregated per brand — the pricing-power scan.
    * The per-line margin is kept integer by scaling before the
    * quantity division (`(100·extprice_cents·1) div qty` would lose
    * exactness, so instead Σ extprice and Σ qty·retail are aggregated
    * separately and the single ratio compares revenue to list value).
    */
  def brandMarginStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("ext_cents"))
    val pr = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"),
        round(col("p_retailprice") * 100).cast("long").as("retail_cents"))
    li.join(pr, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("ext_cents")).as("revenue_cents"),
        sum(expr("cast(qty as decimal(38,0)) * cast(retail_cents as decimal(38,0))"))
          .cast("long").as("list_value_cents"))
      .select(col("p_brand"), col("n_lines"), col("revenue_cents"),
        col("list_value_cents"),
        (col("revenue_cents").cast("double") /
          col("list_value_cents").cast("double")).as("realized_ratio"))
      .orderBy(col("p_brand"))
  }

  val brandMarginStatsSql: String =
    """WITH j AS (
      |  SELECT p_brand, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_cents,
      |    CAST(round(p_retailprice * 100) AS BIGINT) AS retail_cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey)
      |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(ext_cents) AS BIGINT) AS revenue_cents,
      |  CAST(sum(CAST(qty AS HUGEINT) * CAST(retail_cents AS HUGEINT))
      |    AS BIGINT) AS list_value_cents,
      |  CAST(sum(ext_cents) AS DOUBLE)
      |    / CAST(sum(CAST(qty AS HUGEINT) * CAST(retail_cents AS HUGEINT))
      |        AS DOUBLE) AS realized_ratio
      |FROM j
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // --------------------------------------------------- nation trade matrix

  /** Full customer-nation × supplier-nation trade-flow matrix — q7
    * generalized from one nation pair to the complete 25×25 grid, the
    * international-commerce OLAP cube slice. The star join is the q5/q7
    * shape (fact scans shuffle on their natural keys; the two nation
    * dims ride broadcasts); revenue is exact integer cents; top-20
    * flows by volume via distributed partial top-k.
    */
  def nationTradeMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat.toDF("ck", "cust_nation")),
        col("c_nationkey") === col("ck"))
      .join(broadcast(nat.toDF("sk", "supp_nation")),
        col("s_nationkey") === col("sk"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("trade_cents"))
      .orderBy(col("trade_cents").desc, col("cust_nation"),
        col("supp_nation"))
      .limit(20)
  }

  val nationTradeMatrixSql: String =
    """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS trade_cents
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |GROUP BY cn.n_name, sn.n_name
      |ORDER BY trade_cents DESC, cust_nation, supp_nation
      |LIMIT 20""".stripMargin

  // ------------------------------------------------ segment priority mix

  /** Market-segment × order-priority revenue mix with each cell's share
    * of its segment — the "who orders urgently" merchandising slice
    * (5×5 bounded grid). One orders→customer keyed join, a cell
    * aggregation, segment totals via a SEGMENT-KEYED window over the
    * 25-cell aggregate, and the one share division per cell.
    */
  def segmentPriorityMix(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_cents"))
    cells
      .withColumn("seg_cents", sum(col("rev_cents")).over(
        Window.partitionBy(col("c_mktsegment"))))
      .select(col("c_mktsegment"), col("o_orderpriority"), col("n_orders"),
        col("rev_cents"),
        (col("rev_cents").cast("double") / col("seg_cents").cast("double"))
          .as("segment_share"))
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))
  }

  val segmentPriorityMixSql: String =
    """WITH cells AS (
      |  SELECT c_mktsegment, o_orderpriority,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment, o_orderpriority)
      |SELECT c_mktsegment, o_orderpriority, n_orders, rev_cents,
      |  CAST(rev_cents AS DOUBLE)
      |    / CAST(sum(rev_cents) OVER (PARTITION BY c_mktsegment)
      |        AS DOUBLE) AS segment_share
      |FROM cells
      |ORDER BY c_mktsegment, o_orderpriority""".stripMargin
}
