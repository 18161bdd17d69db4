package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Descriptive-statistics operators with cross-engine-exact arithmetic:
  * correlation from integer moments and equi-width histograms. Both are
  * single-shuffle aggregations whose per-row work is map-side.
  */
object StatsQueries {

  /** Pearson correlation between purchase value and hour-of-day, computed
    * from exact integer moments: value quantizes to cents, hour is
    * already integral, so n, Σx, Σy, Σxy, Σx², Σy² are order-free exact
    * longs and the final correlation is one arithmetic chain over
    * identical operands (sqrt is IEEE exactly-rounded). The built-in
    * `corr()` aggregates FLOATS in partition order — not replayable
    * cross-engine; this formulation is, and is how a 100 TB correlation
    * should be computed anyway (partial integer moments merge exactly).
    */
  def corrExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(
        round(col("value") * 100).cast("long").as("x"),
        hour(col("ts")).cast("long").as("y"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .selectExpr("n",
        "(cast(n as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double))" +
          " / (sqrt(cast(n as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double))" +
          " * sqrt(cast(n as double) * cast(syy as double)" +
          " - cast(sy as double) * cast(sy as double))) as corr_value_hour")

  val corrExactSql: String =
    """WITH b AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS x,
      |    CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase'),
      |mo AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM b)
      |SELECT n,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_value_hour
      |FROM mo""".stripMargin

  /** Equi-width histogram of purchase values in 20 integer-cent bins over
    * [0, max]: bin = (cents·20) div (max+1) — pure integer arithmetic, so
    * boundary values land identically in both engines (a float-width
    * division would disagree at bin edges). The max is a broadcast scalar;
    * the histogram itself is one combiner-friendly groupBy.
    */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 100).cast("long").as("cents"))
    val mx = cents.agg(max(col("cents")).as("mx"))
    cents.crossJoin(broadcast(mx))
      .select(expr("(cents * 20) div (mx + 1)").as("bin"), col("mx"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        first(col("mx")).as("mx0"))
      .select(col("bin"),
        expr("(bin * (mx0 + 1)) div 20").as("lo_cents"),
        expr("((bin + 1) * (mx0 + 1)) div 20").as("hi_cents"),
        col("n"))
      .orderBy(col("bin"))
  }

  val valueHistogramSql: String =
    """WITH c AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT max(cents) AS mx FROM c),
      |binned AS (
      |  SELECT (cents * 20) // (mx + 1) AS bin, mx FROM c, m)
      |SELECT bin,
      |  (bin * (mx + 1)) // 20 AS lo_cents,
      |  ((bin + 1) * (mx + 1)) // 20 AS hi_cents,
      |  count(*) AS n
      |FROM binned
      |GROUP BY bin, mx
      |ORDER BY bin""".stripMargin

  /** EQUI-DEPTH histogram (the optimizer's histogram, vs
    * [[valueHistogram]]'s equi-width): decile bin edges come from the
    * mergeable KLL sketch — in its provably-exact regime at gate scale,
    * like `sketch_quantile` — broadcast as one 9-value row, and each row
    * buckets by counting edges it exceeds (nine codegen'd comparisons,
    * no per-row HOF). Two scans + one tiny broadcast: at 100 TB the
    * edge pass is the sketch aggregation and the bucket pass is
    * map-side arithmetic — never a global sort.
    */
  def equiDepthHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val pcts = (1 to 9).map(_ * 10)
    val kll = graft.functions.KllQuantileAggregator.kllQuantiles(65536, pcts)
    val cents = Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val edges = cents.agg(kll(col("cents")).as("qv"))
    cents.crossJoin(broadcast(edges))
      .withColumn("bin",
        (1 to 9).map(i =>
          when(col("cents") > element_at(col("qv"), i), 1L).otherwise(0L))
          .reduce(_ + _))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .orderBy(col("bin"))
  }

  /** Hour × value-decile purchase heatmap — the 2-D histogram behind an
    * activity dashboard: global integer-arithmetic decile binning (same
    * `(cents·10) div (mx+1)` trick as [[valueHistogram]] so bin edges
    * agree across engines) crossed with hour-of-day. One scan, one tiny
    * broadcast scalar, one (hour, bin)-keyed aggregation — 240 output
    * cells regardless of input size.
    */
  def histogram2d(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(hour(col("ts")).cast("long").as("hr"),
        round(col("value") * 100).cast("long").as("cents"))
    val mx = c.agg(max(col("cents")).as("mx"))
    c.crossJoin(broadcast(mx))
      .select(col("hr"), expr("(cents * 10) div (mx + 1)").as("bin"))
      .groupBy(col("hr"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hr"), col("bin"))
  }

  val histogram2dSql: String =
    """WITH c AS (
      |  SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hr,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT max(cents) AS mx FROM c)
      |SELECT hr, (cents * 10) // (mx + 1) AS bin,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM c, m
      |GROUP BY hr, bin
      |ORDER BY hr, bin""".stripMargin

  /** Winsorized per-group statistics — the robust-mean pattern for
    * heavy-tailed metrics: clamp each order's total into its priority
    * group's [p10, p90] (exact order statistics at rank
    * ⌊q·(n−1)⌋+1, the convention every quantile query here shares) and
    * report the winsorized mean next to the raw one. Ranks come from a
    * PARTITIONED window (never global), bounds broadcast back as 5 tiny
    * rows; integer cents end-to-end with one double division per group.
    */
  def winsorizedStats(spark: SparkSession, sfDir: String): DataFrame = {
    val v = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("cents"))
    val ranked = v
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("o_orderpriority"))))
      .withColumn("lo_rn",
        expr("cast(floor(cast(10 as double) / cast(100 as double)" +
          " * cast(n - 1 as double)) as bigint) + 1"))
      .withColumn("hi_rn",
        expr("cast(floor(cast(90 as double) / cast(100 as double)" +
          " * cast(n - 1 as double)) as bigint) + 1"))
    val bounds = ranked
      .groupBy(col("o_orderpriority"))
      .agg(max(when(col("rn") === col("lo_rn"), col("cents"))).as("p10_cents"),
        max(when(col("rn") === col("hi_rn"), col("cents"))).as("p90_cents"))
    v.join(broadcast(bounds), "o_orderpriority")
      .withColumn("clamped",
        least(greatest(col("cents"), col("p10_cents")), col("p90_cents")))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("p10_cents")).as("p10_cents"),
        max(col("p90_cents")).as("p90_cents"),
        sum(col("cents")).as("sum_cents"),
        sum(col("clamped")).as("sum_winsorized"))
      .withColumn("mean_cents",
        col("sum_cents").cast("double") / col("n_orders").cast("double"))
      .withColumn("winsorized_mean_cents",
        col("sum_winsorized").cast("double") / col("n_orders").cast("double"))
      .select(col("o_orderpriority"), col("n_orders"), col("p10_cents"),
        col("p90_cents"), col("mean_cents"), col("winsorized_mean_cents"))
      .orderBy(col("o_orderpriority"))
  }

  val winsorizedStatsSql: String =
    """WITH v AS (
      |  SELECT o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |r AS (
      |  SELECT o_orderpriority, cents,
      |    CAST(row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY cents) AS BIGINT) AS rn,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM v),
      |rr AS (
      |  SELECT *,
      |    CAST(floor(CAST(10 AS DOUBLE) / CAST(100 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS lo_rn,
      |    CAST(floor(CAST(90 AS DOUBLE) / CAST(100 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS hi_rn
      |  FROM r),
      |b AS (
      |  SELECT o_orderpriority,
      |    max(CASE WHEN rn = lo_rn THEN cents END) AS p10_cents,
      |    max(CASE WHEN rn = hi_rn THEN cents END) AS p90_cents
      |  FROM rr GROUP BY o_orderpriority)
      |SELECT v.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |  max(p10_cents) AS p10_cents, max(p90_cents) AS p90_cents,
      |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS mean_cents,
      |  CAST(CAST(sum(least(greatest(cents, p10_cents), p90_cents))
      |    AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |    AS winsorized_mean_cents
      |FROM v JOIN b USING (o_orderpriority)
      |GROUP BY v.o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Approximate-regime gate for [[equiDepthHistogram]] (VERDICT r4 item
    * 4, third leg): with k = 512 the decile edges compact at every gate
    * scale, so bin populations are merge-order-dependent and cannot be
    * hash-compared — but the equi-depth CONTRACT can: every decile must
    * hold 10% ± 5pp of the rows. Edge rank error ≤ ε bounds each bin's
    * share within 2ε of nominal; the pinned ±5pp tolerance is ~10× the
    * empirical error at this depth, so the verdict row flips (and the
    * hash gate fails) on real drift only. Oracle supplies the expected
    * all-true deciles.
    */
  def equiDepthBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val pcts = (1 to 9).map(_ * 10)
    val kll = graft.functions.KllQuantileAggregator.kllQuantiles(512, pcts)
    val cents = Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val edges = cents.agg(kll(col("cents")).as("qv"))
    val bins = cents.crossJoin(broadcast(edges))
      .withColumn("bin",
        (1 to 9).map(i =>
          when(col("cents") > element_at(col("qv"), i), 1L).otherwise(0L))
          .reduce(_ + _))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
    val tot = bins.agg(sum(col("n")).as("total"))
    bins.crossJoin(broadcast(tot))
      .select(col("bin"),
        (col("n").cast("double") / col("total").cast("double"))
          .between(0.05d, 0.15d).as("balanced"))
      .orderBy(col("bin"))
  }

  val equiDepthBalanceSql: String =
    """SELECT CAST(bin AS BIGINT) AS bin, TRUE AS balanced
      |FROM (SELECT unnest(range(0, 10)) AS bin) b
      |ORDER BY bin""".stripMargin

  val equiDepthHistogramSql: String =
    """WITH v AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM v),
      |n AS (SELECT count(*) AS n FROM v),
      |q AS (SELECT unnest([10, 20, 30, 40, 50, 60, 70, 80, 90]) AS q_pct),
      |t AS (
      |  SELECT CAST(floor((CAST(q_pct AS DOUBLE) / CAST(100 AS DOUBLE))
      |    * CAST(n.n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rn
      |  FROM q, n),
      |edges AS (SELECT r.cents AS e FROM t JOIN r USING (rn)),
      |binned AS (
      |  SELECT cents,
      |    (SELECT CAST(count(*) AS BIGINT) FROM edges WHERE cents > e)
      |      AS bin
      |  FROM v)
      |SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |  min(cents) AS min_cents, max(cents) AS max_cents
      |FROM binned
      |GROUP BY bin
      |ORDER BY bin""".stripMargin
}
