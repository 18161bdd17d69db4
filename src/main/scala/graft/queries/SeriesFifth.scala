package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Checkpoints.StableCheckpoint

/** Fifth-wave time-series / distribution operators: two-sample
  * Kolmogorov-Smirnov drift detection in pure integer arithmetic, a
  * Markov transition matrix over per-user event sequences, and linear
  * interpolation resampling onto an hourly grid.
  */
object SeriesFifth {

  /** Two-sample KS statistic between the length distributions of two
    * document populations (sources src0-src9 vs src10-src19) — the
    * standard ingest-time drift test ("does the new crawl look like the
    * old one?"). The ECDF gap is kept integer-exact: at every distinct
    * value v, |cumA(v)·nB − cumB(v)·nA| is a BIGINT, the max over v is
    * the KS numerator, and the statistic divides it by nA·nB once at the
    * end. The cumulative window runs over the ~500-value DISTINCT length
    * domain (pre-aggregated — never the raw corpus), the one global sort
    * every ECDF needs; everything before it is a map-side tag + one
    * value-keyed aggregation, so at 100 TB the narrow waist is
    * |distinct values|, not |rows|.
    */
  def ksDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val tagged = Tables.documents(spark, sfDir)
      .select(
        when(expr("try_cast(substring(source, 4) as int)") < 10, 1L)
          .otherwise(0L).as("is_a"),
        col("n_chars").as("v"))
    val per = tagged.groupBy(col("v"))
      .agg(sum(col("is_a")).as("ca"),
        (count(lit(1)) - sum(col("is_a"))).as("cb"))
    val totals = tagged.agg(sum(col("is_a")).as("n_a"),
      (count(lit(1)) - sum(col("is_a"))).as("n_b"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gaps = per
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
      .crossJoin(broadcast(totals))
      .withColumn("gap",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
    gaps
      .withColumn("max_gap", max(col("gap")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("gap") === col("max_gap"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("gap")).as("ks_num"), min(col("v")).as("ks_at_value"))
      .withColumn("ks_stat",
        col("ks_num").cast("double") / (col("n_a") * col("n_b")).cast("double"))
      .select(col("n_a"), col("n_b"), col("ks_num"), col("ks_at_value"),
        col("ks_stat"))
  }

  val ksDriftSql: String =
    """WITH tagged AS (
      |  SELECT CASE WHEN try_cast(substr(source, 4, 9) AS INTEGER) < 10
      |              THEN 1 ELSE 0 END AS is_a,
      |         n_chars AS v
      |  FROM documents),
      |per AS (
      |  SELECT v, CAST(sum(is_a) AS BIGINT) AS ca,
      |    CAST(count(*) - sum(is_a) AS BIGINT) AS cb
      |  FROM tagged GROUP BY v),
      |totals AS (
      |  SELECT CAST(sum(is_a) AS BIGINT) AS n_a,
      |    CAST(count(*) - sum(is_a) AS BIGINT) AS n_b
      |  FROM tagged),
      |cum AS (
      |  SELECT v,
      |    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
      |    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
      |  FROM per),
      |gaps AS (
      |  SELECT v, abs(cum_a * n_b - cum_b * n_a) AS gap, n_a, n_b
      |  FROM cum, totals)
      |SELECT n_a, n_b,
      |  CAST(max(gap) AS BIGINT) AS ks_num,
      |  min(v) FILTER (gap = (SELECT max(gap) FROM gaps)) AS ks_at_value,
      |  CAST(max(gap) AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS ks_stat
      |FROM gaps
      |GROUP BY n_a, n_b""".stripMargin

  /** Rolling 7-point OLS slope of daily order revenue — trend detection
    * as a window aggregate. Every sufficient statistic (Σx, Σy, Σxy,
    * Σx², n) is an exact BIGINT window sum over integer day indexes and
    * revenue cents, and the slope is ONE final division — so a
    * regression coefficient hash-gates across engines. Day domain is
    * pre-aggregated (~2.4k rows) before the global-ordered window, the
    * same small-domain pattern as `cusum_daily_revenue`. Slope is null
    * until 2 points exist (den = 0 guard).
    */
  def rollingSlope(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .withColumn("x", datediff(col("day"), lit("1992-01-01").cast("date"))
        .cast("long"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope_cents_per_day",
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") / col("den").cast("double")))
      .select(col("day"), col("y").as("revenue_cents"), col("n"),
        col("slope_cents_per_day"))
      .orderBy(col("day"))
  }

  val rollingSlopeSql: String =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS y,
      |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
      |      AS x
      |  FROM orders GROUP BY o_orderdate),
      |s AS (
      |  SELECT day, y,
      |    CAST(count(*) OVER w AS BIGINT) AS n,
      |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
      |    sum(x * y) OVER w AS sxy, sum(x * x) OVER w AS sxx
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT day, y AS revenue_cents, n,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |       ELSE CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE) END
      |    AS slope_cents_per_day
      |FROM s
      |ORDER BY day""".stripMargin

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next event type | current event type), with counts. The sequence
    * order is (ts, event_id) per user — a per-user window (shuffles once
    * on user_id, the natural key), then a 25-cell aggregation. The model
    * behind session simulation and anomalous-flow detection; at 100 TB
    * the per-user sort is the only cost and it partitions perfectly.
    */
  def markovTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("prev_type"))
      .withColumn("next_type", lead(col("prev_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("total_out",
        sum(col("cnt")).over(Window.partitionBy(col("prev_type"))))
      .withColumn("prob",
        col("cnt").cast("double") / col("total_out").cast("double"))
      .select(col("prev_type"), col("next_type"), col("cnt"),
        col("total_out"), col("prob"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  val markovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS prev_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |counts AS (
      |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS cnt
      |  FROM seq WHERE next_type IS NOT NULL
      |  GROUP BY prev_type, next_type)
      |SELECT prev_type, next_type, cnt,
      |  CAST(sum(cnt) OVER (PARTITION BY prev_type) AS BIGINT) AS total_out,
      |  CAST(cnt AS DOUBLE)
      |    / CAST(sum(cnt) OVER (PARTITION BY prev_type) AS DOUBLE) AS prob
      |FROM counts
      |ORDER BY prev_type, next_type""".stripMargin

  /** 7-day rolling Pearson correlation between the daily purchase-value
    * and daily click-count series — "do clicks track revenue this
    * week?" as a window aggregate. Every moment (n, Σx, Σy, Σxy, Σx²,
    * Σy²) is an exact BIGINT window sum; the correlation is divisions
    * and IEEE-exact sqrt over identical operands (the `ab_test_lift`
    * argument), so a rolling correlation hash-gates. Day domain is
    * pre-aggregated before the ordered window — the small-domain
    * pattern shared with `rolling_slope`.
    */
  def rollingCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val daily = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("varx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vary", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("corr7",
        when(col("varx") === 0 || col("vary") === 0,
          lit(null).cast("double"))
          .otherwise((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double")
            / (sqrt(col("varx").cast("double"))
               * sqrt(col("vary").cast("double")))))
      .select(col("day"), col("x").as("purchase_cents"), col("y").as("clicks"),
        col("n"), col("corr7"))
      .orderBy(col("day"))
  }

  val rollingCorrSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |             THEN CAST(round(value * 100) AS BIGINT)
      |             ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |         AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT day, x, y,
      |    CAST(count(*) OVER w AS BIGINT) AS n,
      |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
      |    sum(x * y) OVER w AS sxy,
      |    sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT day, x AS purchase_cents, y AS clicks, n,
      |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
      |       ELSE CAST(n * sxy - sx * sy AS DOUBLE)
      |            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |               * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS corr7
      |FROM s
      |ORDER BY day""".stripMargin

  /** Top event-type TRIGRAMS across user journeys — the second-order
    * companion to [[markovTransitions]] (common 3-step paths, the input
    * to funnel design and anomalous-flow detection). Same per-user
    * window shuffle; the path space is |types|³ ≤ 125 cells, so the
    * global top-10 ranks a tiny aggregated domain. Ranking is pure
    * integers (count desc, path asc).
    */
  def pathTrigrams(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tri = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
    // r19: top-10 via orderBy+limit (TakeOrderedAndProject — distributed
    // partial top-k per task) BEFORE the rank window, so the global
    // row_number orders 10 rows instead of the whole trigram domain
    // (which grows with the event-type alphabet). Ordering (n desc,
    // path asc) is strictly unique (paths distinct post-aggregate), so
    // the survivors and their ranks are identical by construction — the
    // clusteringCoeffTop idiom.
    tri.orderBy(col("n").desc, col("path")).limit(10)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n").desc, col("path"))).cast("long"))
      .select(col("rnk"), col("path"), col("n"))
      .orderBy(col("rnk"))
  }

  val pathTrigramsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS e1,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |paths AS (
      |  SELECT e1 || '>' || e2 || '>' || e3 AS path,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE e3 IS NOT NULL
      |  GROUP BY 1),
      |ranked AS (
      |  SELECT path, n,
      |    CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rnk
      |  FROM paths)
      |SELECT rnk, path, n FROM ranked
      |WHERE rnk <= 10
      |ORDER BY rnk""".stripMargin

  /** Linear-interpolation resampling: per event type, the event `value`
    * series resampled onto an exact hourly grid, v(t) = v0 + (v1−v0) ·
    * (t−t0)/(t1−t0) between the surrounding observations. The irregular
    * series and the grid union into ONE per-type ordered stream, and two
    * frames (last-non-null behind, first-non-null ahead) recover both
    * neighbors without any join — the standard gap-bridging trick. Time
    * deltas are integer epoch-µs; the interpolation is three IEEE ops on
    * identical operands in both engines, so the gate hashes it exactly.
    * Partitioned by event_type: at 100 TB this is a per-key ordered scan
    * (and with finer keys — per sensor, per user — it parallelizes to
    * match).
    */
  def interpolateLinear(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("value"), col("event_id"))
    val grid = ev.groupBy(col("event_type"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .select(col("event_type"),
        explode(sequence(date_trunc("hour", col("t0")),
          date_trunc("hour", col("t1")), expr("interval 1 hour"))).as("ts0"))
      .select(col("event_type"), col("ts0").cast("timestamp_ntz").as("ts"))
    val unioned = ev
      .select(col("event_type"), col("ts"), col("value"),
        lit(0).as("tag"), col("event_id"))
      .unionByName(grid.select(col("event_type"), col("ts"),
        lit(null).cast("double").as("value"), lit(1).as("tag"),
        lit(0L).as("event_id")))
    val ordAsc = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
    val behind = ordAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The forward neighbor via a GROWING frame over the reversed order,
    // not `first(...) OVER (1 FOLLOWING, UNBOUNDED FOLLOWING)`: Spark
    // recomputes non-invertible aggregates on shrinking frames, which is
    // O(n²) per partition (measured 38 s on 20k-row partitions at sf0.1);
    // the reversed growing frame is the O(n) incremental scan. Tie
    // layout mirrors exactly: at equal ts the grid row (tag 1) sorts
    // BEFORE the observations in DESC (tag desc), so "rows before me"
    // are strictly-later observations only.
    val ordDesc = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("tag").desc, col("event_id").desc)
    val aheadRev = ordDesc.rowsBetween(Window.unboundedPreceding, -1)
    val obsTs = when(col("tag") === 0, col("ts"))
    val obsV = when(col("tag") === 0, col("value"))
    unioned
      // numbered event_type repartition: the union is ~1 MB, so AQE
      // coalesces the window exchange to ONE task and all five types'
      // ordered scans serialize (r9 sweep flag); pinning the count keeps
      // one task per type, which HashPartitioning(event_type) already
      // satisfies for both window directions
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("event_type"))
      .withColumn("pts", last(obsTs, ignoreNulls = true).over(behind))
      .withColumn("pv", last(obsV, ignoreNulls = true).over(behind))
      .withColumn("nts", last(obsTs, ignoreNulls = true).over(aheadRev))
      .withColumn("nv", last(obsV, ignoreNulls = true).over(aheadRev))
      .filter(col("tag") === 1 && col("pts").isNotNull && col("nts").isNotNull)
      .withColumn("value_interp",
        col("pv") + (col("nv") - col("pv"))
          * (expr("cast(unix_micros(cast(ts as timestamp)) - unix_micros(cast(pts as timestamp)) as double)")
             / expr("cast(unix_micros(cast(nts as timestamp)) - unix_micros(cast(pts as timestamp)) as double)")))
      .select(col("event_type"), col("ts"), col("value_interp"))
    // No final orderBy (r13 ×100 sweep): the global sort's range sample
    // re-executed the entire two-direction window pipeline — the ×100
    // profile showed THREE ~12 s consumers of the same 208 MB exchange
    // (window pipeline, its re-run under the bounds sample, the ordered
    // pass) where one suffices. Ordering was never semantic (the compare
    // is order-independent); the remaining parallelism bound is the
    // 5-value event_type window key, documented above.
  }

  val interpolateLinearSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value, event_id
      |  FROM events),
      |bounds AS (
      |  SELECT event_type, date_trunc('hour', min(ts)) AS t0,
      |    date_trunc('hour', max(ts)) AS t1
      |  FROM ev GROUP BY event_type),
      |grid AS (
      |  SELECT event_type, unnest(generate_series(t0, t1, INTERVAL 1 HOUR))
      |    AS ts
      |  FROM bounds),
      |unioned AS (
      |  SELECT event_type, ts, value, 0 AS tag, event_id FROM ev
      |  UNION ALL
      |  SELECT event_type, ts, NULL, 1, 0 FROM grid),
      |n AS (
      |  SELECT event_type, ts, tag,
      |    last_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS) OVER (
      |      PARTITION BY event_type ORDER BY ts, tag, event_id
      |      ROWS UNBOUNDED PRECEDING) AS pts,
      |    last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS) OVER (
      |      PARTITION BY event_type ORDER BY ts, tag, event_id
      |      ROWS UNBOUNDED PRECEDING) AS pv,
      |    first_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS) OVER (
      |      PARTITION BY event_type ORDER BY ts, tag, event_id
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nts,
      |    first_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS) OVER (
      |      PARTITION BY event_type ORDER BY ts, tag, event_id
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
      |  FROM unioned)
      |SELECT event_type, ts,
      |  pv + (nv - pv) * (CAST(epoch_us(ts) - epoch_us(pts) AS DOUBLE)
      |                    / CAST(epoch_us(nts) - epoch_us(pts) AS DOUBLE))
      |    AS value_interp
      |FROM n
      |WHERE tag = 1 AND pts IS NOT NULL AND nts IS NOT NULL
      |ORDER BY event_type, ts""".stripMargin

  /** Autocorrelation function of daily purchase revenue at lags 1–7 —
    * the series diagnostic that says whether yesterday predicts today
    * (and whether the weekly cycle [[seasonalDecomposeWeekday]] hints at
    * is real): for each lag, the Pearson correlation between the series
    * and its lag-shifted self over the overlapping days, computed from
    * exact integer moments per lag (the `corr_exact` recipe — n, Σx,
    * Σy, Σxy, Σx², Σy² as BIGINTs, one double chain at the end). The
    * lag pairing is a self-join on day+lag over the tiny daily rollup —
    * at 100 TB the rollup is the only pass over raw data.
    */
  def acfDailyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("x"))
    val lags = spark.range(1, 8).select(col("id").as("lag"))
    daily.toDF("day", "x")
      .crossJoin(broadcast(lags))
      .join(daily.toDF("day2", "y"),
        expr("day2 = date_add(day, cast(lag as int))"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("acf",
        expr("(cast(n as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double))" +
          " / (sqrt(cast(n as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double))" +
          " * sqrt(cast(n as double) * cast(syy as double)" +
          " - cast(sy as double) * cast(sy as double)))"))
      .select(col("lag"), col("n"), col("acf"))
      .orderBy(col("lag"))
  }

  val acfDailyRevenueSql: String =
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY day),
      |p AS (
      |  SELECT l.lag, a.x, b.x AS y
      |  FROM d a CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
      |  JOIN d b ON b.day = a.day + CAST(l.lag AS INTEGER)),
      |m AS (
      |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM p GROUP BY lag)
      |SELECT lag, n,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS acf
      |FROM m
      |ORDER BY lag""".stripMargin

  /** Weekday seasonality decomposition of daily purchase revenue — the
    * additive-model first pass (observed = weekday mean + residual) that
    * tells a forecaster whether a day-of-week component exists at all:
    * per weekday, the across-days mean and residual variance, both from
    * EXACT integer moments (Σx, Σx² in 128-bit so a 100 TB revenue
    * series cannot wrap) with one double expression at the end — the
    * same cross-engine-exact recipe as `corr_exact`. Two cheap
    * aggregations: day rollup, then a 7-group moment fold.
    */
  def seasonalDecomposeWeekday(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"))
      // Spark dayofweek: 1=Sunday … 7; shift to DuckDB's 0=Sunday … 6
      .select((dayofweek(col("day")) - 1).cast("long").as("weekday"), col("x"))
      .groupBy(col("weekday"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("total_cents"),
        sum(expr("cast(x as decimal(19,0)) * cast(x as decimal(19,0))"))
          .as("sxx"))
      .withColumn("mean_day_cents",
        col("total_cents").cast("double") / col("n_days").cast("double"))
      .withColumn("var_day_cents",
        expr("(cast(n_days as double) * cast(sxx as double)" +
          " - cast(total_cents as double) * cast(total_cents as double))" +
          " / (cast(n_days as double) * cast(n_days as double))"))
      .select(col("weekday"), col("n_days"), col("total_cents"),
        col("mean_day_cents"), col("var_day_cents"))
      .orderBy(col("weekday"))

  val seasonalDecomposeWeekdaySql: String =
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY day),
      |w AS (
      |  SELECT CAST(dayofweek(day) AS BIGINT) AS weekday,
      |    CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(x) AS BIGINT) AS total_cents,
      |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
      |  FROM d GROUP BY weekday)
      |SELECT weekday, n_days, total_cents,
      |  CAST(total_cents AS DOUBLE) / CAST(n_days AS DOUBLE)
      |    AS mean_day_cents,
      |  (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
      |    - CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))
      |    / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE))
      |    AS var_day_cents
      |FROM w
      |ORDER BY weekday""".stripMargin

  // ------------------------------------------------------------ sax motifs

  /** SAX-style symbolic motif discovery over the daily-revenue series:
    * each day maps to a 4-letter alphabet (a…d) by its revenue quartile,
    * and the top-20 most frequent 3-day symbol motifs are reported — the
    * "what weekly shapes recur" primitive behind symbolic time-series
    * indexing (Lin et al.'s SAX, re-expressed exactly). Quartile
    * thresholds use the repo's exact rank convention
    * (value at ⌊p·(n−1)⌋+1 under (rev, d) ASC) picked from the
    * revenue HISTOGRAM of days — the `kcore_parts` bounded-domain trick,
    * so no window ever orders more than the distinct daily-revenue
    * domain (≤ calendar days, which the calendar bounds — it does not
    * grow with row count). Symbols and motif counts are pure
    * integer/string arithmetic: bit-exact cross-engine, no doubles at
    * all except the exact binary fractions 0.25/0.5/0.75 inside the
    * rank computation.
    */
  def saxDailyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      .stableCheckpoint() // reused: histogram + symbol assignment
    val n = daily.agg(count(lit(1)).as("n"))
    // Equal-rev days are contiguous under (rev, d) ASC, so the value at
    // any rank is a function of the revenue histogram alone.
    val hist = daily.groupBy(col("rev")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("rev"))))
      .crossJoin(broadcast(n))
    def rankPick(p: String, as: String): DataFrame = hist
      .withColumn("r",
        expr(s"cast(floor(cast($p as double) * cast(n - 1 as double)) as bigint) + 1"))
      .filter(col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
      .select(col("rev").as(as))
    val thr = rankPick("0.25", "q25")
      .crossJoin(rankPick("0.5", "q50"))
      .crossJoin(rankPick("0.75", "q75"))
    val sym = daily.crossJoin(broadcast(thr))
      .select(col("d"),
        when(col("rev") <= col("q25"), "a")
          .when(col("rev") <= col("q50"), "b")
          .when(col("rev") <= col("q75"), "c")
          .otherwise("d").as("sym"))
    // Consecutive-day trigram via lag over the day order — a window over
    // the calendar-bounded day domain, never raw orders.
    val byDay = Window.orderBy(col("d"))
    sym
      .select(concat(lag(col("sym"), 2).over(byDay),
        lag(col("sym"), 1).over(byDay), col("sym")).as("motif"))
      .filter(col("motif").isNotNull)
      .groupBy(col("motif")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("motif"))
      .limit(20)
  }

  val saxDailyRevenueSql: String =
    """WITH daily AS (
      |  SELECT o_orderdate AS d,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY o_orderdate),
      |hist AS (
      |  SELECT rev, CAST(count(*) AS BIGINT) AS cnt,
      |    CAST(sum(count(*)) OVER (ORDER BY rev
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    (SELECT count(*) FROM daily) AS n
      |  FROM daily GROUP BY rev),
      |thr AS (
      |  SELECT
      |    max(CASE WHEN cum >= CAST(floor(CAST(0.25 AS DOUBLE)
      |        * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
      |      AND cum - cnt < CAST(floor(CAST(0.25 AS DOUBLE)
      |        * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN rev END) AS q25,
      |    max(CASE WHEN cum >= CAST(floor(CAST(0.5 AS DOUBLE)
      |        * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
      |      AND cum - cnt < CAST(floor(CAST(0.5 AS DOUBLE)
      |        * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN rev END) AS q50,
      |    max(CASE WHEN cum >= CAST(floor(CAST(0.75 AS DOUBLE)
      |        * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
      |      AND cum - cnt < CAST(floor(CAST(0.75 AS DOUBLE)
      |        * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN rev END) AS q75
      |  FROM hist),
      |sym AS (
      |  SELECT d,
      |    CASE WHEN rev <= q25 THEN 'a' WHEN rev <= q50 THEN 'b'
      |      WHEN rev <= q75 THEN 'c' ELSE 'd' END AS sym
      |  FROM daily, thr),
      |tri AS (
      |  SELECT lag(sym, 2) OVER (ORDER BY d)
      |    || lag(sym, 1) OVER (ORDER BY d) || sym AS motif
      |  FROM sym)
      |SELECT motif, CAST(count(*) AS BIGINT) AS n_occurrences
      |FROM tri
      |WHERE motif IS NOT NULL
      |GROUP BY motif
      |ORDER BY n_occurrences DESC, motif
      |LIMIT 20""".stripMargin
}
