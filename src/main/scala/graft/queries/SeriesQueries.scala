package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series / data-ops operators: CUSUM change detection, MAD outlier
  * flagging, time-weighted averages, and a compaction (bin-packing)
  * planner built on a scalable two-pass prefix sum.
  *
  * Exactness: all level arithmetic is integer cents/seconds; the only
  * doubles are medians (interpolated from identical long operands in both
  * engines) and final ratios of exact longs.
  */
object SeriesQueries {

  /** CUSUM change-point statistic over daily purchase revenue: the running
    * sum of n·(x_d − mean) — computed as n·x_d − T so it stays in exact
    * long arithmetic (no division). A sustained drift in daily revenue
    * shows as a monotone CUSUM ramp; the largest |cusum| day is the
    * change-point estimate. The raw events reduce per-day FIRST (one
    * combiner-friendly shuffle); the ordered scan then runs over the tiny
    * distinct-day domain, so the unpartitioned window never sees raw rows.
    */
  def cusumDailyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val tot = daily.agg(
      count(lit(1)).as("n_days"), sum(col("cents")).as("total"))
    val byDay = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(tot))
      .withColumn("dev", col("cents") * col("n_days") - col("total"))
      .withColumn("cusum", sum(col("dev")).over(byDay))
      .select(col("day"), col("cents"), col("cusum"))
      .orderBy(col("day"))
  }

  val cusumDailyRevenueSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |tot AS (SELECT count(*) AS n_days, CAST(sum(cents) AS BIGINT) AS total
      |  FROM daily)
      |SELECT day, cents,
      |  CAST(sum(cents * n_days - total) OVER (
      |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cusum
      |FROM daily, tot ORDER BY day""".stripMargin

  /** Median-absolute-deviation outliers: purchases whose |value − median|
    * exceeds 3·MAD. Robust to the outliers it hunts (unlike z-scores,
    * whose mean/stddev the outliers drag). Two exact-percentile passes
    * over integer cents; the flagging itself is a map-only comparison
    * against two broadcast scalars, so the pattern costs two small
    * aggregates regardless of corpus size. Top-100 by deviation plans as
    * TakeOrderedAndProject.
    *
    * 100 TB note: exact `percentile` buffers every value per aggregation
    * buffer — at corpus scale swap both median passes for
    * [[graft.functions.KllQuantileAggregator]] (gated as
    * `sketch_quantile` / `group_quantile_sketch`), whose buffers are
    * bounded at k·log(n/k); MAD tolerates the sketch's ε rank error by
    * construction (the 3·MAD threshold is itself a heuristic).
    */
  def anomalyMad(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val med = c.agg(expr("percentile(cents, 0.5D)").as("med"))
    val dev = c.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = dev.agg(expr("percentile(dev, 0.5D)").as("mad"))
    dev.crossJoin(broadcast(mad))
      .filter(col("dev") > lit(3) * col("mad"))
      .select(col("event_id"), col("user_id"), col("cents"), col("dev"))
      .orderBy(col("dev").desc, col("event_id"))
      .limit(100)
  }

  val anomalyMadSql: String =
    """WITH c AS (
      |  SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT quantile_cont(cents, 0.5) AS med FROM c),
      |d AS (SELECT event_id, user_id, cents, abs(cents - med) AS dev
      |  FROM c, m),
      |md AS (SELECT quantile_cont(dev, 0.5) AS mad FROM d)
      |SELECT event_id, user_id, cents, dev
      |FROM d, md WHERE dev > 3 * mad
      |ORDER BY dev DESC, event_id LIMIT 100""".stripMargin

  /** Time-weighted average purchase value per user: each purchase is
    * weighted by the seconds until the user's next purchase (last one
    * carries no weight — its holding interval is unknown). One user_id
    * shuffle for the lead window; weights stay in exact long seconds
    * (µs div 1e6 — µs-weighted products would overflow int64 over long
    * horizons) and the TWAP is one double ratio of exact longs.
    */
  def timeWeightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
      .filter(col("next_ts").isNotNull)
      .select(col("user_id"),
        // unix_micros needs LTZ; NTZ→LTZ is the identity under the UTC session
        expr("(unix_micros(cast(next_ts as timestamp)) - " +
          "unix_micros(cast(ts as timestamp))) div 1000000").as("dur_s"),
        col("cents"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dur_s")).as("total_s"),
        sum(col("cents") * col("dur_s")).as("wsum"))
      .filter(col("total_s") > 0)
      .select(col("user_id"), col("n_intervals"), col("total_s"),
        (col("wsum").cast("double") / col("total_s").cast("double")).as("twap_cents"))
      .orderBy(col("user_id"))
  }

  val timeWeightedAvgSql: String =
    """WITH p AS (
      |  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |iv AS (
      |  SELECT user_id, cents,
      |    (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000000 AS dur_s
      |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |agg AS (
      |  SELECT user_id, count(*) AS n_intervals,
      |    CAST(sum(dur_s) AS BIGINT) AS total_s,
      |    CAST(sum(cents * dur_s) AS BIGINT) AS wsum
      |  FROM iv WHERE dur_s IS NOT NULL GROUP BY 1)
      |SELECT user_id, n_intervals, total_s,
      |  CAST(wsum AS DOUBLE) / CAST(total_s AS DOUBLE) AS twap_cents
      |FROM agg WHERE total_s > 0 ORDER BY user_id""".stripMargin

  /** Compaction planner: packs documents (in doc_id order) into
    * target-sized output bins by their exact byte start-offset — the
    * "small-files problem" planner every lakehouse table needs. The prefix
    * sum is the scalable TWO-PASS form: per-block partials (one shuffle
    * over ~n/100 blocks), a running offset over the tiny block table, and
    * a broadcast join back — never a single-task global window over raw
    * rows. The DuckDB oracle computes the same offsets with a flat window,
    * proving the decomposition exact.
    */
  def compactionBins(spark: SparkSession, sfDir: String): DataFrame = {
    val target = 8192L
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), expr("doc_id div 100").as("blk"))
    val inBlk = Window.partitionBy(col("blk"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, 0)
    val blkSums = docs.groupBy(col("blk")).agg(sum(col("n_chars")).as("bsum"))
    val prevBlks = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blkSums
      .withColumn("offset", coalesce(sum(col("bsum")).over(prevBlks), lit(0L)))
      .select(col("blk"), col("offset"))
    docs
      .withColumn("cum_in", sum(col("n_chars")).over(inBlk))
      .join(broadcast(offsets), Seq("blk"))
      .select(col("doc_id"), col("n_chars"),
        (col("offset") + col("cum_in") - col("n_chars")).as("start"))
      .select(expr(s"start div $target").as("bin"),
        col("doc_id"), col("n_chars"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("bin"))
  }

  val compactionBinsSql: String =
    """WITH c AS (
      |  SELECT doc_id, n_chars,
      |    COALESCE(sum(n_chars) OVER (
      |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0) AS start
      |  FROM documents)
      |SELECT CAST(start AS BIGINT) // 8192 AS bin, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
}
