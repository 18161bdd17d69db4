package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Checkpoints.StableCheckpoint
import graft.Tables

/** Round-5 analytics additions, batch 2: frequency-based label
  * propagation, Pareto/ABC classification, Gini-impurity profiling,
  * gaps-and-islands streaks, lead–lag cross-correlation and seasonal
  * naive forecast error.
  *
  * Same cross-engine exactness discipline as [[StatsFifth]]: integer
  * moments (cents / counts), DECIMAL widening before a 64-bit product
  * can wrap at 100 TB, one final double expression with identical
  * association in both engines, and global windows only over aggregated
  * bounded domains (bins / days / cells), never raw rows.
  */
object AnalyticsFifth {

  // ------------------------------------------------- label propagation

  /** Frequency-based label propagation on the bipartite customer–part
    * purchase graph — the community primitive that, unlike the min-label
    * connected components in [[graft.text.Dedup]], updates each node to
    * the MODE of its neighbors' labels (tiebreak: smallest label), so
    * dense co-purchase clusters pull members in even when the graph is
    * one big connected component.
    *
    * Three alternating semi-synchronous rounds (parts ← customers ←
    * parts), labels initialized to customer ids; round 1's mode
    * degenerates to min (all initial labels distinct — documented LPA
    * bootstrap), rounds 2–3 are genuine frequency votes. Emits the
    * top-20 communities by member count.
    *
    * Scale shape: each round is one keyed aggregation + one keyed
    * row_number window over |E| edge rows (WindowGroupLimit pushes the
    * rank-1 filter map-side); the edge list is ONE lazy plan — AQE
    * materializes the numbered p-repartition once and every round's
    * reference re-reads that exchange (no checkpoint: a checkpointed
    * LogicalRDD reports UnknownPartitioning and forces a re-shuffle per
    * reference — the r14 ×1000 finding).
    * The oracle unrolls the rounds as MATERIALIZED CTEs (DuckDB inlines
    * CTEs otherwise — the documented O(k^N) blowup).
    */
  def labelPropagation(spark: SparkSession, sfDir: String): DataFrame = {
    // NUMBERED repartition: gives the shared edge exchange a reported
    // p-hash partitioning at full width, so each round's map-side
    // partial aggregation starts from nPart co-partitioned tasks (the
    // distinct alone would AQE-coalesce to 2-3 partitions at gate scale
    // and every round would inherit that width)
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Lazy, no checkpoint (the pagerank r14 treatment): the checkpointed
    // LogicalRDD reported UnknownPartitioning, so all four downstream
    // references re-shuffled the full edge list (~5 GB each at ×1000,
    // 1143 s total). Lazy + not-null hygiene keeps the references
    // canonically equal, so AQE materializes the numbered p-repartition
    // once and re-reads it; the p-keyed mode aggregates consume it
    // co-partitioned with no further exchange.
    val edges = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .filter(col("c").isNotNull && col("p").isNotNull)
      .distinct()
      .repartition(nPart, col("p"))

    // mode(label) per key with deterministic smallest-label tiebreak.
    // max_by over the strictly-unique ordering struct (cnt, −label)
    // replaces the old row_number window: same winner by construction
    // (labels are distinct within a key after the count groupBy, and
    // positive, so −label never overflows), but a partial-aggregable
    // DeclarativeAggregate instead of a full per-key SORT per round —
    // four rounds of WindowExec over the ~240k-row count relation gone.
    def modeOf(df: DataFrame, key: String, label: String, out: String): DataFrame =
      df.groupBy(col(key), col(label)).agg(count(lit(1)).as("cnt"))
        .groupBy(col(key))
        .agg(max_by(col(label),
          struct(col("cnt"), (-col(label)).as("neg"))).as(out))

    val pl1 = modeOf(edges.select(col("p"), col("c").as("lbl")), "p", "lbl", "pl1")
    val cl1 = modeOf(edges.join(pl1, "p").select(col("c"), col("pl1").as("lbl")),
      "c", "lbl", "cl1")
    val pl2 = modeOf(edges.join(cl1, "c").select(col("p"), col("cl1").as("lbl")),
      "p", "lbl", "pl2")
    edges.join(pl2, "p").select(col("c"), col("pl2")).distinct()
      .groupBy(col("pl2").as("community"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("community"))
      .limit(20)
  }

  val labelPropagationSql: String =
    """WITH edges AS MATERIALIZED (
      |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |pl1 AS MATERIALIZED (
      |  SELECT p, lbl AS pl1 FROM (
      |    SELECT p, c AS lbl, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY p ORDER BY count(*) DESC, c) AS rn
      |    FROM edges GROUP BY p, c)
      |  WHERE rn = 1),
      |cl1 AS MATERIALIZED (
      |  SELECT c, lbl AS cl1 FROM (
      |    SELECT e.c, pl1 AS lbl, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY e.c
      |        ORDER BY count(*) DESC, pl1) AS rn
      |    FROM edges e JOIN pl1 USING (p) GROUP BY e.c, pl1)
      |  WHERE rn = 1),
      |pl2 AS MATERIALIZED (
      |  SELECT p, lbl AS pl2 FROM (
      |    SELECT e.p, cl1 AS lbl, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY e.p
      |        ORDER BY count(*) DESC, cl1) AS rn
      |    FROM edges e JOIN cl1 USING (c) GROUP BY e.p, cl1)
      |  WHERE rn = 1)
      |SELECT pl2 AS community, CAST(count(*) AS BIGINT) AS n_members
      |FROM (SELECT DISTINCT e.c, pl2 FROM edges e JOIN pl2 USING (p))
      |GROUP BY pl2
      |ORDER BY n_members DESC, community
      |LIMIT 20""".stripMargin

  // ------------------------------------------------------- pareto / ABC

  /** Pareto/ABC inventory classification of parts by lineitem revenue:
    * class A = parts carrying the first 80% of cumulative revenue
    * (descending), B = next 15%, C = the tail — emitted as 3 summary
    * rows (class, n_parts, revenue_cents, share).
    *
    * Exact ABC needs every part globally ranked by revenue; like
    * [[StatsFifth.lorenzGini]] this derives the cut from a 1000-bin
    * revenue HISTOGRAM instead (bin width from a broadcast min/max
    * scalar), so the cumulative walk orders ≤1000 aggregated bins, never
    * |parts| rows, and all parts in a bin share a class (binned
    * boundary, ≤1/1000 of the revenue range — documented). The A/B
    * thresholds are INTEGER comparisons (`100·cum_prev < 80·S`, widened
    * to DECIMAL/HUGEINT — cum·100 wraps a long at 100 TB); the one
    * double is the final `revenue / S` share.
    */
  def paretoAbcParts(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
    val mm = rev.agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    val bins = rev.crossJoin(broadcast(mm))
      .select(expr("((cents - mn) * 1000) div (mx - mn + 1)").as("bin"),
        col("cents"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("s_cents"))
    // cumulative walk over ≤1000 bins, richest bin first — bounded domain
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    bins
      .withColumn("cum_s", sum(col("s_cents")).over(w))
      .withColumn("s_tot", sum(col("s_cents")).over(tot))
      .withColumn("cum_prev",
        expr("cast(cum_s - s_cents as decimal(38,0))"))
      .withColumn("abc_class",
        when(col("cum_prev") * 100 < expr("cast(s_tot as decimal(38,0))") * 80, "A")
          .when(col("cum_prev") * 100 < expr("cast(s_tot as decimal(38,0))") * 95, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(sum(col("n_parts")).as("n_parts"),
        sum(col("s_cents")).as("revenue_cents"),
        max(col("s_tot")).as("s_tot"))
      .select(col("abc_class"), col("n_parts"), col("revenue_cents"),
        (col("revenue_cents").cast("double") / col("s_tot").cast("double"))
          .as("share"))
      .orderBy(col("abc_class"))
  }

  val paretoAbcPartsSql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM lineitem GROUP BY l_partkey),
      |mm AS (SELECT min(cents) AS mn, max(cents) AS mx FROM rev),
      |b AS (
      |  SELECT ((cents - mn) * 1000) // (mx - mn + 1) AS bin, cents
      |  FROM rev, mm),
      |g AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS n_parts,
      |    CAST(sum(cents) AS BIGINT) AS s_cents
      |  FROM b GROUP BY bin),
      |c AS (
      |  SELECT bin, n_parts, s_cents,
      |    CAST(sum(s_cents) OVER (ORDER BY bin DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_s,
      |    CAST(sum(s_cents) OVER () AS BIGINT) AS s_tot
      |  FROM g),
      |k AS (
      |  SELECT n_parts, s_cents, s_tot,
      |    CASE
      |      WHEN CAST(cum_s - s_cents AS HUGEINT) * 100
      |        < CAST(s_tot AS HUGEINT) * 80 THEN 'A'
      |      WHEN CAST(cum_s - s_cents AS HUGEINT) * 100
      |        < CAST(s_tot AS HUGEINT) * 95 THEN 'B'
      |      ELSE 'C' END AS abc_class
      |  FROM c)
      |SELECT abc_class, CAST(sum(n_parts) AS BIGINT) AS n_parts,
      |  CAST(sum(s_cents) AS BIGINT) AS revenue_cents,
      |  CAST(sum(s_cents) AS DOUBLE) / CAST(max(s_tot) AS DOUBLE) AS share
      |FROM k
      |GROUP BY abc_class
      |ORDER BY abc_class""".stripMargin

  // -------------------------------------------------- impurity profiling

  /** Gini impurity of each source's language mix over the documents
    * table — the ln-free concentration profile (`1 − Σ p_l²`) a corpus
    * curator reads before balancing a multilingual mixture. Entropy
    * would need cross-engine `ln`; the impurity is exact: Σ n_l² widens
    * to DECIMAL (n_l ~ 10¹² at 100 TB squares past long) and the one
    * double is `1 − q/(N·N)`. One aggregation per (source, lang) cell
    * (bounded: 20 × 5), one fold per source.
    */
  def impurityBySource(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_langs"),
        sum(expr("cast(n as decimal(19,0)) * cast(n as decimal(19,0))")).as("q"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        (lit(1.0d) - (col("q").cast("double") /
          (col("n_docs").cast("double") * col("n_docs").cast("double"))))
          .as("impurity"))
      .orderBy(col("source"))

  val impurityBySourceSql: String =
    """WITH cells AS (
      |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY source, lang)
      |SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_langs,
      |  CAST(1 AS DOUBLE)
      |    - CAST(sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS DOUBLE)
      |      / (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) AS impurity
      |FROM cells
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --------------------------------------------------- activity islands

  /** Gaps-and-islands: each user's longest streak of CONSECUTIVE active
    * days — the classic `day − row_number()` anchor trick, entirely in
    * per-user keyed windows (the partition key is user_id, so the sort
    * distributes; no global window anywhere). Emits the top-20 streaks
    * (ties broken by user, then start day) via TakeOrderedAndProject.
    */
  def activityIslands(spark: SparkSession, sfDir: String): DataFrame = {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("streak_days"), min(col("day")).as("start_day"))
      .orderBy(col("streak_days").desc, col("user_id"), col("start_day"))
      .limit(20)
      .select(col("user_id"), col("start_day"), col("streak_days"))
  }

  val activityIslandsSql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |r AS (
      |  SELECT user_id, day,
      |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS INTEGER) AS anchor
      |  FROM d),
      |s AS (
      |  SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS streak_days,
      |    min(day) AS start_day
      |  FROM r GROUP BY user_id, anchor)
      |SELECT user_id, start_day, streak_days
      |FROM s
      |ORDER BY streak_days DESC, user_id, start_day
      |LIMIT 20""".stripMargin

  // ----------------------------------------------- cross-correlation

  /** Lead–lag cross-correlation between daily VIEW counts and daily
    * PURCHASE counts at lags −7..+7 — the "do views today predict
    * purchases in k days" diagnostic. Positive lag correlates views on
    * day d with purchases on day d+lag. Pearson r from EXACT integer
    * moments per lag (counts, so no cents scaling needed; Σxy ~ 10¹⁸ at
    * 100 TB per-day counts → DECIMAL), the identical
    * `(n·Σxy − Σx·Σy) / (√(n·Σxx−Σx²)·√(n·Σyy−Σy²))` one-double recipe
    * as `acf_daily_revenue`. Two daily rollups, a 15-row broadcast lag
    * grid, one keyed join.
    */
  def xcorrViewPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def daily(t: String, cn: String): DataFrame = ev
      .filter(col("event_type") === t)
      .groupBy(to_date(col("ts")).as(s"day_$cn"))
      .agg(count(lit(1)).as(cn))
    val v = daily("view", "x")
    val p = daily("purchase", "y")
    val lags = spark.range(-7, 8).select(col("id").as("lag"))
    v.crossJoin(broadcast(lags))
      .join(p, expr("day_y = date_add(day_x, cast(lag as int))"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("cast(x as decimal(19,0)) * cast(y as decimal(19,0))")).as("sxy"),
        sum(expr("cast(x as decimal(19,0)) * cast(x as decimal(19,0))")).as("sxx"),
        sum(expr("cast(y as decimal(19,0)) * cast(y as decimal(19,0))")).as("syy"))
      .withColumn("xcorr",
        expr("(cast(n as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double))" +
          " / (sqrt(cast(n as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double))" +
          " * sqrt(cast(n as double) * cast(syy as double)" +
          " - cast(sy as double) * cast(sy as double)))"))
      .select(col("lag"), col("n"), col("xcorr"))
      .orderBy(col("lag"))
  }

  val xcorrViewPurchaseSql: String =
    """WITH v AS (
      |  SELECT CAST(ts AS DATE) AS day_x, CAST(count(*) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'view' GROUP BY day_x),
      |p AS (
      |  SELECT CAST(ts AS DATE) AS day_y, CAST(count(*) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY day_y),
      |j AS (
      |  SELECT l.lag, v.x, p.y
      |  FROM v CROSS JOIN (SELECT unnest(range(-7, 8)) AS lag) l
      |  JOIN p ON p.day_y = v.day_x + CAST(l.lag AS INTEGER)),
      |m AS (
      |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
      |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
      |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
      |  FROM j GROUP BY lag)
      |SELECT lag, n,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS xcorr
      |FROM m
      |ORDER BY lag""".stripMargin

  // ------------------------------------------------------ forecast error

  /** Seasonal naive forecast error: the ratio of the weekly-naive
    * (x_{t−7}) to the daily-naive (x_{t−1}) sum of absolute errors on
    * daily purchase revenue — the scale-free "is there weekly structure
    * worth modeling" gauge (a ratio < 1 says last-week beats yesterday
    * as a predictor; the MASE building block). Calendar-correct: lags
    * come from keyed joins on `day − 1` / `day − 7` (not row-offset
    * lag(), which silently slips across date gaps), restricted to days
    * where BOTH references exist so the two error sums cover the same
    * domain. All sums are integer cents; the one double is the final
    * `sae7 / sae1` ratio.
    */
  def maseWeeklyNaive(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("x"))
    d.join(d.select(col("day").as("d1"), col("x").as("x1")),
        expr("d1 = date_sub(day, 1)"))
      .join(d.select(col("day").as("d7"), col("x").as("x7")),
        expr("d7 = date_sub(day, 7)"))
      .agg(count(lit(1)).as("n"),
        sum(abs(col("x") - col("x1"))).as("sae1"),
        sum(abs(col("x") - col("x7"))).as("sae7"))
      .select(col("n"), col("sae1"), col("sae7"),
        (col("sae7").cast("double") / col("sae1").cast("double"))
          .as("mase_ratio"))
  }

  val maseWeeklyNaiveSql: String =
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'purchase' GROUP BY day)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(abs(a.x - b.x)) AS BIGINT) AS sae1,
      |  CAST(sum(abs(a.x - c.x)) AS BIGINT) AS sae7,
      |  CAST(sum(abs(a.x - c.x)) AS DOUBLE) / CAST(sum(abs(a.x - b.x)) AS DOUBLE)
      |    AS mase_ratio
      |FROM d a
      |JOIN d b ON b.day = a.day - 1
      |JOIN d c ON c.day = a.day - 7""".stripMargin
}
