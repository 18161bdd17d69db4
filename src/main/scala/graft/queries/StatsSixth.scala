package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Checkpoints.StableCheckpoint
import graft.functions.BloomFilterAggregator
import graft.text.{Dedup, TextFunctions}

/** Round-5 batch 6 statistics / graph / sketch-audit additions:
  * Mann-Whitney rank-sum (nonparametric two-sample location test),
  * Kendall's tau-a over the daily revenue/volume series, degree
  * assortativity of the co-purchase graph, and an observed-vs-bound
  * false-positive-rate audit of the Bloom-filter aggregator.
  *
  * Conventions as everywhere in the repo: money in integer cents,
  * products widened to DECIMAL before they can wrap a 64-bit long at
  * 100 TB, doubles only in ONE final expression with identical operand
  * association in both engines, and global windows only over PROVABLY
  * BOUNDED domains.
  */
object StatsSixth {

  // ------------------------------------------------------- mann-whitney

  /** Mann-Whitney U ("do urgent orders carry different value than
    * routine ones?") computed WITHOUT ranking individual rows: a global
    * rank over |orders| rows is the single-partition-sort scale-killer,
    * so the statistic is assembled from the VALUE HISTOGRAM instead.
    * Group by distinct price cents (domain bounded by the fixed price
    * range, NOT by row count — same argument as `skyline_parts`), then
    * one bounded-domain window gives, per value v, the count of B-rows
    * strictly below v; the tie-aware identity
    * `2·U_A = Σ_v n_a(v)·(2·cum_b(<v) + n_b(v))`
    * keeps everything integer (ties contribute half — hence the 2×).
    * `n_a·n_b` reaches ~10²⁴ at 100 TB so the terms are formed in
    * DECIMAL; outputs are cast back to BIGINT (exact at gate scale;
    * widen the output type with the data). The ONE double expression is
    * the rank-biserial effect size `u2_a/(n_a·n_b) − 1`.
    */
  def mannWhitneyU(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("in_a"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val byVal = o.groupBy(col("cents"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("nb"))
    // Window over distinct cents values — a bounded domain (price range
    // is fixed), never raw order rows.
    val w = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byVal
      .withColumn("cum_b", coalesce(sum(col("nb")).over(w), lit(0L)))
      .select(col("na"), col("nb"),
        (expr("cast(na as decimal(38,0))") *
          (lit(2) * expr("cast(cum_b as decimal(38,0))") +
            expr("cast(nb as decimal(38,0))"))).as("u2_term"))
      .agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
        sum(col("u2_term")).as("u2d"))
      .select(col("n_a"), col("n_b"),
        col("u2d").cast("long").as("u2_a"),
        (expr("2 * cast(n_a as decimal(38,0)) * cast(n_b as decimal(38,0))")
          - col("u2d")).cast("long").as("u2_b"),
        (col("u2d").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))
          - lit(1.0d)).as("rank_biserial"))
  }

  val mannWhitneyUSql: String =
    """WITH v AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS in_a
      |  FROM orders),
      |h AS (
      |  SELECT cents,
      |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
      |  FROM v GROUP BY cents),
      |c AS (
      |  SELECT na, nb,
      |    COALESCE(CAST(sum(nb) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS cum_b
      |  FROM h),
      |s AS (
      |  SELECT CAST(sum(na) AS BIGINT) AS n_a,
      |    CAST(sum(nb) AS BIGINT) AS n_b,
      |    sum(CAST(na AS HUGEINT)
      |      * (2 * CAST(cum_b AS HUGEINT) + CAST(nb AS HUGEINT))) AS u2d
      |  FROM c)
      |SELECT n_a, n_b, CAST(u2d AS BIGINT) AS u2_a,
      |  CAST(2 * CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) - u2d
      |    AS BIGINT) AS u2_b,
      |  CAST(u2d AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
      |    - CAST(1.0 AS DOUBLE) AS rank_biserial
      |FROM s""".stripMargin

  // ------------------------------------------------------- kendall tau

  /** Kendall's tau-a between daily revenue and daily order volume — "do
    * busier days bring proportionally bigger money?" as a rank
    * correlation that needs NO ranks: concordant/discordant pair counts
    * are pure integer comparisons. The pairwise self-join is quadratic
    * in DAYS, a calendar-bounded domain (~2.4k rows over the TPC-H date
    * range) that does not grow with row count, so the day table
    * broadcasts and the pair generation is a map-only nested loop —
    * never a pairwise join over raw orders. tau_a = (C − D) / (n·(n−1)/2)
    * is the one final double division.
    */
  def kendallTauDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"),
        count(lit(1)).as("cnt"))
    val a = daily.select(col("d").as("d1"), col("rev").as("r1"),
      col("cnt").as("c1"))
    val b = daily.select(col("d").as("d2"), col("rev").as("r2"),
      col("cnt").as("c2"))
    a.crossJoin(broadcast(b)).filter(col("d1") < col("d2"))
      .agg(
        sum(when((col("r1") < col("r2") && col("c1") < col("c2")) ||
          (col("r1") > col("r2") && col("c1") > col("c2")), 1L)
          .otherwise(0L)).as("concordant"),
        sum(when((col("r1") < col("r2") && col("c1") > col("c2")) ||
          (col("r1") > col("r2") && col("c1") < col("c2")), 1L)
          .otherwise(0L)).as("discordant"),
        sum(when(col("r1") === col("r2") || col("c1") === col("c2"), 1L)
          .otherwise(0L)).as("tied_pairs"),
        count(lit(1)).as("n_pairs"))
      .select(col("concordant"), col("discordant"), col("tied_pairs"),
        col("n_pairs"),
        ((col("concordant") - col("discordant")).cast("double") /
          col("n_pairs").cast("double")).as("tau_a"))
  }

  val kendallTauDailySql: String =
    """WITH daily AS (
      |  SELECT o_orderdate AS d,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY o_orderdate)
      |SELECT
      |  CAST(sum(CASE WHEN (a.rev < b.rev AND a.cnt < b.cnt)
      |    OR (a.rev > b.rev AND a.cnt > b.cnt) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS concordant,
      |  CAST(sum(CASE WHEN (a.rev < b.rev AND a.cnt > b.cnt)
      |    OR (a.rev > b.rev AND a.cnt < b.cnt) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS discordant,
      |  CAST(sum(CASE WHEN a.rev = b.rev OR a.cnt = b.cnt THEN 1 ELSE 0 END)
      |    AS BIGINT) AS tied_pairs,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(CASE WHEN (a.rev < b.rev AND a.cnt < b.cnt)
      |      OR (a.rev > b.rev AND a.cnt > b.cnt) THEN 1 ELSE 0 END)
      |    - sum(CASE WHEN (a.rev < b.rev AND a.cnt > b.cnt)
      |      OR (a.rev > b.rev AND a.cnt < b.cnt) THEN 1 ELSE 0 END)
      |    AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS tau_a
      |FROM daily a JOIN daily b ON a.d < b.d""".stripMargin

  // -------------------------------------------------------- assortativity

  /** Degree assortativity of the co-purchase graph — "do popular parts
    * co-sell with other popular parts, or with the long tail?" Edges are
    * distinct part pairs sharing an order (same hot-basket 64-item cap
    * as `market_basket_lift`, mirrored verbatim in the oracle). Degrees
    * come from the edge list itself; the edge↔degree joins are keyed
    * shuffle joins (the part catalog grows with the data — never assume
    * it broadcasts). The Pearson correlation over symmetrized edge
    * endpoints reduces to integer moments (Σx, Σxy, Σx², with x ≡ y by
    * symmetry), formed in DECIMAL because deg·deg sums reach ~10²⁰ at
    * catalog scale; `r = (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²)` is the one
    * double expression.
    */
  def graphAssortativity(spark: SparkSession, sfDir: String): DataFrame = {
    // pair generation via the shared collect_set + sorted_pairs codegen
    // kernel (see [[graft.queries.GraphMore.orderPairs]]); the 64-item
    // basket cap rides the expression's cap argument (smallest-64,
    // exactly the old keyed row_number guard), and the kernel keeps the
    // NUMBERED ok repartition that pins the pair explosion at full
    // parallelism (the copurchase fan-out pathology)
    val edges = graft.queries.GraphMore.orderPairs(spark, sfDir, cap = 64)
      .distinct()
      .stableCheckpoint() // reused: degree counts + both join probes
    val deg = edges.select(col("pa").as("node"))
      .union(edges.select(col("pb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // scale-conditional SHUFFLE_HASH on the Θ(V) degree sides (gated on
    // the depth-threshold leaf mass, see GraphMore.joinsBig): above the
    // threshold the sorted_pairs build's fan-out-blind estimates would
    // otherwise flip these to static broadcasts of the degree table;
    // below it the planner's broadcast is bounded and measured faster
    val big = graft.queries.GraphMore.joinsBig(spark, sfDir)
    val withDeg = edges
      .join(graft.queries.GraphMore.shj(deg.toDF("pa", "da"), big), Seq("pa"))
      .join(graft.queries.GraphMore.shj(deg.toDF("pb", "db"), big), Seq("pb"))
    // Symmetrize: each undirected edge contributes (da,db) and (db,da).
    val sym = withDeg.select(col("da").as("x"), col("db").as("y"))
      .union(withDeg.select(col("db").as("x"), col("da").as("y")))
    sym.agg(count(lit(1)).as("m"),
      sum(expr("cast(x as decimal(38,0))")).as("sx"),
      sum(expr("cast(x as decimal(38,0)) * cast(y as decimal(38,0))"))
        .as("sxy"),
      sum(expr("cast(x as decimal(38,0)) * cast(x as decimal(38,0))"))
        .as("sx2"))
      .select(col("m"), col("sx").cast("long").as("sum_deg"),
        ((col("m").cast("decimal(38,0)") * col("sxy")
          - col("sx") * col("sx")).cast("double") /
          (col("m").cast("decimal(38,0)") * col("sx2")
            - col("sx") * col("sx")).cast("double")).as("assortativity"))
  }

  val graphAssortativitySql: String =
    """WITH it AS (
      |  SELECT ok, pk FROM (
      |    SELECT l_orderkey AS ok, l_partkey AS pk,
      |      row_number() OVER (PARTITION BY l_orderkey
      |        ORDER BY l_partkey) AS rn
      |    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
      |  WHERE rn <= 64),
      |e AS (
      |  SELECT DISTINCT a.pk AS pa, b.pk AS pb
      |  FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
      |d AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e)
      |  GROUP BY node),
      |wd AS (
      |  SELECT da.deg AS dx, db.deg AS dy
      |  FROM e JOIN d da ON e.pa = da.node JOIN d db ON e.pb = db.node),
      |sym AS (
      |  SELECT dx AS x, dy AS y FROM wd
      |  UNION ALL SELECT dy AS x, dx AS y FROM wd),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    sum(CAST(x AS HUGEINT)) AS sx,
      |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
      |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sx2
      |  FROM sym)
      |SELECT m, CAST(sx AS BIGINT) AS sum_deg,
      |  CAST(CAST(m AS HUGEINT) * sxy - sx * sx AS DOUBLE)
      |    / CAST(CAST(m AS HUGEINT) * sx2 - sx * sx AS DOUBLE)
      |    AS assortativity
      |FROM s""".stripMargin

  // ----------------------------------------------------- bloom fpr audit

  /** Observed-vs-theoretical false-positive-rate audit of the Bloom
    * aggregator: build the filter over the eval slice's distinct 5-gram
    * set (same slice as `decontaminate_bloom`), probe the grams that are
    * PROVABLY absent (exact anti-join), and assert the observed FP count
    * is within 2× the analytic bound `(1 − e^(−k·n/m))^k` (k = 2 double
    * hashing, m = 2²⁰ bits) plus small-count slack. The oracle computes
    * the exact set sizes and supplies the expected all-true verdict — a
    * hash-quality regression in [[BloomFilterAggregator]] flips the
    * boolean and fails the gate. The probe side is one broadcast of the
    * 128 KiB bitset onto a map-only scan; nothing pairs.
    */
  def bloomFprAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val numBits = 1 << 20
    // Materialized once: the tokenize+ngram+explode pass feeds the eval
    // set, the bloom build and the probe side.
    val grams = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      // NUMBERED repartition: spread the tokenize+ngram explosion off
      // the single-partition scan before the checkpoint freezes layout
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("doc_id"))
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(Dedup.ngramSetOfTokens(col("toks"), 5)).as("g"))
      .stableCheckpoint()
    val ev = grams.filter(col("doc_id") % 89 === 0).select(col("g")).distinct()
      .stableCheckpoint() // bloom build + exact anti-join probe filter
    val probes = grams.filter(col("doc_id") % 89 =!= 0)
      .select(col("g")).distinct()
      .join(ev, Seq("g"), "left_anti") // provably-absent probes only
    val evAgg = ev.agg(count(lit(1)).as("n_items"),
      BloomFilterAggregator.bloomBuild(numBits)(col("g")).as("bloom"))
    val h1 = s"cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint) % $numBits"
    val h2 = s"cast(conv(substring(md5(g), 17, 15), 16, 10) as bigint) % $numBits"
    def hit(h: String): String =
      s"(shiftright(element_at(bloom, cast(($h) div 64 as int) + 1)," +
        s" cast(($h) % 64 as int)) & 1) = 1"
    probes.crossJoin(broadcast(evAgg))
      .select(col("n_items"),
        (expr(hit(h1)) && expr(hit(h2))).cast("long").as("fp"))
      .groupBy(col("n_items"))
      .agg(count(lit(1)).as("n_probes"), sum(col("fp")).as("observed_fp"))
      .select(col("n_items"), col("n_probes"),
        (col("observed_fp").cast("double") <=
          lit(2.0d) * pow(lit(1.0d) -
            exp(lit(-2.0d) * col("n_items").cast("double") /
              lit(numBits.toDouble)), lit(2.0d)) *
            col("n_probes").cast("double") + lit(10.0d))
          .as("within_bound"))
  }

  val bloomFprAuditSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([array_to_string(t[i:i+4], ' ')
      |      for i in range(1, greatest(len(t) - 4, 1) + 1)])) AS g
      |  FROM toks),
      |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 89 = 0),
      |pr AS (
      |  SELECT DISTINCT g FROM grams
      |  WHERE doc_id % 89 <> 0 AND g NOT IN (SELECT g FROM ev))
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_items,
      |  (SELECT CAST(count(*) AS BIGINT) FROM pr) AS n_probes,
      |  TRUE AS within_bound""".stripMargin

  // ------------------------------------------------- bootstrap CI (mean)

  /** Deterministic hash bootstrap CI for the mean purchase value — the
    * Poisson-bootstrap shape (each row decides membership per replicate
    * from a hash, so resampling is ONE map-only pass with multiplicity
    * B, no per-replicate shuffles of the raw data): replicate b keeps a
    * row iff md5(event_id:b) mod 2 = 0 (an m-out-of-n bootstrap with
    * m ≈ n/2), each replicate's mean is one exact-cents division, and
    * the CI bounds are rank-picked from the B=100 replicate means with
    * the repo's quantile convention — a global window over exactly B
    * rows (constant-bounded domain). Replicate means are doubles from
    * identical single divisions, so their ORDER is cross-engine stable
    * and the picked bounds hash-gate.
    */
  def bootstrapCiMean(spark: SparkSession, sfDir: String): DataFrame = {
    val b = 100
    val reps = spark.range(b.toLong).select(col("id").cast("int").as("b"))
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      // NUMBERED repartition: the one-row-group scan is 1 task, and the
      // 100x resample fan-out with per-row md5 below is the query's cost
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val means = purchases.crossJoin(broadcast(reps))
      .filter(
        expr("cast(conv(substring(md5(concat(cast(event_id as string), ':', cast(b as string))), 1, 15), 16, 10) as bigint) % 2") === 0)
      .groupBy(col("b"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("c"))
      .select(col("b"),
        (col("s").cast("double") / col("c").cast("double")).as("m"))
    // B = 100 rows exactly — constant-bounded global window.
    val ranked = means
      .withColumn("rn", row_number().over(
        Window.orderBy(col("m"), col("b"))))
      .withColumn("n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    def pick(p: String): Column =
      max(when(col("rn") ===
        expr(s"cast(floor(cast($p as double) * cast(n - 1 as double)) as bigint) + 1"),
        col("m")))
    ranked.agg(max(col("n")).as("n_replicates"),
      pick("0.025").as("ci_lo"), pick("0.5").as("ci_median"),
      pick("0.975").as("ci_hi"))
  }

  val bootstrapCiMeanSql: String =
    """WITH reps AS (SELECT unnest(range(100)) AS b),
      |p AS (
      |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |means AS (
      |  SELECT b,
      |    CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
      |  FROM p, reps
      |  WHERE ('0x' || substr(md5(event_id::VARCHAR || ':' || b::VARCHAR),
      |      1, 15))::BIGINT % 2 = 0
      |  GROUP BY b),
      |r AS (
      |  SELECT m, row_number() OVER (ORDER BY m, b) AS rn,
      |    count(*) OVER () AS n
      |  FROM means)
      |SELECT CAST(max(n) AS BIGINT) AS n_replicates,
      |  max(CASE WHEN rn = CAST(floor(CAST(0.025 AS DOUBLE)
      |    * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN m END) AS ci_lo,
      |  max(CASE WHEN rn = CAST(floor(CAST(0.5 AS DOUBLE)
      |    * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN m END) AS ci_median,
      |  max(CASE WHEN rn = CAST(floor(CAST(0.975 AS DOUBLE)
      |    * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN m END) AS ci_hi
      |FROM r""".stripMargin

  // -------------------------------------------- repeat purchase interval

  /** Distribution of the gap (days) between a user's consecutive
    * purchases — the repurchase-cadence histogram behind retention and
    * replenishment models. One keyed window per user (shuffles once on
    * user_id, the natural key), integer day gaps, then a 7-bucket fixed
    * histogram — no global ordering anywhere, all integer output.
    */
  def repeatPurchaseInterval(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), col("prev_ts").cast("date"))
          .cast("long").as("gap"))
      .select(col("user_id"),
        when(col("gap") === 0, 0L).when(col("gap") === 1, 1L)
          .when(col("gap") <= 3, 2L).when(col("gap") <= 7, 3L)
          .when(col("gap") <= 14, 4L).when(col("gap") <= 30, 5L)
          .otherwise(6L).as("bucket_order"))
      .groupBy(col("bucket_order"))
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("gap_bucket",
        element_at(typedLit(Seq("0d", "1d", "2-3d", "4-7d", "8-14d",
          "15-30d", "31d+")), col("bucket_order").cast("int") + 1))
      .select(col("gap_bucket"), col("bucket_order"), col("n_gaps"),
        col("n_users"))
      .orderBy(col("bucket_order"))
  }

  val repeatPurchaseIntervalSql: String =
    """WITH p AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_ts
      |  FROM events WHERE event_type = 'purchase'),
      |g AS (
      |  SELECT user_id,
      |    CASE
      |      WHEN date_diff('day', CAST(prev_ts AS DATE), CAST(ts AS DATE)) = 0
      |        THEN 0
      |      WHEN date_diff('day', CAST(prev_ts AS DATE), CAST(ts AS DATE)) = 1
      |        THEN 1
      |      WHEN date_diff('day', CAST(prev_ts AS DATE), CAST(ts AS DATE)) <= 3
      |        THEN 2
      |      WHEN date_diff('day', CAST(prev_ts AS DATE), CAST(ts AS DATE)) <= 7
      |        THEN 3
      |      WHEN date_diff('day', CAST(prev_ts AS DATE), CAST(ts AS DATE)) <= 14
      |        THEN 4
      |      WHEN date_diff('day', CAST(prev_ts AS DATE), CAST(ts AS DATE)) <= 30
      |        THEN 5
      |      ELSE 6 END AS bucket_order
      |  FROM p WHERE prev_ts IS NOT NULL)
      |SELECT ['0d', '1d', '2-3d', '4-7d', '8-14d', '15-30d',
      |    '31d+'][CAST(bucket_order AS INTEGER) + 1] AS gap_bucket,
      |  CAST(bucket_order AS BIGINT) AS bucket_order,
      |  CAST(count(*) AS BIGINT) AS n_gaps,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM g
      |GROUP BY bucket_order
      |ORDER BY bucket_order""".stripMargin

  // ---------------------------------------------------------- welch t

  /** Welch's t statistic for the urgent-vs-routine order-value contrast —
    * the parametric companion to [[mannWhitneyU]] (same populations,
    * moment-based instead of rank-based). All sufficient statistics are
    * exact integers (n, Σx, Σx² per group, the squares in DECIMAL —
    * Σx² reaches ~10³⁴ at 100 TB), carried in ONE conditional
    * aggregation pass; the t value and the two group means are the only
    * doubles, each a single fixed-association expression over those
    * integers. Sample variance uses the n−1 divisor:
    * `s² = (n·Σx² − (Σx)²) / (n·(n−1))`.
    */
  def welchTStatistic(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("in_a"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    o.agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("in_a"), col("cents")).otherwise(0L)).as("s_a"),
      sum(when(col("in_a"),
        expr("cast(cents as decimal(38,0)) * cast(cents as decimal(38,0))"))
        .otherwise(expr("cast(0 as decimal(38,0))"))).as("q_a"),
      sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("in_a"), col("cents")).otherwise(0L)).as("s_b"),
      sum(when(!col("in_a"),
        expr("cast(cents as decimal(38,0)) * cast(cents as decimal(38,0))"))
        .otherwise(expr("cast(0 as decimal(38,0))"))).as("q_b"))
      .select(col("n_a"), col("n_b"),
        (col("s_a").cast("double") / col("n_a").cast("double"))
          .as("mean_a_cents"),
        (col("s_b").cast("double") / col("n_b").cast("double"))
          .as("mean_b_cents"),
        // t = (m_a − m_b) / sqrt(s²_a/n_a + s²_b/n_b), one expression
        // with identical association in both engines
        ((col("s_a").cast("double") / col("n_a").cast("double")
          - col("s_b").cast("double") / col("n_b").cast("double")) /
          sqrt(
            ((col("n_a").cast("decimal(38,0)") * col("q_a")
              - col("s_a").cast("decimal(38,0)")
              * col("s_a").cast("decimal(38,0)")).cast("double") /
              (col("n_a").cast("double") * (col("n_a") - 1).cast("double")))
              / col("n_a").cast("double") +
            ((col("n_b").cast("decimal(38,0)") * col("q_b")
              - col("s_b").cast("decimal(38,0)")
              * col("s_b").cast("decimal(38,0)")).cast("double") /
              (col("n_b").cast("double") * (col("n_b") - 1).cast("double")))
              / col("n_b").cast("double"))).as("t_stat"))
  }

  val welchTStatisticSql: String =
    """WITH v AS (
      |  SELECT o_orderpriority IN ('1-URGENT', '2-HIGH') AS in_a,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |s AS (
      |  SELECT
      |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN in_a THEN cents ELSE 0 END) AS BIGINT) AS s_a,
      |    sum(CASE WHEN in_a THEN CAST(cents AS HUGEINT)
      |      * CAST(cents AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS q_a,
      |    CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN in_a THEN 0 ELSE cents END) AS BIGINT) AS s_b,
      |    sum(CASE WHEN in_a THEN CAST(0 AS HUGEINT)
      |      ELSE CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT) END)
      |      AS q_b
      |  FROM v)
      |SELECT n_a, n_b,
      |  CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a_cents,
      |  CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b_cents,
      |  (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |    - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      |  / sqrt(
      |    (CAST(CAST(n_a AS HUGEINT) * q_a
      |        - CAST(s_a AS HUGEINT) * CAST(s_a AS HUGEINT) AS DOUBLE)
      |      / (CAST(n_a AS DOUBLE) * CAST(n_a - 1 AS DOUBLE)))
      |      / CAST(n_a AS DOUBLE)
      |    + (CAST(CAST(n_b AS HUGEINT) * q_b
      |        - CAST(s_b AS HUGEINT) * CAST(s_b AS HUGEINT) AS DOUBLE)
      |      / (CAST(n_b AS DOUBLE) * CAST(n_b - 1 AS DOUBLE)))
      |      / CAST(n_b AS DOUBLE)) AS t_stat
      |FROM s""".stripMargin

  // ------------------------------------------------- capture-recapture

  /** Lincoln–Petersen capture-recapture estimate of the active-user
    * population from two deterministic hash "captures" (disjoint md5
    * buckets of event ids): users seen in capture 1 (n1), capture 2
    * (n2), and both (m) give `N̂ = n1·n2/m` — the mark-recapture
    * estimator a pipeline uses to size a population it can only sample.
    * Membership is map-only hash arithmetic; the overlap is one
    * user-keyed aggregation; n1·n2 widens to DECIMAL; the estimate is
    * the one division. The exact distinct-user count rides along so the
    * estimator's quality is visible in the gated output.
    */
  def captureRecaptureUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val tagged = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("cast(conv(substring(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint) % 10")
          .as("bucket"))
      .select(col("user_id"),
        (col("bucket") < 3).as("in_c1"),
        (col("bucket") >= 3 && col("bucket") < 6).as("in_c2"))
      .groupBy(col("user_id"))
      .agg(max(col("in_c1")).as("c1"), max(col("in_c2")).as("c2"))
    tagged.agg(
      sum(when(col("c1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("c2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("c1") && col("c2"), 1L).otherwise(0L)).as("m"),
      count(lit(1)).as("true_users"))
      .select(col("n1"), col("n2"), col("m"), col("true_users"),
        ((col("n1").cast("decimal(38,0)") * col("n2").cast("decimal(38,0)"))
          .cast("double") / col("m").cast("double")).as("estimated_users"))
  }

  val captureRecaptureUsersSql: String =
    """WITH t AS (
      |  SELECT user_id,
      |    ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT % 10
      |      AS bucket
      |  FROM events),
      |u AS (
      |  SELECT user_id,
      |    max(CASE WHEN bucket < 3 THEN 1 ELSE 0 END) = 1 AS c1,
      |    max(CASE WHEN bucket >= 3 AND bucket < 6 THEN 1 ELSE 0 END) = 1
      |      AS c2
      |  FROM t GROUP BY user_id)
      |SELECT
      |  CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |  CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |  CAST(sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS m,
      |  CAST(count(*) AS BIGINT) AS true_users,
      |  CAST(CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS HUGEINT)
      |    * CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS HUGEINT) AS DOUBLE)
      |    / CAST(sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    AS estimated_users
      |FROM u""".stripMargin

  // ------------------------------------------------ multinomial GoF

  /** Multinomial goodness-of-fit of the event-type mix against the
    * uniform null — "is traffic evenly spread across the 5 types?"
    * Per-cell chi-square contributions from the exact integer identity
    * `(k·n_obs − N)² / (k·N)` over k = 5 cells (same per-cell-row
    * convention as `chi_square_promo_returns`: no cross-cell double
    * sum). Products widen to DECIMAL; the one double per row is the
    * final contribution.
    */
  def eventTypeGof(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_obs"))
    val tot = cells.agg(sum(col("n_obs")).as("n_total"),
      count(lit(1)).as("k"))
    cells.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_obs"),
        ((col("k").cast("decimal(38,0)") * col("n_obs").cast("decimal(38,0)")
          - col("n_total").cast("decimal(38,0)")).cast("double") *
          (col("k").cast("decimal(38,0)") * col("n_obs").cast("decimal(38,0)")
            - col("n_total").cast("decimal(38,0)")).cast("double") /
          (col("k").cast("double") * col("n_total").cast("double")))
          .as("chi2_contrib"))
      .orderBy(col("event_type"))
  }

  val eventTypeGofSql: String =
    """WITH c AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs
      |  FROM events GROUP BY event_type),
      |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total,
      |  CAST(count(*) AS BIGINT) AS k FROM c)
      |SELECT event_type, n_obs,
      |  CAST(CAST(k AS HUGEINT) * CAST(n_obs AS HUGEINT)
      |      - CAST(n_total AS HUGEINT) AS DOUBLE)
      |    * CAST(CAST(k AS HUGEINT) * CAST(n_obs AS HUGEINT)
      |      - CAST(n_total AS HUGEINT) AS DOUBLE)
      |    / (CAST(k AS DOUBLE) * CAST(n_total AS DOUBLE)) AS chi2_contrib
      |FROM c, t
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------- daily metric corr matrix

  /** Pearson correlation matrix over three daily order metrics (revenue
    * cents, order count, distinct customers) — the metric-redundancy
    * audit run before picking KPIs. ONE aggregation pass over the daily
    * table collects every integer moment (sums, squares, cross products
    * — all DECIMAL, Σxy reaches ~10²⁶ at scale), then the three
    * pairwise r values are identical-association double expressions
    * over those integers. The daily table is the calendar-bounded
    * aggregate every series query here shares.
    */
  def dailyMetricCorrMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"),
        count(lit(1)).as("cnt"),
        countDistinct(col("o_custkey")).as("cust"))
    def d(c: String) = expr(s"cast($c as decimal(38,0))")
    val moments = daily.agg(
      count(lit(1)).as("n"),
      sum(d("rev")).as("s_rev"), sum(d("cnt")).as("s_cnt"),
      sum(d("cust")).as("s_cust"),
      sum(d("rev") * d("rev")).as("q_rev"),
      sum(d("cnt") * d("cnt")).as("q_cnt"),
      sum(d("cust") * d("cust")).as("q_cust"),
      sum(d("rev") * d("cnt")).as("x_rev_cnt"),
      sum(d("rev") * d("cust")).as("x_rev_cust"),
      sum(d("cnt") * d("cust")).as("x_cnt_cust"))
    def r(x: String, y: String, sx: String, sy: String, qx: String,
        qy: String, xy: String) =
      ((expr(s"cast(n as decimal(38,0))") * col(xy)
        - col(sx) * col(sy)).cast("double") /
        (sqrt((expr(s"cast(n as decimal(38,0))") * col(qx)
          - col(sx) * col(sx)).cast("double")) *
          sqrt((expr(s"cast(n as decimal(38,0))") * col(qy)
            - col(sy) * col(sy)).cast("double")))).as(s"r_${x}_$y")
    moments.select(col("n").cast("long").as("n_days"),
      r("rev", "cnt", "s_rev", "s_cnt", "q_rev", "q_cnt", "x_rev_cnt"),
      r("rev", "cust", "s_rev", "s_cust", "q_rev", "q_cust", "x_rev_cust"),
      r("cnt", "cust", "s_cnt", "s_cust", "q_cnt", "q_cust", "x_cnt_cust"))
  }

  val dailyMetricCorrMatrixSql: String =
    """WITH daily AS (
      |  SELECT o_orderdate,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev,
      |    CAST(count(*) AS BIGINT) AS cnt,
      |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS cust
      |  FROM orders GROUP BY o_orderdate),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(rev AS HUGEINT)) AS s_rev,
      |    sum(CAST(cnt AS HUGEINT)) AS s_cnt,
      |    sum(CAST(cust AS HUGEINT)) AS s_cust,
      |    sum(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)) AS q_rev,
      |    sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)) AS q_cnt,
      |    sum(CAST(cust AS HUGEINT) * CAST(cust AS HUGEINT)) AS q_cust,
      |    sum(CAST(rev AS HUGEINT) * CAST(cnt AS HUGEINT)) AS x_rev_cnt,
      |    sum(CAST(rev AS HUGEINT) * CAST(cust AS HUGEINT)) AS x_rev_cust,
      |    sum(CAST(cnt AS HUGEINT) * CAST(cust AS HUGEINT)) AS x_cnt_cust
      |  FROM daily)
      |SELECT n AS n_days,
      |  CAST(CAST(n AS HUGEINT) * x_rev_cnt - s_rev * s_cnt AS DOUBLE)
      |    / (sqrt(CAST(CAST(n AS HUGEINT) * q_rev - s_rev * s_rev
      |        AS DOUBLE))
      |      * sqrt(CAST(CAST(n AS HUGEINT) * q_cnt - s_cnt * s_cnt
      |        AS DOUBLE))) AS r_rev_cnt,
      |  CAST(CAST(n AS HUGEINT) * x_rev_cust - s_rev * s_cust AS DOUBLE)
      |    / (sqrt(CAST(CAST(n AS HUGEINT) * q_rev - s_rev * s_rev
      |        AS DOUBLE))
      |      * sqrt(CAST(CAST(n AS HUGEINT) * q_cust - s_cust * s_cust
      |        AS DOUBLE))) AS r_rev_cust,
      |  CAST(CAST(n AS HUGEINT) * x_cnt_cust - s_cnt * s_cust AS DOUBLE)
      |    / (sqrt(CAST(CAST(n AS HUGEINT) * q_cnt - s_cnt * s_cnt
      |        AS DOUBLE))
      |      * sqrt(CAST(CAST(n AS HUGEINT) * q_cust - s_cust * s_cust
      |        AS DOUBLE))) AS r_cnt_cust
      |FROM m""".stripMargin

  // ------------------------------------------------ active days histogram

  /** Engagement-frequency distribution: how many users were active on
    * exactly d distinct days — the DAU-composition histogram behind
    * "are actives daily habits or one-shots". Two keyed aggregations
    * (per-user distinct days, then the day-count histogram), all
    * integers; share is the one division.
    */
  def activeDaysHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("active_days"))
    val hist = perUser.groupBy(col("active_days"))
      .agg(count(lit(1)).as("n_users"))
    val tot = hist.agg(sum(col("n_users")).as("total_users"))
    hist.crossJoin(broadcast(tot))
      .select(col("active_days"), col("n_users"),
        (col("n_users").cast("double") / col("total_users").cast("double"))
          .as("user_share"))
      .orderBy(col("active_days"))
  }

  /** Customer order-frequency quartiles from the COUNT HISTOGRAM — how
    * many orders the p25/p50/p75/p90 customer places, the
    * lifetime-frequency profile behind loyalty tiering. Per-customer
    * counts (keyed aggregate), then the repo's exact rank convention
    * picked from the bounded distinct-count domain via one global
    * cumulative window ABOVE the aggregate (the kcore argument: the
    * distinct order-count domain is ≤ 2·√Σcounts).
    */
  def orderFrequencyQuartiles(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val hist = perCust.groupBy(col("n_orders"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("n_orders"))))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    def pick(p: String, as: String) =
      max(when(col("cum") >=
        expr(s"cast(floor(cast($p as double) * cast(n - 1 as double)) as bigint) + 1") &&
        col("cum") - col("cnt") <
          expr(s"cast(floor(cast($p as double) * cast(n - 1 as double)) as bigint) + 1"),
        col("n_orders"))).as(as)
    ranked.agg(max(col("n")).as("n_customers"),
      pick("0.25", "p25_orders"), pick("0.5", "p50_orders"),
      pick("0.75", "p75_orders"), pick("0.9", "p90_orders"))
  }

  val orderFrequencyQuartilesSql: String =
    """WITH pc AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY o_custkey),
      |h AS (
      |  SELECT n_orders, CAST(count(*) AS BIGINT) AS cnt
      |  FROM pc GROUP BY n_orders),
      |c AS (
      |  SELECT n_orders, cnt,
      |    CAST(sum(cnt) OVER (ORDER BY n_orders
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(sum(cnt) OVER () AS BIGINT) AS n
      |  FROM h)
      |SELECT CAST(max(n) AS BIGINT) AS n_customers,
      |  max(CASE WHEN cum >= CAST(floor(CAST(0.25 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
      |    AND cum - cnt < CAST(floor(CAST(0.25 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN n_orders END)
      |    AS p25_orders,
      |  max(CASE WHEN cum >= CAST(floor(CAST(0.5 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
      |    AND cum - cnt < CAST(floor(CAST(0.5 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN n_orders END)
      |    AS p50_orders,
      |  max(CASE WHEN cum >= CAST(floor(CAST(0.75 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
      |    AND cum - cnt < CAST(floor(CAST(0.75 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN n_orders END)
      |    AS p75_orders,
      |  max(CASE WHEN cum >= CAST(floor(CAST(0.9 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
      |    AND cum - cnt < CAST(floor(CAST(0.9 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN n_orders END)
      |    AS p90_orders
      |FROM c""".stripMargin

  val activeDaysHistogramSql: String =
    """WITH pu AS (
      |  SELECT user_id, CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
      |      AS active_days
      |  FROM events GROUP BY user_id),
      |h AS (
      |  SELECT active_days, CAST(count(*) AS BIGINT) AS n_users
      |  FROM pu GROUP BY active_days),
      |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS total_users FROM h)
      |SELECT active_days, n_users,
      |  CAST(n_users AS DOUBLE) / CAST(total_users AS DOUBLE)
      |    AS user_share
      |FROM h, t
      |ORDER BY active_days""".stripMargin
}
