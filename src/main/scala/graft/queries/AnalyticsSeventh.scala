package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Checkpoints.StableCheckpoint

/** Round-5 analytics additions, batch 7: Apriori-style frequent triple
  * mining, a promo diff-in-diff revenue contrast, and a discrete
  * churn-hazard curve — the itemset-mining / causal-contrast / survival
  * shapes rounding out the warehouse-analytics surface.
  *
  * Exactness discipline as everywhere: integer cents and counts, global
  * windows only above aggregated bounded domains, doubles only in final
  * single divisions.
  */
object AnalyticsSeventh {

  // ----------------------------------------------------- frequent triples

  /** Frequent co-purchase TRIPLES (support ≥ 2 orders), the Apriori step
    * past `market_basket_lift`'s pairs. The cubic per-basket fan-out is
    * bounded by a deterministic 16-item cap per order (16C3 = 560
    * candidate triples per basket regardless of basket size — the same
    * hot-basket guard as the pair miner, mirrored verbatim in the
    * oracle); the triple aggregation keys on the triple itself and the
    * result is a distributed partial top-20.
    */
  def frequentTriples(spark: SparkSession, sfDir: String): DataFrame = {
    // triple generation via the sorted_triples codegen kernel (see
    // [[graft.functions.SortedTriples]]): one numbered ok exchange +
    // collect_set replaces the old (ok,pk) dedup exchange, keyed
    // row_number cap, checkpoint and TWO sort-merge self-joins; the
    // 16-item hot-basket cap rides the expression's cap argument
    // (smallest-16 distinct ≡ the old keyed row_number guard). The
    // numbered repartition pins the 560-triples-per-basket fan-out at
    // full parallelism (AQE sizes the small basket exchange by input
    // bytes, blind to output fan-out).
    graft.functions.SortedPairs.register(spark)
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .repartition(nPart, col("ok"))
      .groupBy(col("ok"))
      .agg(collect_set(col("pk")).as("ps"))
      .select(explode(call_function("sorted_triples", col("ps"),
        lit(16))).as("e"))
      .select(col("e.pa").as("pa"), col("e.pb").as("pb"),
        col("e.pc").as("pc"))
      .groupBy(col("pa"), col("pb"), col("pc"))
      .agg(count(lit(1)).as("support_cnt"))
      .filter(col("support_cnt") >= 2)
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("pc").as("part_c"), col("support_cnt"))
      .orderBy(col("support_cnt").desc, col("part_a"), col("part_b"),
        col("part_c"))
      .limit(20)
  }

  val frequentTriplesSql: String =
    """WITH it AS (
      |  SELECT ok, pk FROM (
      |    SELECT l_orderkey AS ok, l_partkey AS pk,
      |      row_number() OVER (PARTITION BY l_orderkey
      |        ORDER BY l_partkey) AS rn
      |    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
      |  WHERE rn <= 16)
      |SELECT a.pk AS part_a, b.pk AS part_b, c.pk AS part_c,
      |  CAST(count(*) AS BIGINT) AS support_cnt
      |FROM it a
      |JOIN it b ON a.ok = b.ok AND a.pk < b.pk
      |JOIN it c ON b.ok = c.ok AND b.pk < c.pk
      |GROUP BY a.pk, b.pk, c.pk
      |HAVING count(*) >= 2
      |ORDER BY support_cnt DESC, part_a, part_b, part_c
      |LIMIT 20""".stripMargin

  // ----------------------------------------------------- diff-in-diff

  /** Promo diff-in-diff: revenue change across the ship-date midpoint
    * for promo parts versus the non-promo control —
    * `(P_late − P_early) − (N_late − N_early)` — the causal-contrast
    * shape behind "did the promotion move revenue beyond the trend?".
    * The midpoint is one broadcast scalar (integer day arithmetic), the
    * 2×2 cells are ONE conditional aggregation over the keyed
    * lineitem→part join, and every output is an exact BIGINT of cents —
    * no doubles at all.
    */
  def diffInDiffPromo(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        datediff(col("l_shipdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("day"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    // (min+max) div 2, never /2+cast — DuckDB CAST(DOUBLE AS BIGINT)
    // rounds to nearest, Spark truncates; an odd sum would split the
    // engines one day apart.
    val mid = li.agg(expr("(min(day) + max(day)) div 2").as("mid_day"))
    val pr = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_type").startsWith("PROMO")
        .as("is_promo"))
    li.join(pr, col("l_partkey") === col("p_partkey"))
      .crossJoin(broadcast(mid))
      .select(col("is_promo"), (col("day") > col("mid_day")).as("is_late"),
        col("cents"))
      .agg(
        sum(when(col("is_promo") && !col("is_late"), col("cents"))
          .otherwise(0L)).as("promo_early_cents"),
        sum(when(col("is_promo") && col("is_late"), col("cents"))
          .otherwise(0L)).as("promo_late_cents"),
        sum(when(!col("is_promo") && !col("is_late"), col("cents"))
          .otherwise(0L)).as("ctrl_early_cents"),
        sum(when(!col("is_promo") && col("is_late"), col("cents"))
          .otherwise(0L)).as("ctrl_late_cents"))
      .select(col("promo_early_cents"), col("promo_late_cents"),
        col("ctrl_early_cents"), col("ctrl_late_cents"),
        ((col("promo_late_cents") - col("promo_early_cents"))
          - (col("ctrl_late_cents") - col("ctrl_early_cents")))
          .as("did_cents"))
  }

  val diffInDiffPromoSql: String =
    """WITH li AS (
      |  SELECT l_partkey,
      |    CAST(date_diff('day', DATE '1992-01-01', l_shipdate) AS BIGINT)
      |      AS day,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |mid AS (
      |  SELECT CAST((min(day) + max(day)) // 2 AS BIGINT) AS mid_day
      |  FROM li),
      |cells AS (
      |  SELECT p_type LIKE 'PROMO%' AS is_promo, day > mid_day AS is_late,
      |    cents
      |  FROM li JOIN part ON l_partkey = p_partkey, mid)
      |SELECT
      |  CAST(sum(CASE WHEN is_promo AND NOT is_late THEN cents ELSE 0 END)
      |    AS BIGINT) AS promo_early_cents,
      |  CAST(sum(CASE WHEN is_promo AND is_late THEN cents ELSE 0 END)
      |    AS BIGINT) AS promo_late_cents,
      |  CAST(sum(CASE WHEN NOT is_promo AND NOT is_late THEN cents
      |    ELSE 0 END) AS BIGINT) AS ctrl_early_cents,
      |  CAST(sum(CASE WHEN NOT is_promo AND is_late THEN cents ELSE 0 END)
      |    AS BIGINT) AS ctrl_late_cents,
      |  CAST(sum(CASE WHEN is_promo AND is_late THEN cents ELSE 0 END)
      |    - sum(CASE WHEN is_promo AND NOT is_late THEN cents ELSE 0 END)
      |    - (sum(CASE WHEN NOT is_promo AND is_late THEN cents ELSE 0 END)
      |       - sum(CASE WHEN NOT is_promo AND NOT is_late THEN cents
      |           ELSE 0 END)) AS BIGINT) AS did_cents
      |FROM cells""".stripMargin

  // ----------------------------------------------------- churn hazard

  /** Discrete churn-hazard curve: for each lifetime week k, the number
    * of users still active at k (at-risk set) and the number whose LAST
    * activity falls in week k (churn events), with the hazard ratio —
    * the Kaplan-Meier-style table (hazards only: the cumulative
    * survival product is not cross-engine hashable, the per-week hazard
    * is). One pass to per-user (first, last) — the natural user_id
    * aggregation — then a lifetime histogram; the at-risk counts come
    * from a reverse cumulative window ABOVE the aggregated lifetime
    * domain (weeks are calendar-bounded, never raw users).
    */
  def churnHazardCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val life = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(min(col("ts").cast("date")).as("first_d"),
        max(col("ts").cast("date")).as("last_d"))
      // `div`, never `/`+cast: DuckDB CAST(DOUBLE AS BIGINT) ROUNDS to
      // nearest while Spark's cast truncates — integral division is the
      // only cross-engine-safe way to bucket.
      .select(expr("datediff(last_d, first_d) div 7").cast("long")
        .as("week_k"))
    val hist = life.groupBy(col("week_k"))
      .agg(count(lit(1)).as("events"))
    val w = Window.orderBy(col("week_k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("at_risk", sum(col("events")).over(w))
      .select(col("week_k"), col("at_risk"), col("events"),
        (col("events").cast("double") / col("at_risk").cast("double"))
          .as("hazard"))
      .orderBy(col("week_k"))
  }

  val churnHazardCurveSql: String =
    """WITH life AS (
      |  SELECT CAST(date_diff('day', min(CAST(ts AS DATE)),
      |      max(CAST(ts AS DATE))) // 7 AS BIGINT) AS week_k
      |  FROM events GROUP BY user_id),
      |hist AS (
      |  SELECT week_k, CAST(count(*) AS BIGINT) AS events
      |  FROM life GROUP BY week_k),
      |r AS (
      |  SELECT week_k, events,
      |    CAST(sum(events) OVER (ORDER BY week_k DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS at_risk
      |  FROM hist)
      |SELECT week_k, at_risk, events,
      |  CAST(events AS DOUBLE) / CAST(at_risk AS DOUBLE) AS hazard
      |FROM r
      |ORDER BY week_k""".stripMargin

  // ------------------------------------------------------- supplier HHI

  /** Herfindahl–Hirschman concentration of supplier revenue per nation —
    * the antitrust-style "is this market one big supplier or many
    * small?" index, in exact fixed point:
    * `HHI_fp = Σ_i s_i² · 10⁶ div S²` (share² sums scaled to ppm).
    * Per-supplier revenue is one keyed aggregation; squares widen to
    * DECIMAL (revenue² reaches ~10²⁸ at 100 TB); the integral division
    * is the cross-engine-safe `div`/`//` pair. 10 000 ppm-HHI ≈ the
    * classic 0.01 threshold × 10⁶.
    */
  def supplierHhi(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
    val sup = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    rev.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("cents")).as("total_cents"),
        sum(expr("cast(cents as decimal(38,0)) * cast(cents as decimal(38,0))"))
          .as("sum_sq"))
      .select(col("n_name").as("nation"), col("n_suppliers"),
        col("total_cents"),
        expr("""cast((sum_sq * 1000000)
          div (cast(total_cents as decimal(38,0))
          * cast(total_cents as decimal(38,0))) as long)""").as("hhi_ppm"))
      .orderBy(col("nation"))
  }

  val supplierHhiSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  CAST((sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) * 1000000)
      |    // (CAST(sum(cents) AS HUGEINT) * CAST(sum(cents) AS HUGEINT))
      |    AS BIGINT) AS hhi_ppm
      |FROM rev
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY nation""".stripMargin

  // ------------------------------------------------ weighted median price

  /** Quantity-weighted median price per return flag: the "what price
    * does the typical UNIT ship at" statistic (row-median ignores that
    * cheap lines carry more units). Classic histogram trick per group:
    * aggregate (flag, price-cents) with summed quantity weights, then a
    * FLAG-KEYED cumulative window over distinct prices picks the
    * smallest value whose cumulative weight reaches ⌈W/2⌉ — integral
    * arithmetic end to end, no global window anywhere.
    */
  def weightedMedianPrice(spark: SparkSession, sfDir: String): DataFrame = {
    val h = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("w"))
      // NUMBERED repartition ON THE GROUP KEY: spreads the 600k-row
      // partial aggregation off the single-partition scan AND satisfies
      // the aggregate's distribution, so the histogram mass crosses the
      // wire once (the unkeyed spread paid a second (flag, cents)
      // exchange right after)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("l_returnflag"), col("cents"))
      .groupBy(col("l_returnflag"), col("cents"))
      .agg(sum(col("w")).as("wt"))
    // per-flag totals as a 3-row broadcast join, NOT a second WindowExec:
    // the empty-frame window buffered the whole ~500k-row histogram per
    // flag a second time just to attach one scalar
    val totals = h.groupBy(col("l_returnflag"))
      .agg(sum(col("wt")).as("total_w"))
    // TWO-PHASE rank lookup (the kcoreThreshold / lorenzGini pattern):
    // a per-flag cumulative window over the RAW ~500k-row cents
    // histogram is a 3-task sequential scan whose size grows with the
    // price domain (the r18 mrg sweep flagged it >500 ms on 3 tasks).
    // Phase 1 cumulates a 65536-cent COARSE-BIN histogram (~160 bins
    // per flag — the only full-domain window, trivially sized at any
    // scale) and locates the single bin containing rank
    // r = (total_w + 1) div 2; phase 2 runs the exact running sum over
    // ONLY that bin's rows, seeded with the bins-before prefix. The
    // selected row satisfies the same global cum ≥ r > cum − wt
    // predicate, so the output is identical by construction.
    val bins = h
      .groupBy(col("l_returnflag"), expr("cents div 65536").as("bin"))
      .agg(sum(col("wt")).as("bw"))
    val cumBinW = Window.partitionBy(col("l_returnflag")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tgt = bins
      .withColumn("cum_to_bin", sum(col("bw")).over(cumBinW))
      .join(broadcast(totals), "l_returnflag")
      .withColumn("r", expr("(total_w + 1) div 2"))
      .filter(col("cum_to_bin") >= col("r") &&
        col("cum_to_bin") - col("bw") < col("r"))
      .select(col("l_returnflag"), col("bin"),
        (col("cum_to_bin") - col("bw")).as("cum_before"),
        col("total_w"), col("r"))
    val cumW = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h
      .join(broadcast(tgt), Seq("l_returnflag"))
      .filter(expr("cents div 65536") === col("bin"))
      .withColumn("cum", col("cum_before") + sum(col("wt")).over(cumW))
      .filter(col("cum") >= col("r") && col("cum") - col("wt") < col("r"))
      .select(col("l_returnflag"), col("total_w").as("total_units"),
        col("cents").as("weighted_median_cents"))
      .orderBy(col("l_returnflag"))
  }

  val weightedMedianPriceSql: String =
    """WITH h AS (
      |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT)
      |      AS cents,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
      |  FROM lineitem GROUP BY l_returnflag, cents),
      |c AS (
      |  SELECT l_returnflag, cents, wt,
      |    CAST(sum(wt) OVER (PARTITION BY l_returnflag ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT)
      |      AS total_w
      |  FROM h)
      |SELECT l_returnflag, total_w AS total_units,
      |  cents AS weighted_median_cents
      |FROM c
      |WHERE cum >= (total_w + 1) // 2 AND cum - wt < (total_w + 1) // 2
      |ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------- weekly user jaccard

  /** Week-over-week active-user Jaccard similarity — audience-drift as
    * set overlap: |A∩B| / |A∪B| for each consecutive week pair. Active
    * sets are distinct (week, user) rows; the intersection is ONE
    * user-keyed self-join constrained to adjacent weeks (never a
    * cross-week cartesian); union size is inclusion-exclusion on exact
    * integers; Jaccard is the one division. Week index uses `div`
    * (cross-engine truncation).
    */
  def weeklyUserJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("datediff(cast(ts as date), date'2024-01-01') div 7")
          .cast("long").as("wk"))
      .distinct()
      .stableCheckpoint() // sizes + adjacent-week self-join
    val sizes = ev.groupBy(col("wk")).agg(count(lit(1)).as("n_users"))
    val common = ev.toDF("user_id", "wa")
      .join(ev.toDF("user_id", "wb"), Seq("user_id"))
      .filter(col("wb") === col("wa") + 1)
      .groupBy(col("wa")).agg(count(lit(1)).as("n_common"))
    sizes.toDF("wa", "n_prev")
      .join(sizes.toDF("wb", "n_next").withColumn("wa", col("wb") - 1),
        Seq("wa"))
      .join(common, Seq("wa"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .select(col("wa").as("week"), col("n_prev"), col("n_next"),
        col("n_common"),
        (col("n_common").cast("double") /
          (col("n_prev") + col("n_next") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy(col("week"))
  }

  val weeklyUserJaccardSql: String =
    """WITH ev AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
      |      AS BIGINT) AS wk
      |  FROM events),
      |sizes AS (
      |  SELECT wk, CAST(count(*) AS BIGINT) AS n_users
      |  FROM ev GROUP BY wk),
      |common AS (
      |  SELECT a.wk AS wa, CAST(count(*) AS BIGINT) AS n_common
      |  FROM ev a JOIN ev b
      |    ON a.user_id = b.user_id AND b.wk = a.wk + 1
      |  GROUP BY a.wk)
      |SELECT p.wk AS week, p.n_users AS n_prev, n.n_users AS n_next,
      |  coalesce(c.n_common, 0) AS n_common,
      |  CAST(coalesce(c.n_common, 0) AS DOUBLE)
      |    / CAST(p.n_users + n.n_users - coalesce(c.n_common, 0) AS DOUBLE)
      |    AS jaccard
      |FROM sizes p
      |JOIN sizes n ON n.wk = p.wk + 1
      |LEFT JOIN common c ON c.wa = p.wk
      |ORDER BY week""".stripMargin

  // ------------------------------------------------------ event-type venn

  /** Full Venn decomposition of user behaviour across the 5 event types
    * via the BIT-MASK aggregate (`bit_or(1 << type_idx)` per user —
    * the repo's standard replacement for `collect_set` over a small
    * enumerable domain: one long per user instead of a spilled object
    * set). Every non-empty type combination gets its exact user count,
    * with the mask decoded to a readable label — 31 possible rows,
    * pure integers.
    */
  def eventTypeVenn(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    // CASE with ELSE 4, exactly like the oracle: an out-of-domain event
    // type folds into the last bit in BOTH engines rather than silently
    // dropping (a map lookup would null out unknown types on the Spark
    // side only — a latent cross-engine asymmetry).
    val masks = Tables.events(spark, sfDir)
      .select(col("user_id"),
        when(col("event_type") === "click", 0)
          .when(col("event_type") === "error", 1)
          .when(col("event_type") === "purchase", 2)
          .when(col("event_type") === "signup", 3)
          .otherwise(4).as("i"))
      .select(col("user_id"),
        expr("shiftleft(cast(1 as bigint), i)").as("bit"))
      .groupBy(col("user_id"))
      .agg(expr("bit_or(bit)").as("mask"))
    val label = concat_ws("+", types.zipWithIndex.flatMap { case (t, i) =>
      Seq(when(expr(s"(mask div ${1L << i}) % 2") === 1, t)) }: _*)
    masks.groupBy(col("mask"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("combo", label)
      .select(col("combo"), col("mask"), col("n_users"))
      .orderBy(col("mask"))
  }

  val eventTypeVennSql: String =
    """WITH m AS (
      |  SELECT user_id,
      |    CAST(bit_or(1 << (CASE event_type
      |      WHEN 'click' THEN 0 WHEN 'error' THEN 1
      |      WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
      |      ELSE 4 END)) AS BIGINT) AS mask
      |  FROM events GROUP BY user_id)
      |SELECT array_to_string(list_filter([
      |    CASE WHEN (mask // 1) % 2 = 1 THEN 'click' END,
      |    CASE WHEN (mask // 2) % 2 = 1 THEN 'error' END,
      |    CASE WHEN (mask // 4) % 2 = 1 THEN 'purchase' END,
      |    CASE WHEN (mask // 8) % 2 = 1 THEN 'signup' END,
      |    CASE WHEN (mask // 16) % 2 = 1 THEN 'view' END],
      |    x -> x IS NOT NULL), '+') AS combo,
      |  mask, CAST(count(*) AS BIGINT) AS n_users
      |FROM m
      |GROUP BY mask
      |ORDER BY mask""".stripMargin

  // ------------------------------------------------------ YoY growth

  /** Year-over-year revenue growth: annual order revenue with the
    * previous year's and the growth ratio — the board-slide query. The
    * lag window orders the AGGREGATED year domain (≤ a handful of
    * rows); growth is the one division, null for the first year.
    */
  def revenueYoyGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val yearly = Tables.orders(spark, sfDir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
    // Global window over the YEAR domain — calendar-bounded aggregate.
    val w = Window.orderBy(col("yr"))
    yearly
      .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .select(col("yr"), col("n_orders"), col("rev_cents"),
        col("prev_cents"),
        when(col("prev_cents").isNull, lit(null).cast("double"))
          .otherwise((col("rev_cents") - col("prev_cents")).cast("double") /
            col("prev_cents").cast("double")).as("yoy_growth"))
      .orderBy(col("yr"))
  }

  val revenueYoyGrowthSql: String =
    """WITH y AS (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM orders GROUP BY 1)
      |SELECT yr, n_orders, rev_cents,
      |  lag(rev_cents) OVER (ORDER BY yr) AS prev_cents,
      |  CASE WHEN lag(rev_cents) OVER (ORDER BY yr) IS NULL THEN NULL
      |    ELSE CAST(rev_cents - lag(rev_cents) OVER (ORDER BY yr)
      |        AS DOUBLE)
      |      / CAST(lag(rev_cents) OVER (ORDER BY yr) AS DOUBLE) END
      |    AS yoy_growth
      |FROM y
      |ORDER BY yr""".stripMargin

  // ----------------------------------------------- error-rate p-chart

  /** Hour-of-day error-rate control chart (p-chart): per hour bucket,
    * the error fraction against 3σ binomial control limits around the
    * overall rate — `p̄ ± 3·√(p̄(1−p̄)/n_h)` — the SRE-style "which hours
    * are statistically anomalous" audit. Counts are one conditional
    * aggregation over the 24-row hour domain; the overall rate rides a
    * 1-row broadcast; limits and the in-control verdict are computed
    * with the identical double formula in both engines.
    */
  def errorRateControlChart(spark: SparkSession, sfDir: String): DataFrame = {
    val byHour = Tables.events(spark, sfDir)
      .select(hour(col("ts")).cast("long").as("hour"),
        (col("event_type") === "error").cast("long").as("is_err"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("is_err")).as("n_err"))
    val overall = byHour.agg(sum(col("n")).as("tot"),
      sum(col("n_err")).as("tot_err"))
    val pbar = col("tot_err").cast("double") / col("tot").cast("double")
    val sigma = sqrt(pbar * (lit(1.0d) - pbar) / col("n").cast("double"))
    val rate = col("n_err").cast("double") / col("n").cast("double")
    byHour.crossJoin(broadcast(overall))
      .select(col("hour"), col("n"), col("n_err"), rate.as("err_rate"),
        (rate <= pbar + lit(3.0d) * sigma &&
          rate >= greatest(lit(0.0d), pbar - lit(3.0d) * sigma))
          .as("in_control"))
      .orderBy(col("hour"))
  }

  val errorRateControlChartSql: String =
    """WITH h AS (
      |  SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_err
      |  FROM events GROUP BY 1),
      |o AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
      |  CAST(sum(n_err) AS BIGINT) AS tot_err FROM h)
      |SELECT hour, n, n_err,
      |  CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE) AS err_rate,
      |  (CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE)
      |    <= CAST(tot_err AS DOUBLE) / CAST(tot AS DOUBLE)
      |      + CAST(3.0 AS DOUBLE)
      |        * sqrt(CAST(tot_err AS DOUBLE) / CAST(tot AS DOUBLE)
      |          * (CAST(1.0 AS DOUBLE)
      |            - CAST(tot_err AS DOUBLE) / CAST(tot AS DOUBLE))
      |          / CAST(n AS DOUBLE)))
      |  AND (CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE)
      |    >= greatest(CAST(0.0 AS DOUBLE),
      |      CAST(tot_err AS DOUBLE) / CAST(tot AS DOUBLE)
      |      - CAST(3.0 AS DOUBLE)
      |        * sqrt(CAST(tot_err AS DOUBLE) / CAST(tot AS DOUBLE)
      |          * (CAST(1.0 AS DOUBLE)
      |            - CAST(tot_err AS DOUBLE) / CAST(tot AS DOUBLE))
      |          / CAST(n AS DOUBLE)))) AS in_control
      |FROM h, o
      |ORDER BY hour""".stripMargin
}
