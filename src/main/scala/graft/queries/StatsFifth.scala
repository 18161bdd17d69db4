package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Checkpoints.StableCheckpoint
import graft.Tables

/** Round-5 statistics / graph additions: concentration (Lorenz–Gini),
  * independence testing (chi-square), distribution drift (total variation
  * distance), HITS hub/authority scoring, common-neighbor link prediction
  * and an AMS F2-moment sketch.
  *
  * All follow the repo's cross-engine exactness conventions: money in
  * integer cents, products widened to DECIMAL before they can wrap a
  * 64-bit long at 100 TB, and doubles only in ONE final expression with
  * identical operand association in the Spark and DuckDB formulations.
  * Global windows only ever order PROVABLY BOUNDED domains (fixed bin
  * counts), never raw rows.
  */
object StatsFifth {

  // ---------------------------------------------------------------- gini

  /** Customer-revenue concentration as a binned Lorenz curve and its Gini
    * coefficient — the "do 1% of customers carry 50% of revenue" audit a
    * pipeline runs before stratifying anything by account value.
    *
    * An EXACT Gini needs every customer globally ranked by revenue — a
    * single-partition sort of |customers| rows, the known scale-killer.
    * Instead revenue is binned into 1000 fixed-width integer-cents bins
    * (min/max come from a 1-row broadcast scalar), the Lorenz curve is
    * accumulated over the BINS (a window over ≤1000 rows — bounded
    * domain), and the trapezoid Gini
    * `1 − Σ_b n_b·(2·cum_s_b − s_b) / (N·S)` is computed from integer
    * moments. Both engines bin identically (integer floor division), so
    * the binned value is bit-exact cross-engine; the binning error is
    * ≤ 1/1000 of the revenue range, documented here rather than hidden.
    * Per-bin products reach n_b·cum_s ≈ 10²³ at 100 TB, so they widen to
    * DECIMAL (HUGEINT on the oracle side) before summing; the one double
    * expression is the final `1 − t/(n·s)`.
    */
  def lorenzGini(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val mm = rev.agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    val bins = rev.crossJoin(broadcast(mm))
      .select(expr("((cents - mn) * 1000) div (mx - mn + 1)").as("bin"),
        col("cents"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("s_cents"))
    // Window over the bin domain: ≤1000 rows by construction, never raw
    // customers — safe as a global window.
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("cum_s", sum(col("s_cents")).over(w))
      .select(col("n_cust"), col("s_cents"),
        (expr("cast(n_cust as decimal(19,0))") *
          expr("cast(2 * cum_s - s_cents as decimal(19,0))")).as("term"))
      .agg(sum(col("n_cust")).as("n_customers"),
        sum(col("s_cents")).as("total_cents"),
        sum(col("term")).as("t"))
      .select(col("n_customers"), col("total_cents"),
        (lit(1.0d) - (col("t").cast("double") /
          (col("n_customers").cast("double") *
            col("total_cents").cast("double")))).as("gini"))
  }

  val lorenzGiniSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey),
      |mm AS (SELECT min(cents) AS mn, max(cents) AS mx FROM rev),
      |b AS (
      |  SELECT ((cents - mn) * 1000) // (mx - mn + 1) AS bin, cents
      |  FROM rev, mm),
      |g AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS n_cust,
      |    CAST(sum(cents) AS BIGINT) AS s_cents
      |  FROM b GROUP BY bin),
      |c AS (
      |  SELECT n_cust, s_cents,
      |    CAST(sum(s_cents) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s
      |  FROM g)
      |SELECT CAST(sum(n_cust) AS BIGINT) AS n_customers,
      |  CAST(sum(s_cents) AS BIGINT) AS total_cents,
      |  CAST(1 AS DOUBLE)
      |    - CAST(sum(CAST(n_cust AS HUGEINT)
      |        * CAST(2 * cum_s - s_cents AS HUGEINT)) AS DOUBLE)
      |      / (CAST(sum(n_cust) AS DOUBLE) * CAST(sum(s_cents) AS DOUBLE))
      |    AS gini
      |FROM c""".stripMargin

  /** Year-resolved twin of [[lorenzGini]]: the customer-revenue Gini per
    * order year — "is revenue concentration drifting?" as a trend, not a
    * scalar. Same binned-Lorenz construction, but every step keys on the
    * year: per-(year, customer) cents, per-year min/max (a bounded
    * broadcast), 1000 fixed bins, YEAR-KEYED cumulative windows (never
    * global), and one trapezoid division per year. Identical binning in
    * both engines keeps it bit-exact; binning error ≤ 1/1000 of each
    * year's range as documented on the global version.
    */
  def giniByYear(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.orders(spark, sfDir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val mm = rev.groupBy(col("yr"))
      .agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    val bins = rev.join(broadcast(mm), Seq("yr"))
      .select(col("yr"),
        expr("((cents - mn) * 1000) div (mx - mn + 1)").as("bin"),
        col("cents"))
      .groupBy(col("yr"), col("bin"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("s_cents"))
    val w = Window.partitionBy(col("yr")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("cum_s", sum(col("s_cents")).over(w))
      .select(col("yr"), col("n_cust"), col("s_cents"),
        (expr("cast(n_cust as decimal(19,0))") *
          expr("cast(2 * cum_s - s_cents as decimal(19,0))")).as("term"))
      .groupBy(col("yr"))
      .agg(sum(col("n_cust")).as("n_customers"),
        sum(col("s_cents")).as("total_cents"),
        sum(col("term")).as("t"))
      .select(col("yr"), col("n_customers"), col("total_cents"),
        (lit(1.0d) - (col("t").cast("double") /
          (col("n_customers").cast("double") *
            col("total_cents").cast("double")))).as("gini"))
      .orderBy(col("yr"))
  }

  val giniByYearSql: String =
    """WITH rev AS (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
      |    o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1, o_custkey),
      |mm AS (SELECT yr, min(cents) AS mn, max(cents) AS mx FROM rev
      |  GROUP BY yr),
      |b AS (
      |  SELECT rev.yr, ((cents - mn) * 1000) // (mx - mn + 1) AS bin, cents
      |  FROM rev JOIN mm ON rev.yr = mm.yr),
      |g AS (
      |  SELECT yr, bin, CAST(count(*) AS BIGINT) AS n_cust,
      |    CAST(sum(cents) AS BIGINT) AS s_cents
      |  FROM b GROUP BY yr, bin),
      |c AS (
      |  SELECT yr, n_cust, s_cents,
      |    CAST(sum(s_cents) OVER (PARTITION BY yr ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_s
      |  FROM g)
      |SELECT yr, CAST(sum(n_cust) AS BIGINT) AS n_customers,
      |  CAST(sum(s_cents) AS BIGINT) AS total_cents,
      |  CAST(1 AS DOUBLE)
      |    - CAST(sum(CAST(n_cust AS HUGEINT)
      |        * CAST(2 * cum_s - s_cents AS HUGEINT)) AS DOUBLE)
      |      / (CAST(sum(n_cust) AS DOUBLE) * CAST(sum(s_cents) AS DOUBLE))
      |    AS gini
      |FROM c
      |GROUP BY yr
      |ORDER BY yr""".stripMargin

  // ---------------------------------------------------- chi-square cells

  /** Chi-square test of independence between part promotion status
    * (`p_type LIKE 'PROMO%'`) and lineitem return flag — the categorical
    * association audit behind "do promo parts get returned more?".
    *
    * One keyed join lineitem→part (Catalyst picks broadcast at small SF,
    * shuffle at scale — both correct), one 6-cell contingency aggregation,
    * then row/column/grand totals via windows over the 6-row cell table
    * (bounded domain). The per-cell statistic is computed from the exact
    * integer identity `(o·N − rt·ct)² / (N·rt·ct)`: the numerator root
    * `o·N − rt·ct` reaches ~10²⁴ at 100 TB so it is formed in DECIMAL
    * exactly, and the ONE double expression per row is
    * `(d·d) / ((n·rt)·ct)` with fixed association. Σ contrib over the 6
    * rows is the chi-square statistic (3 dof); left to the consumer so
    * every emitted cell stays integer-exact + one double.
    */
  def chiSquarePromoReturns(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_partkey"), col("l_returnflag"))
    val pr = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_type").startsWith("PROMO").as("is_promo"))
    val cells = li.join(pr, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_returnflag"), col("is_promo"))
      .agg(count(lit(1)).as("n_obs"))
    // Totals over the 6-cell contingency table — bounded-domain windows.
    val byFlag = Window.partitionBy(col("l_returnflag"))
    val byPromo = Window.partitionBy(col("is_promo"))
    val overall = Window.partitionBy()
    cells
      .withColumn("rt", sum(col("n_obs")).over(byFlag))
      .withColumn("ct", sum(col("n_obs")).over(byPromo))
      .withColumn("n", sum(col("n_obs")).over(overall))
      .withColumn("d",
        (expr("cast(n_obs as decimal(19,0))") * expr("cast(n as decimal(19,0))")) -
          (expr("cast(rt as decimal(19,0))") * expr("cast(ct as decimal(19,0))")))
      .select(col("l_returnflag"), col("is_promo"), col("n_obs"),
        ((col("d").cast("double") * col("d").cast("double")) /
          ((col("n").cast("double") * col("rt").cast("double")) *
            col("ct").cast("double"))).as("contrib"))
      .orderBy(col("l_returnflag"), col("is_promo"))
  }

  val chiSquarePromoReturnsSql: String =
    """WITH cells AS (
      |  SELECT l_returnflag, p_type LIKE 'PROMO%' AS is_promo,
      |    CAST(count(*) AS BIGINT) AS n_obs
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY l_returnflag, is_promo),
      |t AS (
      |  SELECT l_returnflag, is_promo, n_obs,
      |    CAST(sum(n_obs) OVER (PARTITION BY l_returnflag) AS BIGINT) AS rt,
      |    CAST(sum(n_obs) OVER (PARTITION BY is_promo) AS BIGINT) AS ct,
      |    CAST(sum(n_obs) OVER () AS BIGINT) AS n
      |  FROM cells),
      |d AS (
      |  SELECT l_returnflag, is_promo, n_obs, rt, ct, n,
      |    CAST(n_obs AS HUGEINT) * CAST(n AS HUGEINT)
      |      - CAST(rt AS HUGEINT) * CAST(ct AS HUGEINT) AS dd
      |  FROM t)
      |SELECT l_returnflag, is_promo, n_obs,
      |  (CAST(dd AS DOUBLE) * CAST(dd AS DOUBLE))
      |    / ((CAST(n AS DOUBLE) * CAST(rt AS DOUBLE)) * CAST(ct AS DOUBLE))
      |    AS contrib
      |FROM d
      |ORDER BY l_returnflag, is_promo""".stripMargin

  // ------------------------------------------------------------ tvd drift

  /** Total-variation-distance drift between the purchase-value
    * distribution of the FIRST and SECOND half of the event-time range —
    * the ln-free drift gauge (PSI's log-ratio is not cross-engine
    * hashable; TVD's `½·Σ|p_b − q_b|` is, because
    * `|n_a·N_b − n_b·N_a|` is exact integer arithmetic).
    *
    * The time split point is `(min_us + max_us) div 2` (integer
    * microseconds, one broadcast scalar row), values bin into 10
    * fixed-width cents buckets from the global max (same scalar scan),
    * and per-bucket early/late counts come from ONE conditional
    * aggregation pass. `n_a·N_b` reaches ~10²⁴ at 100 TB → DECIMAL
    * (HUGEINT oracle-side). Per-bucket `contrib` is the one double:
    * `d / ((2·N_a)·N_b)`; Σ contrib = TVD ∈ [0,1].
    */
  def tvdValueDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr("unix_micros(cast(ts as timestamp))").as("us"),
        round(col("value") * 100).cast("long").as("cents"))
    val scal = ev.agg(min(col("us")).as("mn_us"), max(col("us")).as("mx_us"),
      max(col("cents")).as("mx_c"))
    val counts = ev.crossJoin(broadcast(scal))
      .select(expr("(cents * 10) div (mx_c + 1)").as("bucket"),
        (col("us") < expr("(mn_us + mx_us) div 2")).as("early"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("early"), 0L).otherwise(1L)).as("n_b"))
    val overall = Window.partitionBy() // 10 bucket rows — bounded domain
    counts
      .withColumn("na_tot", sum(col("n_a")).over(overall))
      .withColumn("nb_tot", sum(col("n_b")).over(overall))
      .withColumn("d",
        abs((expr("cast(n_a as decimal(19,0))") * expr("cast(nb_tot as decimal(19,0))")) -
          (expr("cast(n_b as decimal(19,0))") * expr("cast(na_tot as decimal(19,0))"))))
      .select(col("bucket"), col("n_a"), col("n_b"),
        (col("d").cast("double") /
          ((lit(2.0d) * col("na_tot").cast("double")) *
            col("nb_tot").cast("double"))).as("contrib"))
      .orderBy(col("bucket"))
  }

  val tvdValueDriftSql: String =
    """WITH ev AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |scal AS (
      |  SELECT min(us) AS mn_us, max(us) AS mx_us, max(cents) AS mx_c FROM ev),
      |b AS (
      |  SELECT (cents * 10) // (mx_c + 1) AS bucket,
      |    us < (mn_us + mx_us) // 2 AS early
      |  FROM ev, scal),
      |g AS (
      |  SELECT bucket,
      |    CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      |  FROM b GROUP BY bucket),
      |t AS (
      |  SELECT bucket, n_a, n_b,
      |    CAST(sum(n_a) OVER () AS BIGINT) AS na_tot,
      |    CAST(sum(n_b) OVER () AS BIGINT) AS nb_tot
      |  FROM g)
      |SELECT bucket, n_a, n_b,
      |  CAST(abs(CAST(n_a AS HUGEINT) * CAST(nb_tot AS HUGEINT)
      |      - CAST(n_b AS HUGEINT) * CAST(na_tot AS HUGEINT)) AS DOUBLE)
      |    / ((CAST(2 AS DOUBLE) * CAST(na_tot AS DOUBLE)) * CAST(nb_tot AS DOUBLE))
      |    AS contrib
      |FROM t
      |ORDER BY bucket""".stripMargin

  // ----------------------------------------------------------------- hits

  /** HITS hub/authority scoring on the bipartite customer–part purchase
    * graph — two unnormalized power iterations (a₀ = 1 → h₁ = deg(c) →
    * a₁ → h₂ → a₂), emitting the top-20 authority parts.
    *
    * Unnormalized iterates are INTEGER path counts (a₂(p) = # length-4
    * alternating paths ending at p), which keeps every iteration
    * bit-exact cross-engine — the usual L2 normalization only rescales
    * rank order, so top-k by a₂ is top-k by authority. Iterate
    * magnitudes reach ~10¹⁷ at 100 TB (deg ~30, |C| ~10⁷), so the last
    * two sums widen to DECIMAL/HUGEINT before they can wrap; the FINAL
    * column is narrowed back to BIGINT (repo gate convention — the
    * driver's hasher normalizes decimal128 and int64 differently, and
    * authority fits int64 at every gate sf).
    *
    * Scale shape: the edge list is localCheckpointed once and reused by
    * three keyed aggregation joins (never recomputed from base tables);
    * top-20 plans as TakeOrderedAndProject (distributed partial top-k),
    * NOT a global window.
    */
  def hitsPowerIteration(spark: SparkSession, sfDir: String): DataFrame = {
    // One lazy plan, no checkpoint: the checkpointed LogicalRDD reported
    // UnknownPartitioning, so each of the three hub/authority passes
    // re-SHUFFLED the billion-row edge list AND re-sorted it for its
    // SortMergeJoin — the r14 ×1000 audit killed this shape with an
    // execution-memory exhaustion (32 concurrent SMJ sorts + aggs).
    // Lazy + explicit not-null filters (canonical-equality hygiene, see
    // GraphQueries.pagerankBipartite) lets AQE materialize the distinct
    // edge exchange once and re-read it per pass; shuffle_hash on the
    // Θ(|V|) aggregate side streams the edge side with no sort at all.
    val edges = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .filter(col("c").isNotNull && col("p").isNotNull)
      .distinct()
    val h1 = edges.groupBy(col("c")).agg(count(lit(1)).as("h1"))
    val a1 = edges.join(h1.hint("shuffle_hash"), "c")
      .groupBy(col("p")).agg(sum(col("h1")).as("a1"))
    val h2 = edges.join(a1.hint("shuffle_hash"), "p").groupBy(col("c"))
      .agg(sum(expr("cast(a1 as decimal(19,0))")).as("h2"))
    edges.join(h2.hint("shuffle_hash"), "c").groupBy(col("p"))
      .agg(sum(col("h2")).as("authority"))
      .orderBy(col("authority").desc, col("p"))
      .limit(20)
      .select(col("p").as("p_partkey"), col("authority").cast("long").as("authority"))
  }

  val hitsPowerIterationSql: String =
    """WITH edges AS (
      |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |h1 AS (SELECT c, CAST(count(*) AS BIGINT) AS h1 FROM edges GROUP BY c),
      |a1 AS (
      |  SELECT p, CAST(sum(h1) AS BIGINT) AS a1
      |  FROM edges JOIN h1 USING (c) GROUP BY p),
      |h2 AS (
      |  SELECT c, CAST(sum(CAST(a1 AS HUGEINT)) AS HUGEINT) AS h2
      |  FROM edges JOIN a1 USING (p) GROUP BY c)
      |SELECT p AS p_partkey, CAST(CAST(sum(h2) AS HUGEINT) AS BIGINT) AS authority
      |FROM edges JOIN h2 USING (c)
      |GROUP BY p
      |ORDER BY authority DESC, p
      |LIMIT 20""".stripMargin

  // -------------------------------------------------------- link predict

  /** Common-neighbor link prediction between customers: the top-50
    * customer pairs by number of SHARED purchased parts, with the
    * Jaccard overlap of their (rare-)part sets — the "these two accounts
    * behave alike" primitive behind lookalike audiences and co-buyer
    * recommendation.
    *
    * The quadratic guard is the inverted-index df-prune the corpus
    * queries use for grams: parts bought by more than 40 distinct
    * customers are dropped BEFORE pairing (a head part with 10⁵ buyers
    * at 100 TB would alone contribute 10¹⁰ pairs), so pair generation
    * costs Σ_{df≤40} df² ≤ 40·|E| — linear in the edge list. Degrees are
    * computed over the SAME pruned universe so the Jaccard is internally
    * consistent (documented estimator choice, identical in the oracle).
    * Top-50 by (common desc, c1, c2) plans as TakeOrderedAndProject; the
    * one double is `common / (d1 + d2 − common)`.
    */
  def linkPredictUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
      .stableCheckpoint()
    val rare = edges.groupBy(col("p")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 40)
      .select(col("p"))
    val re = edges.join(rare, "p") // rare-part edge list
    val deg = re.groupBy(col("c")).agg(count(lit(1)).as("deg"))
    // Pair generation KEEPS the self-join shape DELIBERATELY: the
    // sorted_pairs kernel was tried here (r18 second session) and
    // measured WORSE — the rare-edge sets reach C(40,2)=780 pairs per
    // part, where collect_set's object-hash aggregation costs more than
    // the exchange-reused sort-merge self-join it replaces (isolated
    // min-of-5 family context: 2.80 s kernel-unhinted / 4.19 s
    // kernel+SHJ-pinned deg joins vs 2.58 s this shape). The graph
    // family's small per-order baskets are where the kernel wins.
    val pairs = re.select(col("p"), col("c").as("c1"))
      .join(re.select(col("p"), col("c").as("c2")), "p")
      .filter(col("c1") < col("c2"))
      .groupBy(col("c1"), col("c2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(deg.select(col("c").as("c1"), col("deg").as("d1")), "c1")
      .join(deg.select(col("c").as("c2"), col("deg").as("d2")), "c2")
      .orderBy(col("common").desc, col("c1"), col("c2"))
      .limit(50)
      .select(col("c1"), col("c2"), col("common"), col("d1"), col("d2"),
        (col("common").cast("double") /
          (col("d1") + col("d2") - col("common")).cast("double")).as("jaccard"))
  }

  val linkPredictUsersSql: String =
    """WITH edges AS (
      |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |rare AS (
      |  SELECT p FROM edges GROUP BY p HAVING count(*) <= 40),
      |re AS (SELECT c, p FROM edges JOIN rare USING (p)),
      |deg AS (SELECT c, CAST(count(*) AS BIGINT) AS deg FROM re GROUP BY c),
      |pairs AS (
      |  SELECT a.c AS c1, b.c AS c2, CAST(count(*) AS BIGINT) AS common
      |  FROM re a JOIN re b ON a.p = b.p AND a.c < b.c
      |  GROUP BY a.c, b.c),
      |top AS (
      |  SELECT c1, c2, common, da.deg AS d1, db.deg AS d2
      |  FROM pairs
      |  JOIN deg da ON da.c = c1
      |  JOIN deg db ON db.c = c2
      |  ORDER BY common DESC, c1, c2
      |  LIMIT 50)
      |SELECT c1, c2, common, d1, d2,
      |  CAST(common AS DOUBLE) / CAST(d1 + d2 - common AS DOUBLE) AS jaccard
      |FROM top
      |ORDER BY common DESC, c1, c2""".stripMargin

  // ------------------------------------------------------------- AMS F2

  /** AMS (Alon–Matias–Szegedy) sketch of the second frequency moment
    * F2 = Σ_u f_u² of the events-per-user distribution — the classic
    * one-pass self-join-size / skew estimator (AMS, STOC'96; the
    * sign-hash z_j = Σ_u f_u·s_j(u) has E[z²] = F2).
    *
    * 9 independent estimator rows × 64 sign counters each: signs come
    * from bit 0 of `xxhash64(user_id, j)`, per-row sums-of-64-z² are
    * EXACT integers (widened to DECIMAL — z ~ 10¹² at 100 TB squares
    * past long; the exact F2 is emitted as two 60-bit BIGINT limbs,
    * f2 = f2_hi·2⁶⁰ + f2_lo — exact below 2¹²⁰, and within_bound
    * self-certifies that range, see the r13 note at the emission), and
    * the median-of-9 is picked by sorting the 9-element
    * collected array — every arithmetic step deterministic, no doubles
    * anywhere. Like the KLL gates, the emitted row is a VERDICT: the
    * median row-sum must lie within 25% of 64·F2_exact (mean-of-64
    * std ≈ √(2/64)·F2 ≈ 0.18·F2; median-of-9 concentrates well inside
    * 25%), alongside F2_exact itself which the oracle recomputes — so a
    * sketch regression flips the boolean or the exact value and fails
    * the hash gate.
    *
    * Scale shape: one groupBy(user) for frequencies, a 576-way explode
    * that partial-aggregates map-side down to 576 counter rows, then
    * 9-row folds — no global sorts, no windows over raw data.
    */
  def amsF2Moment(spark: SparkSession, sfDir: String): DataFrame = {
    val rows = 9
    val cols = 64
    val f = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("fu"))
      .stableCheckpoint()
    val z = f
      .select(col("user_id"), col("fu"),
        explode(expr(s"sequence(0, ${rows * cols - 1})")).as("j"))
      .select(col("j"),
        (when(expr("(xxhash64(user_id, j) & 1) = 0"), lit(1L)).otherwise(lit(-1L))
          * col("fu")).as("sz"))
      .groupBy(col("j")).agg(sum(col("sz")).as("z"))
    val rowSums = z
      .groupBy(expr(s"j div $cols").as("r"))
      .agg(sum(expr("cast(z as decimal(19,0)) * cast(z as decimal(19,0))")).as("s2"))
    val med = rowSums.agg(sort_array(collect_list(col("s2"))).as("arr"))
      .select(element_at(col("arr"), (rows + 1) / 2).as("med_sum"))
    val f2 = f.agg(
      sum(expr("cast(fu as decimal(19,0)) * cast(fu as decimal(19,0))")).as("f2_exact"))
    // r12 overflow sweep: f2_exact is a SECOND MOMENT — one hot user at
    // ~3·10⁹ events squares past int64, so the old `cast(f2 as long)`
    // emission was the covariance-drift wrap class (Spark's non-ANSI
    // decimal→long cast wraps silently; DuckDB fails loudly). Emit the
    // exact value as two 60-bit limbs instead (f2 = hi·2⁶⁰ + lo), each
    // provably < 2⁶⁰ ≤ Long.Max: exact reconstruction up to 2¹²⁰ ≈
    // 1.3·10³⁶ ≥ n² for any corpus below ~10¹⁸ events rows — wrap-proof
    // at every physical scale, and still a full-strength exactness gate
    // (any F2 drift flips a limb). The verdict math stays all-decimal.
    val limb = "1152921504606846976" // 2^60
    // r13 (advice): `div` on DECIMAL wraps silently under BOTH ANSI
    // settings (F2LimbSpec), so for f2 ≥ 2^120 the hi limb would wrap
    // while the scaladoc claims wrap-proof. Fold the width bound INTO the
    // verdict column: within_bound now ALSO asserts f2_exact < 2^120, so
    // an out-of-range corpus flips the boolean and fails the hash gate
    // loudly — the Spark emission is self-certifying, not reliant on the
    // oracle replay's HUGEINT→BIGINT cast failing first.
    val limbSq = "1329227995784915872903807060280344576" // 2^120
    f2.crossJoin(broadcast(med))
      .select(
        expr(s"cast(f2_exact div $limb as long)").as("f2_hi"),
        expr(s"cast(f2_exact % $limb as long)").as("f2_lo"),
        ((abs(col("med_sum") - lit(cols) * col("f2_exact")) <=
          lit(cols / 4) * col("f2_exact")) &&
          col("f2_exact") < expr(s"cast('$limbSq' as decimal(38,0))"))
          .as("within_bound"))
  }

  val amsF2MomentSql: String =
    """WITH f AS (SELECT count(*) AS c FROM events GROUP BY user_id),
      |s AS (SELECT sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS f2 FROM f)
      |SELECT CAST(f2 // 1152921504606846976 AS BIGINT) AS f2_hi,
      |  CAST(f2 % 1152921504606846976 AS BIGINT) AS f2_lo,
      |  TRUE AS within_bound
      |FROM s""".stripMargin
}
