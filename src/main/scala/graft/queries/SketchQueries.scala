package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.HyperLogLogAggregator

/** Sketch-based aggregation queries. The point of this surface is that
  * even APPROXIMATE answers are deterministic and cross-engine
  * replayable: the sketches hash with md5 (identical everywhere), score
  * with integer arithmetic, and keep floating point to one final division
  * of identical operands — so the DuckDB oracle reproduces the estimate
  * bit-for-bit and the driver hash-gate applies to a sketch.
  */
object SketchQueries {

  /** Per-event-type distinct users: HyperLogLog estimate (m=64 registers
    * via [[HyperLogLogAggregator]]) side-by-side with the exact distinct
    * and the signed relative error. ONE shuffle carries 64-byte sketches
    * (map-side combined), vs the exact path's full user-id sets — at
    * 100 TB the sketch column is why the query still fits; the exact
    * column is the sf-scale audit.
    *
    * The 64-entry register fold runs as an interpreted HOF lambda — on
    * ONE ROW PER GROUP (5 groups here), not per input row, so codegen
    * is irrelevant to it; the per-row hot path is the aggregator's
    * integer reduce.
    */
  def sketchHllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val hll = HyperLogLogAggregator.hllSketch
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        hll(col("user_id").cast("string")).as("regs"),
        countDistinct(col("user_id")).as("exact_distinct"))
      // S = Σ 2^(55-M[j]) — exact int64 (≤ 64·2^55); empty registers
      // (rho 0) contribute 2^55 each automatically
      .withColumn("s_dyadic",
        expr("aggregate(regs, 0L, (a, r) -> a + shiftleft(1L, 55 - r))"))
      // decimal-point literals parse as DECIMAL in both engines — cast
      // every constant to double explicitly or the α·m²·2^55 product
      // overflows decimal math (and would round differently anyway)
      .withColumn("hll_estimate",
        expr("cast(0.709 as double) * cast(4096 as double)" +
          " * cast(36028797018963968 as double) / cast(s_dyadic as double)"))
      .withColumn("rel_error",
        expr("(hll_estimate - cast(exact_distinct as double)) / cast(exact_distinct as double)"))
      .select(col("event_type"), col("s_dyadic"), col("hll_estimate"),
        col("exact_distinct"), col("rel_error"))
      .orderBy(col("event_type"))
  }

  val sketchHllDistinctSql: String =
    """WITH h AS (
      |  SELECT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv,
      |    user_id
      |  FROM events),
      |r AS (
      |  SELECT event_type, hv % 64 AS j,
      |    max(55 - (CASE WHEN hv // 64 = 0 THEN 0
      |              ELSE length(printf('%b', hv // 64)) END)) AS rho
      |  FROM h GROUP BY event_type, hv % 64),
      |s AS (
      |  SELECT event_type,
      |    CAST(sum(1::BIGINT << (55 - rho)) AS BIGINT)
      |      + (64 - count(*)) * (1::BIGINT << 55) AS s_dyadic
      |  FROM r GROUP BY event_type),
      |e AS (
      |  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      |  FROM events GROUP BY event_type)
      |SELECT s.event_type, s_dyadic,
      |  CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
      |    * CAST(36028797018963968 AS DOUBLE) / CAST(s_dyadic AS DOUBLE)
      |    AS hll_estimate,
      |  exact_distinct,
      |  (CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
      |    * CAST(36028797018963968 AS DOUBLE) / CAST(s_dyadic AS DOUBLE)
      |    - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE)
      |    AS rel_error
      |FROM s JOIN e ON s.event_type = e.event_type
      |ORDER BY s.event_type""".stripMargin

  /** Price quantiles via the mergeable KLL/MRL sketch
    * ([[graft.functions.KllQuantileAggregator]]) — the bounded-memory
    * replacement for exact `percentile` at 100 TB. Gated in the provably
    * exact regime: k = 65536 > |lineitem @ sf0.01| = 60 000, so no level
    * ever compacts, the sketch retains every value at weight 1, and the
    * answer is the exact order statistic at rank ⌊(pct/100)·(n−1)⌋,
    * reproduced by the oracle's row_number window. Integer cents
    * end-to-end; the only double is the rank target, computed from
    * identical operands with identical association in both engines.
    */
  def sketchQuantile(spark: SparkSession, sfDir: String): DataFrame = {
    val pcts = Seq(1, 5, 25, 50, 75, 95, 99)
    val kll = graft.functions.KllQuantileAggregator.kllQuantiles(65536, pcts)
    Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .agg(kll(col("cents")).as("qv"))
      .select(posexplode(col("qv")).as(Seq("pos", "value_cents")))
      .select(
        element_at(typedLit(pcts.map(_.toLong)), col("pos").cast("int") + 1)
          .as("q_pct"),
        col("value_cents"))
      .orderBy(col("q_pct"))
  }

  val sketchQuantileSql: String =
    """WITH v AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
      |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
      |n AS (SELECT count(*) AS n FROM v),
      |q AS (SELECT unnest([1, 5, 25, 50, 75, 95, 99]) AS q_pct),
      |t AS (
      |  SELECT CAST(q_pct AS BIGINT) AS q_pct,
      |    CAST(floor((CAST(q_pct AS DOUBLE) / CAST(100 AS DOUBLE))
      |      * CAST(n.n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rn
      |  FROM q, n)
      |SELECT t.q_pct, r.c AS value_cents
      |FROM t JOIN r USING (rn)
      |ORDER BY q_pct""".stripMargin

  /** Per-group quantiles via one KLL sketch PER GROUP — the grouped shape
    * that matters at 100 TB: each map task carries one bounded buffer per
    * (task, group), partials combine map-side, and the shuffle moves
    * sketches, not values. Exact regime again: k = 16384 > every
    * o_orderpriority group (~3k orders at sf0.01), so the per-group
    * answer is the exact order statistic and the oracle is a per-group
    * row_number window.
    */
  def groupQuantileSketch(spark: SparkSession, sfDir: String): DataFrame = {
    val pcts = Seq(25, 50, 75)
    val kll = graft.functions.KllQuantileAggregator.kllQuantiles(16384, pcts)
    Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(kll(col("cents")).as("qv"))
      .select(col("o_orderpriority"),
        posexplode(col("qv")).as(Seq("pos", "value_cents")))
      .select(col("o_orderpriority"),
        element_at(typedLit(pcts.map(_.toLong)), col("pos").cast("int") + 1)
          .as("q_pct"),
        col("value_cents"))
      .orderBy(col("o_orderpriority"), col("q_pct"))
  }

  val groupQuantileSketchSql: String =
    """WITH v AS (
      |  SELECT o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
      |  FROM orders),
      |r AS (
      |  SELECT o_orderpriority, c,
      |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY c) AS rn,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM v),
      |g AS (SELECT DISTINCT o_orderpriority, n FROM r),
      |q AS (SELECT unnest([25, 50, 75]) AS q_pct),
      |t AS (
      |  SELECT o_orderpriority, CAST(q_pct AS BIGINT) AS q_pct,
      |    CAST(floor((CAST(q_pct AS DOUBLE) / CAST(100 AS DOUBLE))
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rn
      |  FROM g, q)
      |SELECT t.o_orderpriority, t.q_pct, r.c AS value_cents
      |FROM t JOIN r ON r.o_orderpriority = t.o_orderpriority AND r.rn = t.rn
      |ORDER BY t.o_orderpriority, t.q_pct""".stripMargin

  /** Trailing-7-day distinct users via MERGED daily HLL sketches — the
    * query that shows WHY sketches exist at 100 TB: each day aggregates
    * once into 64 registers, and every window answer is a register-wise
    * MAX over ≤ 7 sketches (64·7 longs), never a re-scan of the raw
    * events. The union-merge happens in plain SQL (long-form registers +
    * max), so the oracle replays it exactly; the exact rolling distinct
    * rides along as the audit column. Contribution-explode pattern as in
    * `rolling_distinct_users`: each day's registers fan to the 7 windows
    * that can see them.
    */
  def sketchRollingDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val hll = HyperLogLogAggregator.hllSketch
    val ev = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      // NUMBERED repartition: parallelize the per-row HLL hashing that
      // would otherwise run inside the single-partition scan stage
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val days = ev.select(col("day").as("win_end")).distinct()
    val merged = ev.groupBy(col("day"))
      .agg(hll(col("user_id").cast("string")).as("regs"))
      .select(col("day"), posexplode(col("regs")).as(Seq("j", "rho")))
      .select(col("day"), col("j"), col("rho"),
        explode(sequence(lit(0), lit(6))).as("k"))
      .select(date_add(col("day"), col("k")).as("win_end"), col("j"), col("rho"))
      .join(days, "win_end")
      .groupBy(col("win_end"), col("j")).agg(max(col("rho")).as("rho"))
      // all 64 registers exist per window (empty = rho 0 → 2^55 term)
      .groupBy(col("win_end"))
      .agg(sum(expr("shiftleft(1L, 55 - rho)")).as("s_dyadic"))
    val exact = ev.distinct()
      .select(col("user_id"), col("day"),
        explode(sequence(lit(0), lit(6))).as("k"))
      .select(col("user_id"), date_add(col("day"), col("k")).as("win_end"))
      .join(days, "win_end")
      .groupBy(col("win_end")).agg(countDistinct(col("user_id")).as("exact_7d"))
    merged.join(exact, "win_end")
      .withColumn("hll_estimate",
        expr("cast(0.709 as double) * cast(4096 as double)" +
          " * cast(36028797018963968 as double) / cast(s_dyadic as double)"))
      .withColumn("rel_error",
        expr("(hll_estimate - cast(exact_7d as double)) / cast(exact_7d as double)"))
      .select(col("win_end"), col("s_dyadic"), col("hll_estimate"),
        col("exact_7d"), col("rel_error"))
      .orderBy(col("win_end"))
  }

  /** Join-size estimation from Count-Min sketches — the planner-side use
    * of a frequency sketch: |A ⋈_k B| = Σ_k cntA(k)·cntB(k), and the
    * inner product of two CMS counter rows upper-bounds it (min over the
    * d rows = the classic estimate). Here the self-join of lineitem on
    * l_partkey: the exact answer needs only the (key, count) table; the
    * sketch answer needs 8 KB per side no matter the key cardinality —
    * what a 100 TB optimizer consults BEFORE committing to a shuffle
    * plan. All integer arithmetic; the estimate ≥ exact property is
    * visible in the gated output.
    */
  def joinSizeEstimate(spark: SparkSession, sfDir: String): DataFrame = {
    val cms = graft.functions.CountMinAggregator.cmSketch
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("string").as("k"))
    val exact = li.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact_pairs"))
    val sketch = li.agg(cms(col("k")).as("s"))
      // row-wise inner products of the sketch with itself: for each of
      // the d=4 rows, sum counter² over that row's 256 buckets; estimate
      // = min over rows. One row total — the HOF runs once, not per input.
      .select((0 until graft.functions.CountMinAggregator.D).map { j =>
        val w = graft.functions.CountMinAggregator.W
        expr(s"aggregate(slice(s, ${j * w + 1}, $w), 0L, (a, x) -> a + x * x)")
          .as(s"r$j")
      }: _*)
      .select(least((0 until graft.functions.CountMinAggregator.D)
        .map(j => col(s"r$j")): _*).as("cms_estimate"))
    exact.crossJoin(broadcast(sketch))
      .select(col("exact_pairs"), col("cms_estimate"),
        (col("cms_estimate") - col("exact_pairs")).as("overestimate"))
  }

  val joinSizeEstimateSql: String = {
    // interpolate the sketch geometry from the shared constants so a
    // D/W retune cannot silently break oracle parity
    val d = graft.functions.CountMinAggregator.D
    val w = graft.functions.CountMinAggregator.W
    s"""WITH k AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
      |exact AS (
      |  SELECT CAST(sum(c * c) AS BIGINT) AS exact_pairs
      |  FROM (SELECT k, count(*) AS c FROM k GROUP BY 1)),
      |seeds AS (SELECT unnest([${(0 until d).mkString(", ")}]) AS j),
      |buck AS (
      |  SELECT j,
      |    ('0x' || substr(md5(j::VARCHAR || ':' || k), 1, 15))::BIGINT % $w AS b,
      |    count(*) AS c
      |  FROM k, seeds GROUP BY 1, 2),
      |rows_ AS (
      |  SELECT j, CAST(sum(c * c) AS BIGINT) AS ip FROM buck GROUP BY j),
      |est AS (SELECT CAST(min(ip) AS BIGINT) AS cms_estimate FROM rows_)
      |SELECT exact_pairs, cms_estimate,
      |  cms_estimate - exact_pairs AS overestimate
      |FROM exact, est""".stripMargin
  }

  /** HLL SET ALGEBRA: estimated audience overlap |A ∩ B| between two
    * event types by inclusion–exclusion over MERGED registers —
    * est(A) + est(B) − est(A ∪ B), where the union sketch is the
    * register-wise max (the merge law the streaming spec proves). This
    * is why HLL beats exact sets at 100 TB: the overlap of two
    * billion-user audiences is three 64-register estimates, no set
    * intersection anywhere. Exact intersection rides along as the
    * sf-scale audit; all estimate math is the same fixed operand order
    * as `sketch_hll_distinct`, so the oracle reproduces it bit-for-bit.
    */
  def hllOverlapEstimate(spark: SparkSession, sfDir: String): DataFrame = {
    val hll = HyperLogLogAggregator.hllSketch
    val ev = Tables.events(spark, sfDir)
    def regsOf(etype: String) = ev.filter(col("event_type") === etype)
      .agg(hll(col("user_id").cast("string")).as(s"regs"))
    def estOf(regsCol: String) =
      expr(s"cast(0.709 as double) * cast(4096 as double)" +
        s" * cast(36028797018963968 as double) / cast(s_$regsCol as double)")
    val exact = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
      .join(ev.filter(col("event_type") === "click")
        .select(col("user_id")).distinct(), "user_id")
      .agg(count(lit(1)).as("exact_intersection"))
    regsOf("purchase").toDF("regs_a")
      .crossJoin(broadcast(regsOf("click").toDF("regs_b")))
      .withColumn("regs_u",
        expr("zip_with(regs_a, regs_b, (x, y) -> greatest(x, y))"))
      .withColumn("s_a",
        expr("aggregate(regs_a, 0L, (a, r) -> a + shiftleft(1L, 55 - r))"))
      .withColumn("s_b",
        expr("aggregate(regs_b, 0L, (a, r) -> a + shiftleft(1L, 55 - r))"))
      .withColumn("s_u",
        expr("aggregate(regs_u, 0L, (a, r) -> a + shiftleft(1L, 55 - r))"))
      .withColumn("est_a", estOf("a"))
      .withColumn("est_b", estOf("b"))
      .withColumn("est_union", estOf("u"))
      // inclusion-exclusion can go slightly NEGATIVE for small/disjoint
      // audiences (estimator noise); clamp at 0 — identically in the
      // oracle — so downstream consumers never see a nonsensical negative
      // intersection (negative ≡ indistinguishable from zero overlap)
      .withColumn("est_intersection",
        greatest(lit(0.0d), col("est_a") + col("est_b") - col("est_union")))
      .crossJoin(broadcast(exact))
      .withColumn("rel_error",
        (col("est_intersection") - col("exact_intersection").cast("double"))
          / col("exact_intersection").cast("double"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        col("est_intersection"), col("exact_intersection"), col("rel_error"))
  }

  val hllOverlapEstimateSql: String =
    """WITH h AS (
      |  SELECT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv,
      |    user_id
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |r AS (
      |  SELECT event_type, hv % 64 AS j,
      |    max(55 - (CASE WHEN hv // 64 = 0 THEN 0
      |              ELSE length(printf('%b', hv // 64)) END)) AS rho
      |  FROM h GROUP BY event_type, hv % 64),
      |ru AS (SELECT j, max(rho) AS rho FROM r GROUP BY j),
      |sa AS (
      |  SELECT CAST(sum(1::BIGINT << (55 - rho)) AS BIGINT)
      |    + (64 - count(*)) * (1::BIGINT << 55) AS s
      |  FROM r WHERE event_type = 'purchase'),
      |sb AS (
      |  SELECT CAST(sum(1::BIGINT << (55 - rho)) AS BIGINT)
      |    + (64 - count(*)) * (1::BIGINT << 55) AS s
      |  FROM r WHERE event_type = 'click'),
      |su AS (
      |  SELECT CAST(sum(1::BIGINT << (55 - rho)) AS BIGINT)
      |    + (64 - count(*)) * (1::BIGINT << 55) AS s
      |  FROM ru),
      |ex AS (
      |  SELECT CAST(count(*) AS BIGINT) AS exact_intersection FROM (
      |    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |    a JOIN (
      |    SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
      |    b USING (user_id)),
      |e AS (
      |  SELECT
      |    CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
      |      * CAST(36028797018963968 AS DOUBLE) / CAST(sa.s AS DOUBLE)
      |      AS est_a,
      |    CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
      |      * CAST(36028797018963968 AS DOUBLE) / CAST(sb.s AS DOUBLE)
      |      AS est_b,
      |    CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
      |      * CAST(36028797018963968 AS DOUBLE) / CAST(su.s AS DOUBLE)
      |      AS est_union
      |  FROM sa, sb, su)
      |SELECT est_a, est_b, est_union,
      |  greatest(CAST(0 AS DOUBLE), est_a + est_b - est_union)
      |    AS est_intersection,
      |  exact_intersection,
      |  (greatest(CAST(0 AS DOUBLE), est_a + est_b - est_union)
      |    - CAST(exact_intersection AS DOUBLE))
      |    / CAST(exact_intersection AS DOUBLE) AS rel_error
      |FROM e, ex""".stripMargin

  /** APPROXIMATE-REGIME error-bound gate for the KLL sketch (the n ≫ k
    * regime `sketch_quantile` documents but — until round 5 — only
    * prose-bounded): at k = 512 the lineitem cents column compacts
    * heavily at every gate scale (6k/60k/600k values), so the estimate is
    * merge-order-dependent and cannot be hash-compared. What IS
    * deterministic is the sketch's contract: the returned value's true
    * rank lies within ε·n of the target rank. One extra aggregation pass
    * computes each estimate's exact rank range (count <, count ≤ — a
    * 4-row broadcast onto one scan), and the emitted row is the VERDICT
    * `(q_pct, within_bound)`; the oracle supplies the expected all-true
    * rows, so a sketch regression flips a boolean and fails the hash
    * gate. ε = 0.05 is ~10× the empirically pinned error at this depth
    * ([[KllQuantileSpec]]: ≤2% rank error at k = 256, n = 100k) —
    * tight against real drift, robust to merge-order variance.
    */
  def kllErrorBound(spark: SparkSession, sfDir: String): DataFrame = {
    val pcts = Seq(10, 50, 90, 99)
    val kll = graft.functions.KllQuantileAggregator.kllQuantiles(512, pcts)
    val v = Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
    val est = v.agg(kll(col("c")).as("qv"))
      .select(posexplode(col("qv")).as(Seq("pos", "est")))
      .select(
        element_at(typedLit(pcts.map(_.toLong)), col("pos").cast("int") + 1)
          .as("q_pct"),
        col("est"))
    v.crossJoin(broadcast(est))
      .groupBy(col("q_pct"), col("est"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c") < col("est"), 1L).otherwise(0L)).as("lt"),
        sum(when(col("c") <= col("est"), 1L).otherwise(0L)).as("le"))
      // true rank range of est is [lt, le-1]; target t = floor(pct%·(n−1))
      .withColumn("t",
        floor(col("q_pct").cast("double") / lit(100.0d)
          * (col("n") - 1).cast("double")).cast("long"))
      .withColumn("eps_n", (lit(0.05d) * col("n").cast("double")).cast("long"))
      .select(col("q_pct"),
        ((col("lt") - col("t") <= col("eps_n")) &&
          (col("t") - (col("le") - 1) <= col("eps_n"))).as("within_bound"))
      .orderBy(col("q_pct"))
  }

  val kllErrorBoundSql: String =
    """SELECT CAST(q_pct AS BIGINT) AS q_pct, TRUE AS within_bound
      |FROM (SELECT unnest([10, 50, 90, 99]) AS q_pct) q
      |ORDER BY q_pct""".stripMargin

  /** Per-group twin of [[kllErrorBound]] — the `group_quantile_sketch`
    * approximate regime: k = 256 per (o_orderpriority) group (≈300 /
    * 3k / 30k orders per group across the gate scales, all past the
    * compaction point). Same verdict-row design: the oracle derives the
    * expected (group × pct) all-true grid from the data, Spark asserts
    * each per-group estimate's true rank within ε·n_group of target.
    */
  def kllGroupErrorBound(spark: SparkSession, sfDir: String): DataFrame = {
    val pcts = Seq(25, 50, 75)
    val kll = graft.functions.KllQuantileAggregator.kllQuantiles(256, pcts)
    val v = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
    val est = v.groupBy(col("o_orderpriority"))
      .agg(kll(col("c")).as("qv"))
      .select(col("o_orderpriority"),
        posexplode(col("qv")).as(Seq("pos", "est")))
      .select(col("o_orderpriority"),
        element_at(typedLit(pcts.map(_.toLong)), col("pos").cast("int") + 1)
          .as("q_pct"),
        col("est"))
    v.join(broadcast(est), "o_orderpriority")
      .groupBy(col("o_orderpriority"), col("q_pct"), col("est"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c") < col("est"), 1L).otherwise(0L)).as("lt"),
        sum(when(col("c") <= col("est"), 1L).otherwise(0L)).as("le"))
      .withColumn("t",
        floor(col("q_pct").cast("double") / lit(100.0d)
          * (col("n") - 1).cast("double")).cast("long"))
      .withColumn("eps_n", (lit(0.05d) * col("n").cast("double")).cast("long"))
      .select(col("o_orderpriority"), col("q_pct"),
        ((col("lt") - col("t") <= col("eps_n")) &&
          (col("t") - (col("le") - 1) <= col("eps_n"))).as("within_bound"))
      .orderBy(col("o_orderpriority"), col("q_pct"))
  }

  val kllGroupErrorBoundSql: String =
    """SELECT DISTINCT o_orderpriority, CAST(q_pct AS BIGINT) AS q_pct,
      |  TRUE AS within_bound
      |FROM orders, (SELECT unnest([25, 50, 75]) AS q_pct) q
      |ORDER BY o_orderpriority, q_pct""".stripMargin

  /** KMV (bottom-k / k-minimum-values) distinct-count sketch — the
    * third leg of the sketch family next to HLL and KLL: hash each
    * member into the 60-bit md5 space, keep the k smallest distinct
    * hashes, estimate |D| ≈ (k−1)·2⁶⁰ / h_k. Fully SQL-expressible —
    * the per-group bottom-k is a rank filter (WindowGroupLimit partial
    * top-k at scale: map tasks forward ≤ k hashes per group, the exact
    * shape a mergeable KMV aggregator would shuffle) — so unlike HLL/KLL
    * the ESTIMATE itself is deterministic and the oracle replays it
    * bit-for-bit, exact-count audit and relative error alongside.
    * k adapts to min(64, |group|) so the estimator stays defined at
    * every gate scale.
    */
  def sketchKmv(spark: SparkSession, sfDir: String): DataFrame = {
    val two60 = "1152921504606846976"
    val h = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("h",
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
    val nDist = h.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"))
    h.withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("h"))).cast("long"))
      .filter(col("rn") <= 64)
      .join(broadcast(nDist), "event_type")
      .withColumn("k", least(lit(64L), col("n_exact")))
      .filter(col("rn") === col("k"))
      .select(col("event_type"), col("n_exact"), col("k"),
        col("h").as("h_k"))
      .withColumn("est_kmv",
        (col("k") - 1).cast("double") * expr(s"cast($two60 as double)")
          / col("h_k").cast("double"))
      .withColumn("rel_error",
        (col("est_kmv") - col("n_exact").cast("double"))
          / col("n_exact").cast("double"))
      .orderBy(col("event_type"))
  }

  val sketchKmvSql: String =
    """WITH u AS (
      |  SELECT DISTINCT event_type, user_id FROM events),
      |h AS (
      |  SELECT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM u),
      |r AS (
      |  SELECT event_type, h,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
      |      AS BIGINT) AS rn
      |  FROM h),
      |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
      |      FROM h GROUP BY event_type),
      |kth AS (
      |  SELECT r.event_type, n.n_exact, least(64, n.n_exact) AS k, r.h AS h_k
      |  FROM r JOIN n USING (event_type)
      |  WHERE r.rn = least(64, n.n_exact))
      |SELECT event_type, n_exact, CAST(k AS BIGINT) AS k, h_k,
      |  CAST(k - 1 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
      |    / CAST(h_k AS DOUBLE) AS est_kmv,
      |  (CAST(k - 1 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
      |    / CAST(h_k AS DOUBLE) - CAST(n_exact AS DOUBLE))
      |    / CAST(n_exact AS DOUBLE) AS rel_error
      |FROM kth
      |ORDER BY event_type""".stripMargin

  val sketchRollingDistinctSql: String =
    """WITH h AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv,
      |    user_id
      |  FROM events),
      |r AS (
      |  SELECT day, hv % 64 AS j,
      |    max(55 - (CASE WHEN hv // 64 = 0 THEN 0
      |              ELSE length(printf('%b', hv // 64)) END)) AS rho
      |  FROM h GROUP BY day, hv % 64),
      |days AS (SELECT DISTINCT day AS win_end FROM h),
      |contrib AS (
      |  SELECT day + CAST(k AS INTEGER) AS win_end, j, rho
      |  FROM r, (SELECT unnest(range(0, 7)) AS k)),
      |merged AS (
      |  SELECT win_end, j, max(rho) AS rho
      |  FROM contrib JOIN days USING (win_end)
      |  GROUP BY win_end, j),
      |s AS (
      |  SELECT win_end,
      |    CAST(sum(1::BIGINT << (55 - rho)) AS BIGINT)
      |      + (64 - count(*)) * (1::BIGINT << 55) AS s_dyadic
      |  FROM merged GROUP BY win_end),
      |exact AS (
      |  SELECT win_end, count(DISTINCT user_id) AS exact_7d
      |  FROM (SELECT DISTINCT day, user_id FROM h) du,
      |       (SELECT unnest(range(0, 7)) AS k)
      |  JOIN days ON du.day + CAST(k AS INTEGER) = win_end
      |  GROUP BY win_end)
      |SELECT s.win_end, s_dyadic,
      |  CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
      |    * CAST(36028797018963968 AS DOUBLE) / CAST(s_dyadic AS DOUBLE)
      |    AS hll_estimate,
      |  exact_7d,
      |  (CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
      |    * CAST(36028797018963968 AS DOUBLE) / CAST(s_dyadic AS DOUBLE)
      |    - CAST(exact_7d AS DOUBLE)) / CAST(exact_7d AS DOUBLE) AS rel_error
      |FROM s JOIN exact USING (win_end)
      |ORDER BY win_end""".stripMargin
}
