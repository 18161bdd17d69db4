package graft.queries

import graft.Checkpoints.StableCheckpoint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Additional relational-graph operators over the part co-purchase graph
  * (parts are nodes; an edge joins two parts appearing in the same
  * order). Companion to [[GraphQueries]] (PageRank, triangles, degrees).
  */
object GraphMore {

  private val Pct = 0.15
  private val Rounds = 3

  /** k-core decomposition with a SELF-CALIBRATING threshold and FIXED 3
    * peeling rounds (documented semantics, like the fixed-iteration
    * PageRank): k is the 15th-percentile initial degree — computed from
    * the data, so the peeling bites at every scale factor instead of
    * going inert when density shifts (measured cascade: 2000 → 1705 →
    * 1420 → 901 at sf0.01 with k=92; 20000 → 17196 → 14649 → 10547 at
    * sf0.1 with k=94). Each round is one degree aggregation plus two
    * semi-joins keyed on the endpoints; the threshold is a histogram
    * rank lookup (see [[kcoreThreshold]] — ≤ 2·√|E| rows, never |V| and
    * never the edge list), broadcast into every round. `stableCheckpoint` (localCheckpoint, or reliable via [[graft.Checkpoints]]) caps lineage
    * exactly as the PageRank/CC loops do. Per-order pair expansion is
    * bounded by TPC-H's ≤7 lineitems/order; the market-basket guard
    * pattern applies verbatim if a pathological basket appears.
    */
  def kcoreParts(spark: SparkSession, sfDir: String): DataFrame = {
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val pairs = orderPairs(spark, sfDir).distinct()
    // depth-mode decision (explicit flag, else auto by leaf-scan mass —
    // `items` roots in the lineitem files, the honest size signal)
    if (graft.storage.Bucketing.iterationsEnabled(spark, items))
      return kcoreBucketed(spark, pairs)
    // LAZY truncation (the r18 BFS treatment): the peel count is FIXED —
    // no driver-side scalar gates a round — so every checkpoint defers
    // to the final aggregate's single action; per-round plans still root
    // in flat LogicalRDDs and each marked RDD materializes once (the
    // eager shape paid ~6 driver round-trips per run).
    var edges = pairs.stableCheckpointLazy()
    def degrees(e: DataFrame): DataFrame =
      e.select(col("pa").as("u"))
        .unionAll(e.select(col("pb").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val d0 = degrees(edges)
    val n = d0.agg(count(lit(1)).as("n"))
    val thr = kcoreThreshold(d0, n).stableCheckpointLazy()
    for (_ <- 1 to Rounds) {
      val alive = degrees(edges)
        .crossJoin(broadcast(thr))
        .filter(col("deg") >= col("k_thr")).select(col("u"))
      // UNCONDITIONAL SHUFFLE_HASH here (not the [[joinsBig]] gate the
      // flat consumers use): the peel loop's per-round plans root in
      // lazy-checkpoint LogicalRDDs whose stats are the conf default,
      // so unhinted the static planner picks SortMergeJoin, not a
      // broadcast — the r19 gated A/B measured the unhinted loop ×1.20
      // SLOWER at sf0.1 (3.385 vs 2.823 s isolated min-of-5) while SHJ
      // wins at both scales (r18: 3.802 → 3.120 s)
      edges = edges
        .join(alive.toDF("pa").hint("shuffle_hash"), "pa")
        .join(alive.toDF("pb").hint("shuffle_hash"), "pb")
        .select(col("pa"), col("pb"))
        .stableCheckpointLazy()
    }
    degrees(edges)
      .select(col("u").as("part_key"), col("deg"))
      .orderBy(col("part_key"))
  }

  /** Depth-mode k-core (see [[graft.storage.Bucketing.IterationsFlag]]):
    * the peel loop over a SYMMETRIC adjacency table bucketed by `u`, so
    * every round's degree aggregate and u-side semi-join run with ZERO
    * edge-scale exchange (the scan reports HashPartitioning), and the
    * v-side filter costs nothing extra because the adjacency is
    * symmetric: {(u,v)∈A : v alive} ≡ swap({(u,v)∈A : u alive}), so one
    * streamed semi-join + a column swap + the bucketed re-write replaces
    * the eager shape's three Θ(E) exchanges per round. Scratch is
    * bounded: after round r's table lands, round r−1's is DROPPED —
    * at most two (shrinking) adjacency generations on disk, no
    * GC-retained shuffle files (the r14 ×1000 one-box killer). The
    * `alive` node set is localCheckpointed (node-scale, never Θ(E)) so
    * the deferred other-endpoint semi-join never needs a dropped table.
    * The FINAL generation (`graft_scratch_kcore_adj_3`) necessarily
    * outlives this function — the returned DataFrame lazily scans it —
    * so depth callers drop `graft_scratch_*` AFTER materializing
    * ([[graft.storage.Bucketing.dropScratch]], wired into
    * ProfileStages); an abandoned leftover is swept by the next run's
    * `writeBucketed`.
    */
  private def kcoreBucketed(spark: SparkSession, pairs: DataFrame): DataFrame = {
    val nB = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def tbl(r: Int) = s"graft_scratch_kcore_adj_$r"
    val adj0 = pairs.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(pairs.select(col("pb").as("u"), col("pa").as("v")))
    graft.storage.Bucketing.writeBucketed(adj0, tbl(0), "u", nB)
    var adj = spark.table(tbl(0))
    def degrees(a: DataFrame): DataFrame =
      a.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val d0 = degrees(adj)
    // the symmetric adjacency holds every edge twice, so node count and
    // per-node degree match the eager path's pa∪pb union exactly
    val n = d0.agg(count(lit(1)).as("n"))
    val thr = kcoreThreshold(d0, n).stableCheckpoint()
    for (r <- 1 to Rounds) {
      val alive = degrees(adj)
        .crossJoin(broadcast(thr))
        .filter(col("deg") >= col("k_thr")).select(col("u"))
        .stableCheckpoint() // node-scale; outlives the dropped table below
      // {(u,v): u alive} streamed off the bucketed scan (SHJ builds on
      // the small alive side — no edge exchange, no sort), then SWAPPED:
      // by symmetry the result is {(u,v): v alive}, already keyed by the
      // NEW u for the bucketed write (per-task bucket files, no shuffle)
      val halfFiltered = adj
        .join(alive.hint("shuffle_hash"), Seq("u"), "left_semi")
        .select(col("v").as("u"), col("u").as("v"))
      graft.storage.Bucketing.writeBucketed(halfFiltered, tbl(r), "u", nB)
      spark.sql(s"DROP TABLE IF EXISTS ${tbl(r - 1)}")
      // the u-side filter of THIS round rides lazily on the next scan
      adj = spark.table(tbl(r))
        .join(alive.hint("shuffle_hash"), Seq("u"), "left_semi")
    }
    degrees(adj)
      .select(col("u").as("part_key"), col("deg"))
      .orderBy(col("part_key"))
  }

  /** Exact rank-r degree (r = floor(Pct·(n−1))+1 under (deg, u) ASC)
    * WITHOUT a |V|-row single-partition sort. Rows with equal deg are
    * contiguous in that order regardless of u, so the deg at any rank is
    * a function of the degree HISTOGRAM alone: aggregate to per-degree
    * counts (mergeable, map-side combined), then pick the cumulative
    * bucket containing r. The global cumulative window orders a provably
    * bounded domain: if D distinct degree values occur, each needs ≥1
    * node, so Σ of the distinct values ≥ 1+2+…+D = D(D+1)/2, and that Σ
    * ≤ Σ all degrees = 2|E| — hence D ≤ 2·√|E| (~2e6 rows at 1e12
    * edges; one trivial task, vs |V| raw rows through one WindowExec
    * before). [[PlanQualitySpec]] pins that every empty-partition window
    * in this sub-plan sits above an aggregate.
    */
  private[graft] def kcoreThreshold(d0: DataFrame, n: DataFrame): DataFrame =
    d0.groupBy(col("deg")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("deg"))))
      .crossJoin(broadcast(n))
      .withColumn("r",
        expr(s"cast(floor(cast($Pct as double) * cast(n - 1 as double)) as bigint) + 1"))
      .filter(col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
      .select(col("deg").as("k_thr"))

  /** Scale-conditional SHUFFLE_HASH decision for the family's Θ(E)/Θ(V)
    * consumer joins. The sorted_pairs edge build plans with Generate-
    * propagated (fan-out-blind, UNDERSTATED) size estimates, so unhinted
    * the static planner broadcasts edge/degree-scale relations — cheap
    * and correct at bench bytes (a driver-built hash table of a few MB),
    * but a whole-graph driver collect at depth. r18 pinned SHUFFLE_HASH
    * unconditionally, paying ~0.85 s across the family at the 32-core
    * sf0.1 bench for the scale posture; r19 gates the pin on the SAME
    * leaf-scan-mass seam as the depth levers ([[graft.Autoscale]],
    * default 2 GiB, `spark.graft.depthAutoThresholdBytes` overrides):
    * below the threshold the planner keeps its (bounded, measured-faster)
    * broadcasts, above it the partitioned hash build is pinned exactly as
    * r18 shipped. Hints never change results ([[JoinStrategyInvarianceSpec]]);
    * each query records one decision (lever `graphJoinHint`).
    */
  private[queries] def joinsBig(spark: SparkSession, sfDir: String): Boolean = {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val leaf = graft.Autoscale.leafScanBytes(base)
    val thr = graft.Autoscale.thresholdBytes(spark)
    val big = leaf >= BigInt(thr)
    graft.Autoscale.record(
      graft.Autoscale.callerOpExcluding(Set("GraphMore.joinsBig")),
      "graphJoinHint", leaf, thr,
      if (big) "shuffle_hash" else "planner", "auto")
    big
  }

  /** `df.hint("shuffle_hash")` when `big`, else the planner's choice. */
  private[queries] def shj(df: DataFrame, big: Boolean): DataFrame =
    if (big) df.hint("shuffle_hash") else df

  /** Per-order co-purchase pair rows (pa < pb, one row per order that
    * contains the pair; baskets capped at each order's `cap` smallest
    * distinct parts) — the shared pair-generation kernel of every graph
    * query. One `collect_set` aggregation keyed on the order plus the
    * [[graft.functions.SortedPairs]] codegen loop replaces the r5-r17
    * `items ⋈ items ON ok` self-join: the old shape paid the (ok,pk)
    * distinct exchange, an ok re-exchange of BOTH join sides and a
    * sort-merge join before the pair filter; this shape pays ONE
    * numbered ok exchange (numbered for the fan-out-blind-AQE reason
    * documented on `copurchaseRecallAtK`: the pair explosion multiplies
    * rows ~8×, so byte-based coalescing of the small basket shuffle
    * would serialize it) and emits pairs straight out of the compiled
    * loop. Probe on this box (sf0.1, warm min, bare edge list): 1259 →
    * 964 ms. Dedup/cap semantics match the self-join contract clause by
    * clause — see the expression's scaladoc.
    */
  private[queries] def orderPairs(spark: SparkSession, sfDir: String,
      cap: Int = Int.MaxValue): DataFrame = {
    graft.functions.SortedPairs.register(spark)
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .repartition(nPart, col("ok"))
      .groupBy(col("ok"))
      .agg(collect_set(col("pk")).as("ps"))
      .select(explode(call_function("sorted_pairs", col("ps"),
        lit(cap))).as("e"))
      .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
  }

  /** Distinct co-purchase edge list (pa < pb): the shared graph of the
    * clustering-coefficient / rich-club / BFS queries. One definition so
    * a future cap or dedup tweak applies to every consumer at once.
    */
  private def coPurchaseEdges(spark: SparkSession, sfDir: String): DataFrame =
    orderPairs(spark, sfDir).distinct()

  /** BFS-only edge list: the r5-r17 self-join shape, kept DELIBERATELY.
    * The sorted_pairs kernel regressed BFS in every variant tried
    * (isolated min-of-5: 3.44 s old vs 4.59 s kernel+union / 4.77 s
    * one-chain symmetric / 5.65 s symmetric+eager-checkpoint) — BFS is
    * the one consumer that layers 4 lazily-checkpointed rounds (11
    * actions) on top of the edge relation, and with the kernel in the
    * lineage its warm runs grow ~4.5 s driver-side dead gaps between
    * rounds (StageGapProbe; the old shape's gaps are ≤1.3 s — the
    * non-deterministic `collect_set` in the lineage defeats plan/stage
    * reuse that the all-deterministic join chain gets). Every
    * non-iterative consumer keeps the faster kernel ([[orderPairs]]).
    */
  private def bfsEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    items.toDF("ok", "pa")
      .join(items.toDF("ok", "pb"), "ok")
      .filter(col("pa") < col("pb"))
      .select(col("pa"), col("pb"))
      .distinct()
  }

  /** Local clustering coefficient for the TOP-20-degree parts: how
    * interconnected each hub's neighborhood is —
    * closed_wedges / (deg·(deg−1)/2) — the community-density probe run
    * on hubs, not the whole graph (the full-graph variant is Σdeg²
    * work; restricting to a broadcast top-k center set bounds the pair
    * expansion by Σ_{c∈top20} deg(c)², independent of |V|). Neighbor
    * pairs are generated per center via a self-join on the center key
    * and closed against the oriented edge list with one LEFT SEMI —
    * the `triangle_count` wedge-close shape, localized.
    */
  def clusteringCoeffTop(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = coPurchaseEdges(spark, sfDir).stableCheckpoint()
    // undirected adjacency (both directions) for neighbor sets
    val adj = edges.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(edges.select(col("pb").as("u"), col("pa").as("v")))
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // top-k via orderBy+limit = TakeOrderedAndProject (distributed
    // partial top-k per task), NEVER a row_number window over all |V|
    // nodes; the rank window then orders only the 20 surviving rows
    val top = deg.orderBy(col("deg").desc, col("u")).limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("deg").desc, col("u"))).cast("long"))
      .select(col("u").as("center"), col("deg"), col("rnk"))
    // neighbors of each center (broadcast 20-row center set onto adj)
    val nbrs = adj.join(broadcast(top.select(col("center"))),
        col("u") === col("center"))
      .select(col("center"), col("v"))
    // scale-conditional SHUFFLE_HASH ([[joinsBig]]): the hub-neighbor
    // set is Θ(Σ_top deg) and the close probe's right side is the Θ(E)
    // edge list — above the depth threshold an (understated-estimate)
    // static broadcast would be a driver collect that grows with the
    // graph, so the partitioned hash build is pinned there; below it the
    // planner's broadcast is bounded and measured faster
    val big = joinsBig(spark, sfDir)
    val closed = nbrs.toDF("center", "x")
      .join(shj(nbrs.toDF("center", "y"), big), Seq("center"))
      .filter(col("x") < col("y"))
      .join(shj(edges.toDF("x", "y"), big),
        Seq("x", "y"), "left_semi")
      .groupBy(col("center")).agg(count(lit(1)).as("closed_wedges"))
    top.join(closed, Seq("center"), "left")
      .withColumn("closed_wedges", coalesce(col("closed_wedges"), lit(0L)))
      .withColumn("possible_wedges", expr("deg * (deg - 1) div 2"))
      .withColumn("clustering_coeff",
        col("closed_wedges").cast("double")
          / col("possible_wedges").cast("double"))
      .select(col("rnk"), col("center"), col("deg"), col("closed_wedges"),
        col("possible_wedges"), col("clustering_coeff"))
      .orderBy(col("rnk"))
  }

  val clusteringCoeffTopSql: String =
    """WITH items AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |edges AS MATERIALIZED (
      |  SELECT DISTINCT a.pk AS pa, b.pk AS pb
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
      |adj AS MATERIALIZED (
      |  SELECT pa AS u, pb AS v FROM edges
      |  UNION ALL SELECT pb, pa FROM edges),
      |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY u),
      |top AS (
      |  SELECT u AS center, deg,
      |    CAST(row_number() OVER (ORDER BY deg DESC, u) AS BIGINT) AS rnk
      |  FROM deg QUALIFY rnk <= 20),
      |nbrs AS (
      |  SELECT t.center, a.v FROM adj a JOIN top t ON a.u = t.center),
      |closed AS (
      |  SELECT n1.center, CAST(count(*) AS BIGINT) AS closed_wedges
      |  FROM nbrs n1 JOIN nbrs n2
      |    ON n1.center = n2.center AND n1.v < n2.v
      |  WHERE EXISTS (SELECT 1 FROM edges e
      |                WHERE e.pa = n1.v AND e.pb = n2.v)
      |  GROUP BY n1.center)
      |SELECT rnk, center, deg,
      |  coalesce(closed_wedges, 0) AS closed_wedges,
      |  deg * (deg - 1) // 2 AS possible_wedges,
      |  CAST(coalesce(closed_wedges, 0) AS DOUBLE)
      |    / CAST(deg * (deg - 1) // 2 AS DOUBLE) AS clustering_coeff
      |FROM top LEFT JOIN closed USING (center)
      |ORDER BY rnk""".stripMargin

  /** The oracle marks every round's CTE `AS MATERIALIZED`: without the
    * hint DuckDB inlines chained CTEs, so round N re-evaluates the
    * (DISTINCT, self-joined) edge list O(3^N) times — fine at sf0.01,
    * a temp-disk blowup at sf0.1. MATERIALIZED is a DuckDB-only planner
    * hint; result semantics are untouched.
    */
  val kcorePartsSql: String = {
    val rounds = (1 to Rounds).map { i =>
      s"""a$i AS MATERIALIZED (SELECT u FROM d${i - 1}, thr WHERE deg >= k_thr),
         |e$i AS MATERIALIZED (
         |  SELECT pa, pb FROM e${i - 1}
         |  WHERE pa IN (SELECT u FROM a$i) AND pb IN (SELECT u FROM a$i)),
         |d$i AS MATERIALIZED (
         |  SELECT u, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT pa AS u FROM e$i UNION ALL SELECT pb FROM e$i)
         |  GROUP BY u)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.pk AS pa, b.pk AS pb
       |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
       |d0 AS MATERIALIZED (
       |  SELECT u, CAST(count(*) AS BIGINT) AS deg
       |  FROM (SELECT pa AS u FROM e0 UNION ALL SELECT pb FROM e0)
       |  GROUP BY u),
       |rk AS (SELECT deg, row_number() OVER (ORDER BY deg, u) AS rn FROM d0),
       |nn AS (SELECT count(*) AS n FROM d0),
       |thr AS (
       |  SELECT deg AS k_thr FROM rk, nn
       |  WHERE rn = CAST(floor(CAST($Pct AS DOUBLE)
       |                        * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1),
       |$rounds
       |SELECT u AS part_key, deg FROM d$Rounds
       |ORDER BY part_key""".stripMargin
  }

  // ---------------------------------------------------------- rich club

  /** Rich-club coefficient of the co-purchase graph at k ∈ {4, 8, 16}:
    * among parts with degree > k, what fraction of possible hub-hub
    * edges exist — the "do the popular parts form a clique" structure
    * probe (Colizza et al.). Edges and degrees are the same keyed
    * shapes as `clustering_coeff_top`; the 3-row k config rides a
    * broadcast so the sweep is one pass over the degree-annotated edge
    * list; `n_k·(n_k−1)` widens to DECIMAL (hub counts can reach 10⁸ at
    * catalog scale, their square wraps a long); density is the one
    * final double division per k.
    */
  def richClubCoefficient(spark: SparkSession, sfDir: String): DataFrame = {
    // reused: degrees + hub-hub edge counts
    val edges = coPurchaseEdges(spark, sfDir).stableCheckpoint()
    val adj = edges.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(edges.select(col("pb").as("u"), col("pa").as("v")))
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val ks = spark.range(1).select(
      explode(typedLit(Seq(4L, 8L, 16L))).as("k"))
    val hubs = deg.crossJoin(broadcast(ks))
      .filter(col("deg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_hubs"))
    // scale-conditional SHUFFLE_HASH on the Θ(V) degree sides
    // ([[joinsBig]]): above the depth threshold, understated Generate
    // estimates from the sorted_pairs build otherwise flip these to
    // static broadcasts of the whole degree table (see
    // neighborDegreeFunction)
    val big = joinsBig(spark, sfDir)
    val within = edges
      .join(shj(deg.toDF("pa", "da"), big), Seq("pa"))
      .join(shj(deg.toDF("pb", "db"), big), Seq("pb"))
      .crossJoin(broadcast(ks))
      .filter(col("da") > col("k") && col("db") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("edges_within"))
    hubs.join(within, Seq("k"), "left")
      .withColumn("edges_within", coalesce(col("edges_within"), lit(0L)))
      .select(col("k"), col("n_hubs"), col("edges_within"),
        ((lit(2) * col("edges_within")).cast("double") /
          (col("n_hubs").cast("decimal(38,0)") *
            (col("n_hubs") - 1).cast("decimal(38,0)")).cast("double"))
          .as("density"))
      .orderBy(col("k"))
  }

  val richClubCoefficientSql: String =
    """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem),
      |e AS (
      |  SELECT DISTINCT a.pk AS pa, b.pk AS pb
      |  FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
      |d AS (
      |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT pa AS u FROM e UNION ALL SELECT pb AS u FROM e)
      |  GROUP BY u),
      |ks AS (SELECT unnest([4, 8, 16]) AS k),
      |hubs AS (
      |  SELECT k, CAST(count(*) AS BIGINT) AS n_hubs
      |  FROM d, ks WHERE deg > k GROUP BY k),
      |w AS (
      |  SELECT k, CAST(count(*) AS BIGINT) AS edges_within
      |  FROM e
      |  JOIN d da ON e.pa = da.u
      |  JOIN d db ON e.pb = db.u, ks
      |  WHERE da.deg > k AND db.deg > k
      |  GROUP BY k)
      |SELECT CAST(hubs.k AS BIGINT) AS k, hubs.n_hubs,
      |  coalesce(w.edges_within, 0) AS edges_within,
      |  CAST(2 * coalesce(w.edges_within, 0) AS DOUBLE)
      |    / CAST(CAST(hubs.n_hubs AS HUGEINT)
      |        * CAST(hubs.n_hubs - 1 AS HUGEINT) AS DOUBLE) AS density
      |FROM hubs LEFT JOIN w ON hubs.k = w.k
      |ORDER BY k""".stripMargin

  // ------------------------------------------------ BFS distance histogram

  /** BFS reachability profile from the lowest-id part: how many parts
    * sit at co-purchase distance 0..4, plus the unreached remainder —
    * the small-world / connectivity probe behind "is this graph one
    * component or islands". Four synchronous frontier expansions (the
    * same bounded-iteration shape as `pagerank_bipartite`: each round is
    * ONE keyed join frontier→adjacency + an anti-join against visited,
    * localCheckpointed so lineage stays flat); the oracle replays it as
    * a depth-bounded recursive CTE. Output is pure integer counts.
    */
  def bfsDistanceHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = bfsEdges(spark, sfDir)
    val adjPlan = edges.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(edges.select(col("pb").as("u"), col("pa").as("v")))
    // Depth mode ([[graft.storage.Bucketing.IterationsFlag]]): the
    // adjacency NEVER CHANGES across BFS rounds, so one bucketed write
    // gives all four frontier probes a reported HashPartitioning(u) —
    // each round exchanges only the node-scale frontier (SHJ builds on
    // it) and the Θ(E) per-round re-shuffle of checkpoint blocks (the
    // r14 one-box scratch killer: 46 GB) disappears entirely. Default
    // path keeps the in-memory checkpoint (faster at gate/bench scale,
    // no warehouse side effects).
    // size signal: the SAME base scan kcoreParts uses (lineitem once) —
    // `edges` is a self-join whose leaf mass counts lineitem twice, so
    // keying on it flipped BFS at half the dataset size kcore does and
    // the byte threshold meant different things per operator (r16
    // advice)
    val sizeSignal = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val bucketed = graft.storage.Bucketing.iterationsEnabled(spark, sizeSignal)
    val adj =
      if (bucketed) {
        val nB = spark.conf.get("spark.sql.shuffle.partitions").toInt
        graft.storage.Bucketing.writeBucketed(
          adjPlan, "graft_scratch_bfs_adj", "u", nB)
        spark.table("graft_scratch_bfs_adj")
      } else adjPlan.stableCheckpointLazy() // probed once per BFS round
    // LAZY truncation throughout: the round count is FIXED (no driver
    // reads any per-round scalar), so every checkpoint can defer to the
    // query's single final action — per-round plans still root in flat
    // LogicalRDDs (no lineage growth) and each marked RDD's blocks are
    // saved the first time the one real execution computes them. The
    // eager version paid ~10 driver round-trips (checkpoint actions) per
    // run for state the final aggregate was about to materialize anyway.
    val src = adj.agg(min(col("u")).as("node"))
      .select(col("node"), lit(0L).as("dist"))
    var visited = src.stableCheckpointLazy()
    var frontier = visited
    for (d <- 1 to 4) {
      // bucketed mode: force SHJ with the frontier as build side so the
      // edge scan streams unsorted and unexchanged; default mode leaves
      // the strategy to AQE (frontier is tiny at gate scale → broadcast)
      val probe =
        if (bucketed) frontier.hint("shuffle_hash") else frontier
      val next = probe.join(adj, col("node") === col("u"))
        .select(col("v").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(d.toLong).as("dist"))
        .stableCheckpointLazy()
      visited = visited.unionAll(next).stableCheckpointLazy()
      frontier = next
    }
    val reached = visited.groupBy(col("dist"))
      .agg(count(lit(1)).as("n_nodes"))
    val totalNodes = adj.select(col("u")).distinct()
      .agg(count(lit(1)).as("n_total"))
    val unreached = totalNodes
      .crossJoin(broadcast(visited.agg(count(lit(1)).as("n_seen"))))
      .select(lit(-1L).as("dist"), (col("n_total") - col("n_seen"))
        .as("n_nodes"))
    reached.unionAll(unreached).orderBy(col("dist"))
  }

  val bfsDistanceHistogramSql: String =
    """WITH RECURSIVE it AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e AS (
      |  SELECT DISTINCT a.pk AS pa, b.pk AS pb
      |  FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
      |adj AS (
      |  SELECT pa AS u, pb AS v FROM e
      |  UNION ALL SELECT pb AS u, pa AS v FROM e),
      |reach(node, dist) AS (
      |  SELECT (SELECT min(u) FROM adj), 0
      |  UNION
      |  SELECT adj.v, r.dist + 1
      |  FROM reach r JOIN adj ON adj.u = r.node
      |  WHERE r.dist < 4),
      |best AS (SELECT node, min(dist) AS dist FROM reach GROUP BY node),
      |reached AS (
      |  SELECT CAST(dist AS BIGINT) AS dist,
      |    CAST(count(*) AS BIGINT) AS n_nodes
      |  FROM best GROUP BY dist),
      |tot AS (SELECT count(DISTINCT u) AS n_total FROM adj),
      |seen AS (SELECT count(*) AS n_seen FROM best)
      |SELECT dist, n_nodes FROM reached
      |UNION ALL
      |SELECT CAST(-1 AS BIGINT), CAST(n_total - n_seen AS BIGINT)
      |FROM tot, seen
      |ORDER BY dist""".stripMargin

  // --------------------------------------------- neighbor degree function

  /** Average-neighbor-degree function k_nn(k) — the degree-resolved
    * refinement of the scalar assortativity: for nodes of degree k, the
    * mean degree of their neighbors. Rising k_nn(k) = assortative hubs,
    * falling = hub-periphery. Degrees come off the shared co-purchase
    * edge list; the neighbor-degree sum is ONE adjacency⋈degree keyed
    * join aggregated per node then per k — integer sums end to end with
    * the single mean division. Σ of neighbor degrees per k reaches
    * ~10¹⁴ at catalog scale → stays in BIGINT comfortably; the k domain
    * is degree-bounded (≤ 2·√|E| distinct values, the `kcore` argument).
    */
  def neighborDegreeFunction(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = coPurchaseEdges(spark, sfDir).stableCheckpoint()
    val adj = edges.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(edges.select(col("pb").as("u"), col("pa").as("v")))
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .stableCheckpoint() // joined twice: own degree + neighbor degree
    // scale-conditional SHUFFLE_HASH ([[joinsBig]]): the sorted_pairs
    // build's Generate-propagated estimates UNDERSTATE the checkpointed
    // edge/degree relations, so above the depth threshold unhinted joins
    // would statically broadcast Θ(V) builds (a driver collect that
    // grows with the graph); below it the planner's broadcast is bounded
    // and measured faster (kcoreBucketed idiom, gated)
    val big = joinsBig(spark, sfDir)
    adj.join(shj(deg.toDF("v", "nbr_deg"), big), Seq("v"))
      .join(shj(deg, big), Seq("u"))
      .groupBy(col("deg").as("k"))
      .agg(countDistinct(col("u")).as("n_nodes"),
        count(lit(1)).as("n_edge_ends"),
        sum(col("nbr_deg")).as("sum_nbr_deg"))
      .select(col("k"), col("n_nodes"),
        (col("sum_nbr_deg").cast("double") /
          col("n_edge_ends").cast("double")).as("k_nn"))
      .orderBy(col("k"))
  }

  val neighborDegreeFunctionSql: String =
    """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem),
      |e AS (
      |  SELECT DISTINCT a.pk AS pa, b.pk AS pb
      |  FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
      |adj AS (
      |  SELECT pa AS u, pb AS v FROM e
      |  UNION ALL SELECT pb AS u, pa AS v FROM e),
      |d AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY u)
      |SELECT du.deg AS k, CAST(count(DISTINCT adj.u) AS BIGINT) AS n_nodes,
      |  CAST(sum(dv.deg) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS k_nn
      |FROM adj
      |JOIN d dv ON adj.v = dv.u
      |JOIN d du ON adj.u = du.u
      |GROUP BY du.deg
      |ORDER BY k""".stripMargin
}
