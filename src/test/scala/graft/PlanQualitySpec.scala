package graft

import graft.queries.{EventQueries, Relational}

/** Plan-quality regression guards: these assert the OPTIMIZED plan shape,
  * not results — a change that silently drops predicate pushdown, column
  * pruning or broadcast would still return correct rows while becoming
  * unusable at 100 TB. Failures here mean "the plan regressed", not "the
  * answer is wrong".
  */
class PlanQualitySpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: filter pushed to parquet scan, schema pruned to referenced columns") {
    val p = plan(Relational.q1PricingSummary(spark, sf0001))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema: struct<l_quantity:double"))
    assert(!p.contains("l_orderkey"), "q1 must not read unreferenced columns")
  }

  test("q3: dimension joins broadcast; top-10 plans as TakeOrderedAndProject") {
    val p = plan(Relational.q3ShippingPriority(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q5: five-way star join stays broadcast with a single big-table scan path") {
    val p = plan(Relational.q5RegionRevenue(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4)
    assert(!p.contains("SortMergeJoin"), "dims must broadcast at this scale")
  }

  test("asof join plans exactly one shuffle for the window") {
    val p = plan(EventQueries.asofLastPurchase(spark, sf0001))
    // one hashpartitioning exchange for the window; the final orderBy adds
    // a range exchange — but no join-induced shuffles at all
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "asof must be union+window, not a join")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 1)
  }

  test("semi/anti joins plan as semi/anti, not inner+distinct") {
    val semi = plan(Relational.joinSemi(spark, sf0001))
    val anti = plan(Relational.joinAnti(spark, sf0001))
    assert(semi.contains("LeftSemi"))
    assert(anti.contains("LeftAnti"))
  }

  test("q19: per-side residuals of the OR-of-ANDs push below the join") {
    val p = plan(graft.queries.RelationalThird.q19DisjunctiveRevenue(spark, sf0001))
    // Catalyst must extract `p_brand IN (...)` / quantity bounds from the
    // disjunction and push them into each scan — the lineitem scan may not
    // read rows outside the union of quantity ranges.
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"),
      "lineitem residual not pushed:\n" + p)
    assert(p.contains("Or(Or(And(EqualTo(p_brand"),
      "part residual not pushed:\n" + p)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("unpivot: melt is a map-side Expand; only the re-aggregation shuffles") {
    val p = plan(graft.queries.AggregatesMore.unpivotCharges(spark, sf0001))
    assert(p.contains("Expand"), "unpivot should plan as Expand")
    // exactly one hash exchange (the groupBy) + the final sort's range
    // exchange — the melt itself must not repartition
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "melt must not add exchanges:\n" + p)
  }

  test("minhash LSH: candidate join must not broadcast the banded corpus") {
    // The banded relation IS the corpus — a broadcast build side OOMs at
    // scale, so there must be no broadcast() HINT forcing one. With the
    // size-based auto-broadcast disabled (at real scale the corpus never
    // fits under the threshold anyway), the plan must be a shuffle join on
    // (band, bucket). At toy scale with the threshold on, Catalyst/AQE may
    // still elect a broadcast from size evidence — that is adaptive and
    // fine, which is why the threshold is pinned off for the guard.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      val df = graft.text.Dedup.minhashCandidates(docs)
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin"), "pair join degenerated:\n" + p)
      assert(!p.contains("BroadcastHashJoin"),
        "a broadcast hint forces the banded corpus to broadcast:\n" + p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "candidate join must shuffle on (band, bucket):\n" + p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("grouping sets plans one Expand and one aggregation exchange") {
    val p = plan(graft.queries.AnalyticsMore.aggGroupingSets(spark, sf0001))
    assert(p.contains("Expand"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "grouping sets must not add exchanges:\n" + p)
  }

  test("gap-fill: spine generation stays inside the user_id partitioning") {
    val p = plan(graft.queries.AnalyticsMore.eventsGapfillHourly(spark, sf0001))
    // the spine agg, the join and the forward-fill window all cluster on
    // user_id; no cartesian spine and no extra all-to-all exchange
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "spine must join per-user, not cross:\n" + p)
    assert(p.contains("Window"))
  }

  test("q17: per-part stats are a window over ONE lineitem scan, no self-join") {
    val p = plan(graft.queries.RelationalThird.q17SmallQuantity(spark, sf0001))
    assert("Scan parquet".r.findAllIn(p).size <= 2, // lineitem + part
      "q17 must not scan lineitem twice:\n" + p)
    assert(p.contains("Window"))
  }

  test("rank filters get the native WindowGroupLimit partial/final pushdown") {
    // Catalyst (3.5+) plans `filter(row_number <= k)` as a bounded
    // WindowGroupLimit BEFORE and AFTER the shuffle — map tasks forward at
    // most k rows per group instead of every row, which is why the engine
    // does NOT ship a custom top-k strategy (don't re-plan what the
    // optimizer already bounds; TopKAggregator exists for the
    // no-sort-at-all formulation). This guard pins the pushdown so a
    // query-shape change that silently loses it (e.g. a filter the
    // optimizer can no longer prove rank-bounded) fails loudly.
    val p = plan(Relational.windowTopNPerCustomer(spark, sf0001))
    assert(p.contains("WindowGroupLimit") && p.contains("Partial") &&
      p.contains("Final"),
      "row_number filter lost the WindowGroupLimit pushdown:\n" + p)
  }

  test("bloom decontamination: probe side is built-ins only, bitset broadcasts") {
    val p = plan(graft.queries.CorpusMore.decontaminateBloom(spark, sf0001))
    // the training-side membership probe must be md5/conv/shiftright
    // built-ins (codegen), with the one-row bitset broadcast — no
    // SQL-invisible function may touch the big side
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "bitset must broadcast:\n" + p)
    assert(p.contains("shiftright") && p.contains("md5"),
      "probe must be built-in expressions:\n" + p)
  }

  test("q22: threshold broadcasts and the no-orders check stays LeftAnti") {
    val p = plan(graft.queries.RelationalThird.q22IdleBalances(spark, sf0001))
    assert(p.contains("LeftAnti"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "1-row threshold must broadcast, not shuffle")
  }

  test("domain cap: per-source rank filter keeps the WindowGroupLimit pushdown") {
    val p = plan(graft.queries.CorpusFourth.domainCapSample(spark, sf0001))
    assert(p.contains("WindowGroupLimit") && p.contains("Partial") &&
      p.contains("Final"),
      "per-source cap lost the partial top-k pushdown:\n" + p)
  }

  test("boilerplate tagging: the boiler set broadcasts onto the gram stream") {
    val p = plan(graft.queries.CorpusFourth.boilerplateNgrams(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      "boiler-gram tag-back must be a broadcast join:\n" + p)
    assert(!p.contains("CartesianProduct"))
  }

  test("bm25/rrf: rank filters keep WindowGroupLimit; no cartesian products") {
    val bm25 = plan(graft.queries.SearchQueries.bm25TopK(spark, sf0001))
    assert(bm25.contains("WindowGroupLimit"),
      "bm25 top-10 lost the partial top-k pushdown:\n" + bm25)
    assert(!bm25.contains("CartesianProduct"))
    val rrf = plan(graft.queries.SearchQueries.rrfHybridSearch(spark, sf0001))
    assert(rrf.contains("WindowGroupLimit"))
    assert(!rrf.contains("CartesianProduct"))
  }

  test("session concurrency: sweep window partitions by day, never globally") {
    val p = plan(graft.queries.EventQueries.sessionConcurrency(spark, sf0001))
    // a global (empty-partition) running sum would funnel every point
    // through one task — the window exchange must hash on day
    assert("hashpartitioning\\(day".r.findAllIn(p).nonEmpty,
      "sweep must partition by day:\n" + p)
  }

  test("sketch_quantile: one partial/final aggregate pair, no extra exchange") {
    val p = plan(graft.queries.SketchQueries.sketchQuantile(spark, sf0001))
    // global agg = single-key hash exchange; anything more means the
    // sketch stopped map-side combining
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      "quantile sketch must map-side combine:\n" + p)
  }

  test("reservoir_sample: prunes text column; no window sort of the corpus") {
    val p = plan(graft.queries.CorpusFifth.reservoirSample(spark, sf0001))
    // the whole point of the bounded aggregator: the corpus is never
    // sorted, and the scan reads only (source, doc_id) — reading `text`
    // for a key sample would be a 100 TB I/O regression
    assert(!p.contains("text:"), "reservoir sample must not read text:\n" + p)
    assert(!p.contains("Window"), "must aggregate, not window-sort:\n" + p)
  }

  test("class_tfidf: top-5 rank filter keeps the WindowGroupLimit pushdown") {
    val p = plan(graft.queries.CorpusFifth.classTfidf(spark, sf0001))
    assert(p.contains("WindowGroupLimit"),
      "per-class top-5 lost the partial top-k pushdown:\n" + p)
    assert(!p.contains("CartesianProduct"))
  }

  test("cdc_latest_snapshot: latest-wins is an aggregate, not a window sort") {
    val p = plan(graft.queries.CdcQueries.cdcLatestSnapshot(spark, sf0001))
    assert(!p.contains("Window"),
      "max(struct) compaction must not fall back to a window sort:\n" + p)
    // one hash exchange (the groupBy) + the final sort's range exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      "latest-snapshot must map-side combine:\n" + p)
  }

  test("kcore threshold: every global window orders an aggregated bounded domain") {
    // The 15th-percentile degree must come from the degree HISTOGRAM
    // (≤ 2·√|E| rows), never a row_number over all |V| nodes — an
    // unpartitioned WindowExec over an unbounded domain is the one named
    // scale-killer for this query. Assert structurally: any WindowExec
    // with an empty partition spec in the threshold sub-plan must have an
    // aggregate below it (the histogram), so a refactor can't silently
    // move the sort back onto raw nodes.
    // checked on the optimized LOGICAL plan: the physical tree hides
    // inside AdaptiveSparkPlanExec until materialization, so a physical
    // collect() would vacuously pass
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    import org.apache.spark.sql.functions._
    val items = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = items.toDF("ok", "pa").join(items.toDF("ok", "pb"), "ok")
      .filter(col("pa") < col("pb")).select(col("pa"), col("pb")).distinct()
    val d0 = edges.select(col("pa").as("u"))
      .unionAll(edges.select(col("pb").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val thr = graft.queries.GraphMore.kcoreThreshold(
      d0, d0.agg(count(lit(1)).as("n")))
    val lp = thr.queryExecution.optimizedPlan
    val globalWindows = lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(globalWindows.nonEmpty, "threshold should use the histogram window")
    globalWindows.foreach { w =>
      val aggsBelow = w.child.collect { case a: Aggregate => a }
      assert(aggsBelow.nonEmpty,
        "global window must sit above the degree histogram aggregate, " +
          "not raw nodes:\n" + lp)
    }
    assert(thr.count() == 1L, "threshold must resolve to exactly one degree")
  }

  test("bounded-domain global windows only ever order aggregated domains") {
    // skyline_parts / zipf_coverage / ks_drift each run an unpartitioned
    // window — acceptable ONLY because the windowed input is an
    // aggregated bounded domain (distinct cents / vocabulary types /
    // distinct lengths), not raw rows. Pin that structurally: in the
    // optimized logical plan, every empty-partition Window must have an
    // Aggregate below it, so a refactor can't silently move the sort
    // back onto the raw table. (Same guard family as the kcore
    // threshold above.)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val targets = Seq(
      "skyline_parts" ->
        graft.queries.AnalyticsFourth.skylineParts(spark, sf0001),
      "ks_drift" -> graft.queries.SeriesFifth.ksDrift(spark, sf0001),
      // r9: both rank windows order the one-row-per-day aggregate
      "spearman_daily" ->
        graft.queries.CurationEighth.spearmanDaily(spark, sf0001))
    targets.foreach { case (name, df) =>
      val lp = df.queryExecution.optimizedPlan
      val globalWindows = lp.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.nonEmpty,
        s"$name should still use its bounded-domain global window")
      globalWindows.foreach { w =>
        assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
          s"$name: global window must order an aggregated domain, " +
            s"not raw rows:\n$lp")
      }
    }
  }

  test("zipf coverage: no window at all — distributed top-25 + triangle rank") {
    // r19: the vocabulary-wide single-partition rank/cumsum window is
    // gone; ranks 3/10/25 come off a TakeOrderedAndProject top-25 and a
    // bounded 25-row self-join. Pin that no global window can sneak the
    // Θ(vocab) sort back and the top-k stays a distributed partial top-k.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = graft.queries.CorpusFifth.zipfCoverage(spark, sf0001)
    assert(df.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }.isEmpty,
      "zipf_coverage must not use any window")
    assert(plan(df).contains("TakeOrderedAndProject"),
      "zipf top-25 must be a distributed partial top-k:\n" + plan(df))
  }

  test("round-5 queries keep their scale shapes") {
    // sketch_kmv: the per-group bottom-k is a rank filter — map tasks
    // must forward ≤ k hashes per group (WindowGroupLimit), never the
    // full distinct-hash set
    val kmv = plan(graft.queries.SketchQueries.sketchKmv(spark, sf0001))
    assert(kmv.contains("WindowGroupLimit"),
      "kmv bottom-k lost the partial top-k pushdown:\n" + kmv)
    assert(!kmv.contains("CartesianProduct"))
    // clustering_coeff_top: hub selection is a distributed top-k
    // (TakeOrderedAndProject), and the wedge close stays a LEFT SEMI
    val ccf = plan(graft.queries.GraphMore.clusteringCoeffTop(spark, sf0001))
    assert(ccf.contains("TakeOrderedAndProject"),
      "top-degree selection must be orderBy+limit, not a global window:\n" + ccf)
    assert(ccf.contains("LeftSemi"))
    assert(!ccf.contains("CartesianProduct"))
    // oov_rate_split: vocabulary membership must be a LEFT ANTI probe
    val oov = plan(graft.queries.AuditQueries.oovRateSplit(spark, sf0001))
    assert(oov.contains("LeftAnti"),
      "OOV probe must be an anti join on the token key:\n" + oov)
    // trail_last5: per-user latest row keeps the rank-1 pushdown
    val trail = plan(graft.queries.StreamQueries.trailLast5(spark, sf0001))
    assert(trail.contains("WindowGroupLimit"),
      "latest-row filter lost the WindowGroupLimit pushdown:\n" + trail)
    // block_bloom_skipping (r13 ×1000 rewrite): the per-block bloom INDEX
    // broadcasts (84 tiny rows — the natural broadcast side at any scale)
    // while the probes stream through a numbered round-robin repartition,
    // and a numbered (blk,pk) repartition pins the probe-verdict join at
    // full width — without them AQE serialized the 8M-pair fan-out and
    // the 11M-row join on ONE task each (53-68 s + 56-61 s of the ×1000
    // run). Both numbered exchanges must survive.
    val bloom = plan(graft.queries.StorageOps.blockBloomSkipping(spark, sf0001))
    assert(bloom.contains("BroadcastExchange"),
      "bloom index must broadcast:\n" + bloom)
    assert("REPARTITION_BY_NUM".r.findAllIn(bloom).size >= 2,
      "block_bloom lost a numbered repartition (probe round-robin / " +
        "(blk,pk) join pin):\n" + bloom)
    // label_noise_scan (r13 ×100 sweep): the bucket self-join's OUTPUT is
    // the bucket² vote fan-out, but its checkpointed input is ~2 MB — a
    // numbered bucket repartition must pin the pair generation at full
    // width or AQE serializes 22 s of fan-out+aggregate on 2 tasks
    val lns = plan(graft.queries.SimQueries.labelNoiseScan(spark, sf0001))
    assert(lns.contains("REPARTITION_BY_NUM"),
      "label_noise_scan lost the numbered bucket repartition on the " +
        "vote self-join:\n" + lns)
    // interpolate_linear (r13 ×100 sweep): no global sort above the
    // two-direction window pipeline — its range sample re-executed the
    // whole pipeline (3 consumers of one 208 MB exchange where 1
    // suffices); output order is not semantic
    val il = plan(graft.queries.SeriesFifth.interpolateLinear(spark, sf0001))
    assert(!il.contains("rangepartitioning"),
      "interpolate_linear regrew a global sort above the window " +
        "pipeline (range sample = full re-execution):\n" + il)
    // ppjoin: candidates must come from the prefix-gram equi-join —
    // degenerating to a cartesian/nested-loop pair scan would be the
    // all-pairs compare the algorithm exists to avoid
    val ppj = plan(graft.queries.TextQueries.ppjoinExactPairs(spark, sf0001))
    assert(!ppj.contains("CartesianProduct") &&
      !ppj.contains("BroadcastNestedLoopJoin"),
      "ppjoin candidates must equi-join on prefix grams:\n" + ppj)
    // r9: the prefix relation is tiny in bytes but its self-join output
    // is the posting-pair explosion — the numbered tok repartition that
    // pins its parallelism past AQE coalescing must survive
    assert(ppj.contains("REPARTITION_BY_NUM"),
      "ppjoin prefix self-join lost its numbered tok repartition:\n" + ppj)
    // r10: the candidate relation is ~150 KB of id pairs and both verify
    // joins broadcast the gram-set side, so without a numbered
    // (id_a, id_b) repartition AQE coalesces the distinct's exchange to
    // one task and the per-candidate array_intersect verify runs
    // single-threaded (the r10 raw-bytes profiler finding). Three
    // numbered repartitions total: docs scan spread, prefix tok, cand.
    assert("REPARTITION_BY_NUM".r.findAllIn(ppj).size >= 3,
      "ppjoin lost the numbered candidate (id_a, id_b) repartition " +
        "that parallelizes the verify stage:\n" + ppj)
  }

  test("suffix_dup_spans / interpolate_linear: no pairwise or join plans") {
    val sfx = plan(graft.queries.CorpusFifth.suffixDupSpans(spark, sf0001))
    assert(!sfx.contains("CartesianProduct") &&
      !sfx.contains("BroadcastNestedLoopJoin"),
      "gram index must join on the gram key:\n" + sfx)
    val interp = plan(graft.queries.SeriesFifth.interpolateLinear(spark, sf0001))
    assert(!interp.contains("SortMergeJoin") &&
      !interp.contains("BroadcastHashJoin"),
      "interpolation must be union+window, not an asof join pair:\n" + interp)
  }

  test("stats-fifth family keeps its scale shapes") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // lorenz_gini / tvd_value_drift / chi_square cells: every
    // unpartitioned window must order an AGGREGATED bounded domain
    // (1000 revenue bins / 10 value buckets / 6 contingency cells) —
    // never raw customers, events or lineitems. Same structural guard
    // as the kcore threshold.
    Seq(
      "lorenz_gini" -> graft.queries.StatsFifth.lorenzGini(spark, sf0001),
      "tvd_value_drift" -> graft.queries.StatsFifth.tvdValueDrift(spark, sf0001),
      "chi_square_promo_returns" ->
        graft.queries.StatsFifth.chiSquarePromoReturns(spark, sf0001)
    ).foreach { case (name, df) =>
      val lp = df.queryExecution.optimizedPlan
      val globalWindows =
        lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      assert(globalWindows.nonEmpty,
        s"$name should use its bounded-domain global window")
      globalWindows.foreach { w =>
        assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
          s"$name: global window must order an aggregated domain:\n$lp")
      }
    }
    // hits / link-predict: top-k must plan as TakeOrderedAndProject
    // (distributed partial top-k), never a global window, and pair
    // generation must stay an equi-join on its key (a cartesian pair
    // scan is the quadratic blowup the df-prune exists to avoid).
    val hits = plan(graft.queries.StatsFifth.hitsPowerIteration(spark, sf0001))
    assert(hits.contains("TakeOrderedAndProject"),
      "hits top-20 must be a distributed partial top-k:\n" + hits)
    val lp2 = plan(graft.queries.StatsFifth.linkPredictUsers(spark, sf0001))
    assert(lp2.contains("TakeOrderedAndProject"),
      "link-predict top-50 must be a distributed partial top-k:\n" + lp2)
    assert(!lp2.contains("CartesianProduct") &&
      !lp2.contains("BroadcastNestedLoopJoin"),
      "pair generation must equi-join on the part key:\n" + lp2)
    // ams_f2_moment: no windows at all — the sketch is pure keyed
    // aggregation; and the verdict must actually hold.
    val ams = graft.queries.StatsFifth.amsF2Moment(spark, sf0001)
    assert(ams.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }.isEmpty,
      "AMS sketch must be window-free keyed aggregation")
    val row = ams.collect().head
    assert(row.getAs[Boolean]("within_bound"),
      "AMS median-of-means must lie within 25% of 64*F2")
  }

  test("analytics-fifth family keeps its scale shapes") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // pareto_abc_parts: the cumulative ABC walk must order the 1000-bin
    // histogram, never raw parts — bounded-domain window above an
    // aggregate, same guard as lorenz_gini.
    val abc = graft.queries.AnalyticsFifth.paretoAbcParts(spark, sf0001)
    val abcW = abc.queryExecution.optimizedPlan
      .collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(abcW.nonEmpty, "ABC walk should use its bounded-domain window")
    abcW.foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        "ABC window must order the revenue histogram, not raw parts")
    }
    // activity_islands / label_propagation: every window is KEYED
    // (user_id / node) — no empty partition spec anywhere; top-k plans
    // as TakeOrderedAndProject.
    Seq(
      "activity_islands" ->
        graft.queries.AnalyticsFifth.activityIslands(spark, sf0001),
      "label_propagation" ->
        graft.queries.AnalyticsFifth.labelPropagation(spark, sf0001)
    ).foreach { case (name, df) =>
      assert(df.queryExecution.optimizedPlan
        .collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
        s"$name must only use keyed windows")
      assert(df.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
        s"$name top-k must be a distributed partial top-k")
    }
    // xcorr: the lag grid must broadcast (15 rows), and the daily join
    // stays an equi-join on the computed day key.
    val xc = graft.queries.AnalyticsFifth
      .xcorrViewPurchase(spark, sf0001).queryExecution.executedPlan.toString
    assert(xc.contains("BroadcastExchange") || xc.contains("BroadcastHashJoin"),
      "lag grid must broadcast:\n" + xc)
    // the deliberate 15-row broadcast cross shows as BroadcastNestedLoop;
    // a CartesianProduct would mean the day equi-join degenerated
    assert(!xc.contains("CartesianProduct"),
      "daily series must equi-join on the lagged day key:\n" + xc)
  }

  test("corpus-sixth family keeps its scale shapes") {
    // containment: candidates must come from the rare-gram equi-join —
    // a cartesian/nested-loop pair scan is the all-pairs compare the
    // df-prune exists to avoid
    val cont = plan(graft.queries.CorpusSixth.containmentPairs(spark, sf0001))
    assert(!cont.contains("CartesianProduct") &&
      !cont.contains("BroadcastNestedLoopJoin"),
      "containment candidates must equi-join on rare grams:\n" + cont)
    // novelty: the reference probe is a LEFT ANTI join on the gram key
    val nov = plan(graft.queries.CorpusSixth.noveltyVsReference(spark, sf0001))
    assert(nov.contains("LeftAnti"),
      "novelty probe must be an anti join on the gram key:\n" + nov)
    assert(!nov.contains("CartesianProduct"), "novelty must stay keyed:\n" + nov)
    // embedding audit: the per-vector fold happens INSIDE the array —
    // no explode (64x row blowup) anywhere in the plan
    val emb = graft.queries.CorpusSixth.embeddingNormAudit(spark, sf0001)
    assert(!emb.queryExecution.optimizedPlan.toString.contains("Generate"),
      "norm fold must stay inside the array, not explode components")
  }

  test("analytics-sixth family keeps its scale shapes") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // recommender: all THREE rank filters (per-customer basket cap ≤50
    // feeding pair generation, top-25 neighbors, top-10 recs) must push
    // map-side as WindowGroupLimit — the basket cap is the quadratic
    // guard on the train self-join and a refactor must not drop it;
    // basket exclusion stays a LEFT ANTI join; no global windows
    // anywhere in the pipeline.
    val rec = graft.queries.AnalyticsSixth.copurchaseRecallAtK(spark, sf0001)
    val recP = plan(rec)
    assert("WindowGroupLimit".r.findAllIn(recP).size >= 3,
      "basket-cap + neighbor + rec rank filters must push as WindowGroupLimit:\n" + recP)
    assert(recP.contains("LeftAnti"),
      "train-basket exclusion must be an anti join:\n" + recP)
    assert(rec.queryExecution.optimizedPlan
      .collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
      "recommender windows must all be keyed")
    // r14: the truncated item-item model and the eval-user set are
    // Θ(catalog)/Θ(|V|) relations, so the scoring joins must NOT carry a
    // forced broadcast (a hard broadcast() died on driver.maxResultSize
    // at the ×1000 audit — 20 M parts → a 500 M-row model). The
    // broadcast decision belongs to AQE's runtime-size conversion: pin
    // (a) no user-hinted broadcast on those joins in the optimized plan,
    // and (b) at gate scale AQE still CONVERTS them to BroadcastHashJoin
    // in the final adaptive plan — the r8 map-side property, now
    // runtime-adaptive instead of scale-unsafe.
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    // (the final one-row scalar crossJoin broadcast is condition-less
    // and bounded — only keyed joins are covered by the no-hint rule)
    val forced = rec.queryExecution.optimizedPlan.collect {
      case j: LJoin if j.condition.isDefined &&
        (j.hint.leftHint.exists(_.strategy.isDefined) ||
          j.hint.rightHint.exists(_.strategy.isDefined)) => j
    }
    assert(forced.isEmpty,
      "scoring joins must leave the broadcast decision to AQE (no forced hints)")
    // finalPhysicalPlan alone drives AQE to the final plan — a noop
    // pre-write here would run its own QueryExecution and then pay for
    // every stage a second time (the ExplainQuery anti-pattern).
    val recFinal = rec.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.finalPhysicalPlan.toString
      case p => p.toString
    }
    assert("BroadcastHashJoin".r.findAllIn(recFinal).size >= 2,
      "at gate scale AQE must convert the model + eval-user joins to " +
        "broadcast:\n" + recFinal)
    // LTV curve + weekday outliers: keyed windows only (cohort/weekday)
    Seq(
      "cohort_ltv_curve" ->
        graft.queries.AnalyticsSixth.cohortLtvCurve(spark, sf0001),
      "weekday_adjusted_outliers" ->
        graft.queries.AnalyticsSixth.weekdayAdjustedOutliers(spark, sf0001)
    ).foreach { case (name, df) =>
      assert(df.queryExecution.optimizedPlan
        .collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
        s"$name must only use keyed windows")
    }
    // weekly movers: distributed partial top-k, scalar max broadcast
    val mov = plan(graft.queries.AnalyticsSixth.weeklyTopMovers(spark, sf0001))
    assert(mov.contains("TakeOrderedAndProject"),
      "movers top-20 must be a distributed partial top-k:\n" + mov)
    // linear attribution: the 24h window predicate rides the user-keyed
    // join — no cartesian / nested-loop pairing of events
    val att = plan(graft.queries.AnalyticsSixth.attributionLinear(spark, sf0001))
    assert(!att.contains("CartesianProduct"),
      "attribution interval join must stay user-keyed:\n" + att)
  }

  test("stats-sixth batch keeps its scale shapes") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // mann-whitney / sax: their global windows are acceptable ONLY over
    // aggregated bounded domains (distinct cents / daily histogram) —
    // same structural pin as the kcore threshold guard.
    Seq(
      "mann_whitney_u" ->
        graft.queries.StatsSixth.mannWhitneyU(spark, sf0001),
      "sax_daily_revenue" ->
        graft.queries.SeriesFifth.saxDailyRevenue(spark, sf0001)
    ).foreach { case (name, df) =>
      val lp = df.queryExecution.optimizedPlan
      val globalWindows = lp.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.nonEmpty,
        s"$name should still use its bounded-domain global window")
      globalWindows.foreach { w =>
        assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
          s"$name: global window must order an aggregated domain, " +
            s"not raw rows:\n$lp")
      }
    }
    // kendall: the quadratic pairing is over the DAILY aggregate via a
    // broadcast nested loop — never a shuffled pairwise join of raw rows.
    val ken = graft.queries.StatsSixth.kendallTauDaily(spark, sf0001)
    val kenP = plan(ken)
    assert(kenP.contains("BroadcastNestedLoopJoin"),
      "kendall day-pair join must be a broadcast nested loop:\n" + kenP)
    assert(ken.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        Seq(j.left, j.right).count(
          _.collect { case a: Aggregate => a }.nonEmpty)
    }.forall(_ == 2),
      "kendall pair join must pair the daily AGGREGATE with itself")
    // assortativity: keyed windows + keyed joins only.
    val ass = graft.queries.StatsSixth.graphAssortativity(spark, sf0001)
    assert(!plan(ass).contains("CartesianProduct"),
      "assortativity joins must stay part-keyed")
    assert(ass.queryExecution.optimizedPlan
      .collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
      "assortativity basket-cap window must be keyed by order")
    // bloom fpr: absent-probe filter is an anti join; the bitset rides a
    // 1-row broadcast; nothing pairs.
    val fpr = plan(graft.queries.StatsSixth.bloomFprAudit(spark, sf0001))
    assert(fpr.contains("LeftAnti"),
      "bloom fpr probes must be selected with an anti join:\n" + fpr)
    assert(fpr.contains("BroadcastNestedLoopJoin") &&
      !fpr.contains("CartesianProduct"),
      "bloom bitset must broadcast onto the probe scan:\n" + fpr)
    // fertility / curriculum: map-only scans into one aggregation — no
    // joins, no windows, anywhere.
    Seq(
      "tokenizer_fertility" ->
        graft.queries.CorpusSixth.tokenizerFertility(spark, sf0001),
      "curriculum_buckets" ->
        graft.queries.CorpusSixth.curriculumBuckets(spark, sf0001)
    ).foreach { case (name, df) =>
      val p = plan(df)
      assert(!p.contains("Join"), s"$name must stay join-free:\n" + p)
      assert(df.queryExecution.optimizedPlan
        .collect { case w: LWindow => w }.isEmpty,
        s"$name must stay window-free")
    }
    // nprobe sweep: per-nprobe top-10 must push map-side
    // (WindowGroupLimit); the exact top-10 must be a distributed
    // partial top-k (TakeOrderedAndProject), never a global sort.
    val np = plan(graft.queries.SimPq.annNprobeSweep(spark, sf0001))
    assert(np.contains("WindowGroupLimit"),
      "per-nprobe top-10 lost the partial top-k pushdown:\n" + np)
    assert(np.contains("TakeOrderedAndProject"),
      "exact top-10 must be a distributed partial top-k:\n" + np)
    // bootstrap: the only global window orders the B-row replicate-mean
    // AGGREGATE (constant-bounded), never the resampled raw rows.
    val boot = graft.queries.StatsSixth.bootstrapCiMean(spark, sf0001)
    boot.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        "bootstrap global window must order the replicate-mean aggregate")
    }
    // repurchase cadence: per-user windows only.
    val rpi = graft.queries.StatsSixth.repeatPurchaseInterval(spark, sf0001)
    assert(rpi.queryExecution.optimizedPlan
      .collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
      "repeat_purchase_interval windows must all be user-keyed")
    // rich club / vocab growth / ship lag: keyed joins + aggregates
    // only — no cartesian pairing, no global windows.
    Seq(
      "rich_club_coefficient" ->
        graft.queries.GraphMore.richClubCoefficient(spark, sf0001),
      "vocab_growth_curve" ->
        graft.queries.CorpusSixth.vocabGrowthCurve(spark, sf0001),
      "ship_lag_histogram" ->
        graft.queries.RelationalFourth.shipLagHistogram(spark, sf0001),
      "pca_power_iteration" ->
        graft.queries.SimMore.pcaPowerIteration(spark, sf0001),
      "basket_size_vs_value" ->
        graft.queries.AnalyticsSixth.basketSizeVsValue(spark, sf0001),
      "monthly_seasonality" ->
        graft.queries.AnalyticsSixth.monthlySeasonality(spark, sf0001)
    ).foreach { case (name, df) =>
      assert(!plan(df).contains("CartesianProduct"),
        s"$name joins must stay keyed or broadcast")
      assert(df.queryExecution.optimizedPlan
        .collect { case w: LWindow => w }.isEmpty,
        s"$name must stay window-free")
    }
    // dedup eval: both pair generators stay keyed joins; collocation:
    // vocabulary cap is a distributed partial top-k and pairs stay
    // doc-keyed.
    val de = plan(graft.queries.CorpusSeventh.dedupEvalPairs(spark, sf0001))
    assert(!de.contains("CartesianProduct"),
      "dedup eval pair joins must stay keyed:\n" + de)
    val cp = plan(graft.queries.CorpusSeventh.collocationPmi(spark, sf0001))
    assert(cp.contains("TakeOrderedAndProject"),
      "collocation vocab cap must be a distributed partial top-k:\n" + cp)
    assert(!cp.contains("CartesianProduct"),
      "collocation pairs must stay doc-keyed:\n" + cp)
    // embedding evals: purity majority pick + knn vote pick are keyed
    // rank-1 filters (WindowGroupLimit); no global windows anywhere.
    Seq(
      "cluster_purity" -> graft.queries.SimMore.clusterPurity(spark, sf0001),
      "knn_label_accuracy" ->
        graft.queries.SimMore.knnLabelAccuracy(spark, sf0001)
    ).foreach { case (name, df) =>
      val p = plan(df)
      assert(p.contains("WindowGroupLimit"),
        s"$name majority pick lost the partial top-k pushdown:\n" + p)
      assert(df.queryExecution.optimizedPlan
        .collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
        s"$name windows must all be keyed")
    }
    // scalar battery 2: one map-only projection — no join, no window,
    // no aggregate below the final sort.
    val sc2 = graft.queries.ScalarQueries.scalarFunctionsArray(spark, sf0001)
    assert(!plan(sc2).contains("Join"),
      "scalar battery must stay a map-only projection")
    assert(sc2.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }.isEmpty,
      "scalar battery must stay window-free")
    // BFS: every frontier expansion is a keyed join + anti join — no
    // cartesian pairing anywhere in the unrolled rounds.
    val bfs = plan(graft.queries.GraphMore.bfsDistanceHistogram(spark, sf0001))
    assert(!bfs.contains("CartesianProduct"),
      "BFS frontier joins must stay keyed:\n" + bfs)
    // batch 7: dbscan pairs bucket-keyed; triples order-keyed with a
    // distributed top-20; DiD cells one aggregation; hazard's global
    // window orders the aggregated week domain.
    Seq(
      "dbscan_core_points" ->
        graft.queries.SimQueries.dbscanCorePoints(spark, sf0001),
      "frequent_triples" ->
        graft.queries.AnalyticsSeventh.frequentTriples(spark, sf0001),
      "diff_in_diff_promo" ->
        graft.queries.AnalyticsSeventh.diffInDiffPromo(spark, sf0001)
    ).foreach { case (name, df) =>
      assert(!plan(df).contains("CartesianProduct"),
        s"$name joins must stay keyed or broadcast")
    }
    assert(plan(graft.queries.AnalyticsSeventh.frequentTriples(spark, sf0001))
      .contains("TakeOrderedAndProject"),
      "triple top-20 must be a distributed partial top-k")
    val haz = graft.queries.AnalyticsSeventh.churnHazardCurve(spark, sf0001)
    haz.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        "hazard at-risk window must order the aggregated week domain")
    }
    // HHI / weighted median / weekly jaccard: keyed joins + keyed
    // windows only.
    Seq(
      "supplier_hhi" ->
        graft.queries.AnalyticsSeventh.supplierHhi(spark, sf0001),
      "weighted_median_price" ->
        graft.queries.AnalyticsSeventh.weightedMedianPrice(spark, sf0001),
      "weekly_user_jaccard" ->
        graft.queries.AnalyticsSeventh.weeklyUserJaccard(spark, sf0001)
    ).foreach { case (name, df) =>
      assert(!plan(df).contains("CartesianProduct"),
        s"$name joins must stay keyed or broadcast")
      assert(df.queryExecution.optimizedPlan
        .collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
        s"$name windows must all be keyed")
    }
    // label noise: bucket-keyed voting, WindowGroupLimit majority pick;
    // token percentiles: source-keyed windows only; rag plan: map-only.
    val lns = graft.queries.SimQueries.labelNoiseScan(spark, sf0001)
    assert(plan(lns).contains("WindowGroupLimit"),
      "label-noise majority pick lost the partial top-k pushdown")
    assert(lns.queryExecution.optimizedPlan
      .collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
      "label-noise windows must all be vector-keyed")
    val tps = graft.queries.CorpusSeventh
      .tokenPercentilesBySource(spark, sf0001)
    assert(tps.queryExecution.optimizedPlan
      .collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
      "token percentiles must use source-keyed windows only")
    val rcp = graft.queries.CorpusSeventh.ragChunkPlan(spark, sf0001)
    assert(!plan(rcp).contains("Join") && rcp.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }.isEmpty,
      "rag chunk plan must stay a map-only aggregate")
    // venn: bitmask aggregate, no windows/joins; yoy: global window
    // only over the aggregated year domain.
    val venn = graft.queries.AnalyticsSeventh.eventTypeVenn(spark, sf0001)
    assert(!plan(venn).contains("Join") && venn.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }.isEmpty,
      "venn must stay a two-level bitmask aggregate")
    val yoy = graft.queries.AnalyticsSeventh.revenueYoyGrowth(spark, sf0001)
    yoy.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        "yoy lag window must order the aggregated year domain")
    }
    // k_nn(k): keyed adjacency⋈degree joins, no windows; substitutes:
    // pure two-level aggregate with a distributed top-20.
    val knn = graft.queries.GraphMore.neighborDegreeFunction(spark, sf0001)
    assert(!plan(knn).contains("CartesianProduct") &&
      knn.queryExecution.optimizedPlan
        .collect { case w: LWindow => w }.isEmpty,
      "neighbor-degree function must stay keyed and window-free")
    val sub = plan(graft.queries.RelationalFourth.substituteParts(spark, sf0001))
    assert(!sub.contains("Join") && sub.contains("TakeOrderedAndProject"),
      "substitute parts must be a join-free aggregate with partial top-k")
    // gini-by-year: cumulative windows must be YEAR-keyed (the global
    // lorenz's bounded-domain argument does not transfer — per-year
    // partitions make it moot); retention/margins: keyed joins only.
    val gby = graft.queries.StatsFifth.giniByYear(spark, sf0001)
    assert(gby.queryExecution.optimizedPlan
      .collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
      "gini_by_year windows must be year-keyed")
    Seq(
      "supplier_yoy_retention" ->
        graft.queries.RelationalFourth.supplierYoyRetention(spark, sf0001),
      "brand_margin_stats" ->
        graft.queries.RelationalFourth.brandMarginStats(spark, sf0001)
    ).foreach { case (name, df) =>
      assert(!plan(df).contains("CartesianProduct"),
        s"$name joins must stay keyed or broadcast")
    }
    // order-frequency quartiles: the global cumulative window must sit
    // above the count-histogram aggregate (bounded distinct-count domain).
    val ofq = graft.queries.StatsSixth.orderFrequencyQuartiles(spark, sf0001)
    val ofqGlobals = ofq.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(ofqGlobals.nonEmpty,
      "order-frequency quartiles should use its bounded-domain window")
    ofqGlobals.foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        "quartile window must order the aggregated count histogram")
    }
  }
}
