package graft

/** Replay determinism: the whole oracle gate rests on every query being a
  * pure function of its input files — no rand(), no wall clock, no
  * partition-order-sensitive arithmetic. Re-running a representative
  * slice (one per family: decimal aggregation, window, LSH dedup, sketch,
  * fixed-point iteration, weighted sampling) must reproduce byte-equal
  * results within one session; across sessions the driver hash provides
  * the same guarantee vs DuckDB.
  */
class DeterminismSpec extends SparkTestBase {

  private val representatives = Seq(
    "q1_pricing_summary",     // decimal aggregation
    "window_running_sum",     // window frames
    "dedup_minhash_lsh",      // hash dedup + shuffle join
    "sketch_hll_distinct",    // sketch registers
    "pagerank_bipartite",     // iterative fixed point
    "sample_weighted",        // hash-priority sampling
    "sketch_quantile",        // KLL compactor (exact regime)
    "bm25_topk",              // fixed-point retrieval scoring
    "rrf_hybrid_search",      // full-outer rank fusion
    "sketch_rolling_distinct", // merged HLL registers
    "session_concurrency",    // sweep with tie ordering
    "ks_drift",               // integer ECDF gap + argmax tie-break
    "kcore_parts",            // iterative peeling loop
    "interpolate_linear",     // union + ignore-nulls window frames
    "asof_nearest_event",     // dual-frame nearest match + tie-to-past
    "hll_overlap_estimate")   // register-wise merge + inclusion-exclusion

  representatives.foreach { name =>
    test(s"$name reproduces byte-equal results on re-run") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf0001).collect().map(_.toString)
      val b = fn(spark, sf0001).collect().map(_.toString)
      assert(a.sameElements(b), s"$name diverged between runs")
    }
  }

  test("every gated query name has oracle SQL or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracle SQL (driver downgrades to rows-only): $missing")
  }
}
