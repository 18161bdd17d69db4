package graft

/** AQE invariance: adaptive execution re-plans at runtime (coalesced
  * shuffle partitions, demoted broadcasts, skew splits) — at 100 TB it
  * WILL fire differently than at the gate scale, so the answer must not
  * depend on it. Representative queries covering shuffle-heavy joins,
  * window rank filters, and sketch merges run with AQE on and off and
  * must return identical rows.
  */
class AqeInvarianceSpec extends SparkTestBase {

  private val representatives = Seq(
    "q5_region_revenue",       // multi-way star join
    "market_basket_lift",      // pair self-join + broadcast stats
    "window_topn_per_customer", // keyed rank filter (WindowGroupLimit)
    "sketch_hll_distinct",     // register-merge aggregate
    "dedup_minhash_lsh",       // banded self-join (AQE may pick broadcast)
    "bootstrap_ci_mean",       // replicate means + rank pick
    // round-9: numbered repartitions feeding explosions must hold
    // their answer whether or not AQE re-plans around them
    "ppjoin_exact_pairs",      // prefix self-join behind a numbered exchange
    "source_minhash_similarity", // posting join + signature fold
    "ngram_novelty_profile",   // gram df join off a checkpoint
    "embedding_clip_calibration") // bounded-histogram windows

  representatives.foreach { name =>
    test(s"$name returns identical rows with AQE on and off") {
      val fn = SparkEntry.queries(name)
      val conf = spark.conf
      val prev = conf.get("spark.sql.adaptive.enabled")
      def run(flag: String): Seq[String] = {
        conf.set("spark.sql.adaptive.enabled", flag)
        fn(spark, sf0001).collect().map(_.toString).toSeq
      }
      try {
        val on = run("true")
        val off = run("false")
        assert(on.nonEmpty, s"$name returned no rows")
        assert(on == off, s"$name differs between AQE on and off")
      } finally conf.set("spark.sql.adaptive.enabled", prev)
    }
  }
}
