package graft

/** Partition invariance: a distributed query's answer must not depend on
  * how the data happens to be split. The DuckDB gate runs at ONE
  * partitioning; this spec re-runs representative queries under 1 / 3 /
  * 13 shuffle partitions (prime fan-outs shift every hash boundary) and
  * asserts identical results — the property that exact-integer sums,
  * rounded-before-rank scores, and mergeable sketch buffers were built
  * to provide. A failure here means reduction-order or buffer-merge
  * sensitivity that WOULD surface as a flaky hash mismatch on a real
  * cluster.
  */
class PartitionInvarianceSpec extends SparkTestBase {

  private val representatives = Seq(
    "bm25_topk",               // micro-point contributions summed per pair
    "rfm_segments",            // percentile thresholds + quartile buckets
    "sketch_rolling_distinct", // HLL register merge across partials
    "sketch_quantile",         // KLL buffer merge tree varies with splits
    "incremental_rollup",      // partial-aggregate union merge
    "market_basket_lift",      // pair counts + double lift off exact ints
    "reservoir_sample",        // bounded top-k buffer merge order
    "suffix_dup_spans",        // inverted gram index + distinct-doc spread
    "label_centroids",         // fixed-point vector mean vs float sum order
    // round-5 additions
    "sketch_kmv",              // bottom-k rank over md5 hashes per group
    "ppjoin_exact_pairs",      // prefix-filter candidates + integer verify
    "winsorized_stats",        // per-group order statistics + clamped sums
    "kll_error_bound",         // verdict booleans under buffer-merge variance
    "watermark_lateness_histogram", // running max under hash-permuted order
    "seasonal_decompose_weekday",   // 128-bit moment fold
    // round-5 continuation additions
    "bootstrap_ci_mean",       // replicate-mean double ordering + rank pick
    "pca_power_iteration",     // integer matvec sums + truncating rescale
    "graph_assortativity",     // DECIMAL moment fold over edge endpoints
    "collocation_pmi",         // top-200 vocab tie-break + fixed-point lift
    "mann_whitney_u",          // value-histogram window + DECIMAL U terms
    "dedup_eval_pairs",        // banded-join candidates vs exact pair join
    // round-8 additions
    "embedding_scatter_spectrum", // integer scatter sums + driver Jacobi
    "bpe_train_rounds",        // per-round argmax pair + island merges
    "embedding_class_separation", // fixed-point centroids, negative-safe div
    "multimodal_imageio_decode",  // PNG roundtrip per row, order-free
    "copurchase_recall_at_k",  // r8 broadcast + fan-out repartition rewrite
    // round-9 additions
    "ngram_novelty_profile",   // gram df join + per-source mergeable sums
    "multimodal_phash_dedup",  // order-bit fingerprint buckets
    "embedding_ks_screen",     // cumulative histogram windows + rank ties
    "embedding_covariance_drift", // integer scatter + DECIMAL square fold
    "dataset_mixture_weights", // 20-key integer rates off a broadcast total
    "embedding_clip_calibration", // integer rank thresholds over histogram
    "source_minhash_similarity")  // min-hash string fold + posting join

  representatives.foreach { name =>
    test(s"$name is invariant to shuffle fan-out") {
      val fn = SparkEntry.queries(name)
      val conf = spark.conf
      val prev = conf.get("spark.sql.shuffle.partitions")
      def run(parts: String): Seq[String] = {
        conf.set("spark.sql.shuffle.partitions", parts)
        fn(spark, sf0001).collect().map(_.toString).toSeq
      }
      try {
        val one = run("1")
        val three = run("3")
        val prime = run("13")
        assert(one == three, s"$name differs between 1 and 3 partitions")
        assert(one == prime, s"$name differs between 1 and 13 partitions")
      } finally conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
