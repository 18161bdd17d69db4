package graft.text

import graft.Checkpoints.StableCheckpoint
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for document corpora (SURVEY.md §7.2(6); the core
  * LLM-data-pipeline operator set): exact, MinHash+LSH, SimHash, and n-gram
  * Jaccard. Everything is hash-based and deterministic (md5 — available and
  * bit-identical in every engine, so the DuckDB oracle can replay each
  * step), and everything is expressed as Catalyst column ops so the
  * pipeline stays declarative and shuffle-planned by the optimizer.
  *
  * Scale design:
  *  - exact dedup = one hash-groupBy shuffle, no pairwise work;
  *  - MinHash/LSH = per-row signatures (map-only) → band explode →
  *    bucket-join: candidate pairs are generated ONLY within equal buckets,
  *    turning the O(n²) pair space into per-bucket micro-joins — this is
  *    the 100 TB path;
  *  - SimHash = per-row 60-bit signature (map-only); hamming-ball pairing
  *    is done on bucket prefixes;
  *  - n-gram Jaccard = exact verifier, only ever run on blocked/candidate
  *    pairs, never the full cross product.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text fingerprint. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** k MinHash signature values: for seed s, min over tokens of
    * md5(s:token). String-min over hex digests ≡ min over the hash ring;
    * identical in any engine with md5 — the DuckDB oracle replays the same
    * definition in SQL.
    *
    * Computed by the codegen'd [[graft.functions.MinHashSignature]]
    * expression (one compiled loop per document) rather than the
    * higher-order-function composition, which evaluates interpreted and was
    * the dominant cost of the whole dedup path.
    */
  def minhashSignatureOfTokens(toks: Column, k: Int): Column = {
    graft.functions.MinHashSignature.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("minhash_sig", toks, lit(k))
  }

  /** Convenience wrapper over [[minhashSignatureOfTokens]]; prefer
    * projecting the token array first on anything bigger than a test row.
    */
  def minhashSignature(text: Column, k: Int): Column =
    minhashSignatureOfTokens(TextFunctions.tokens(text), k)

  /** LSH banding: `bands` buckets, each hashing `rowsPerBand` consecutive
    * signature values. Equal bucket in any band ⇒ candidate pair.
    */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** MinHash/LSH candidate pairs with estimated Jaccard similarity
    * (fraction of agreeing signature positions). Returns (id_a, id_b,
    * est_jaccard) with id_a < id_b, deduplicated across bands.
    */
  def minhashCandidates(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 16, bands: Int = 2): DataFrame = {
    val rowsPerBand = k / bands
    // Spread BEFORE signature computation: the per-doc minhash (k·tokens
    // md5 calls) is the dominant map cost, and a single-file parquet
    // source arrives as one partition.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // Materialize signatures ONCE (stableCheckpoint truncates lineage): the
    // self-join's two sides below would otherwise each recompute the full
    // k·tokens md5 signature pass (exchange reuse does not fire across the
    // renamed sides). Signatures are k×32 B per doc (orders smaller than
    // the text), so materializing them is the standard two-pass LSH design
    // at scale. Tokenize BEFORE the repartition: the exchange is a barrier
    // between the token projection and the signature projection, so
    // CollapseProject cannot inline the (single-use) token array back into
    // the signature expression — which would re-run the regexp split.
    // ... and spread the RAW TEXT first: tokenize itself (regexp split)
    // is the second-biggest map cost and would otherwise run inside the
    // one-partition scan stage. Two cheap 5k-row exchanges buy a fully
    // parallel tokenize AND signature pass while keeping the barrier.
    val sigs = docs
      .select(col(idCol).as("id"), col(textCol))
      .repartition(par)
      .select(col("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .repartition(par)
      .select(col("id"), minhashSignatureOfTokens(col("toks"), k).as("sig"))
      .stableCheckpoint()
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(lshBuckets(col("sig"), bands, rowsPerBand))
        .as(Seq("band", "bucket")))
    // The candidate join is a plain shuffle join on (band, bucket) — NO
    // broadcast hint: the banded relation is the whole corpus, so a
    // broadcast build side would be a scale-killer at 100 TB (build side =
    // entire dataset). Shuffling co-locates equal buckets on both sides;
    // AQE may still elect a broadcast at toy scale factors where the
    // corpus genuinely fits, which is the correct adaptive behavior. Hot
    // buckets (stop-gram-like bucket skew) are AQE skew-join territory.
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("band"), col("bucket"))
    val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("band"), col("bucket"))
    // Score BEFORE the pair-dedup shuffle: a pair sharing both bands is
    // scored twice (cheap — the positional element_at comparisons stay in
    // whole-stage codegen; zip_with/aggregate lambdas would run ~5×
    // slower interpreted), but the dropDuplicates exchange then carries
    // only (id_a, id_b, double) instead of two full k×32 B signatures —
    // a ~30× smaller shuffle, which is what dominates on millions of
    // candidate pairs. The score is deterministic per pair, so duplicate
    // rows agree and dedup-after-score is exact.
    val matches = (0 until k).map(i =>
      when(element_at(col("sig_a"), i + 1) === element_at(col("sig_b"), i + 1),
        1L).otherwise(0L)).reduce(_ + _)
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (matches.cast("double") / lit(k.toDouble)).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /** 60-bit SimHash over whitespace tokens: per token take the first 15 hex
    * chars of md5 as a 60-bit integer; for each bit position sum ±1 across
    * tokens; set the output bit where the sum is positive. Pure built-in
    * composition — stays codegen'd.
    *
    * Evaluation shape matters here: a higher-order-function lambda
    * re-evaluates every NON-INPUT expression it references on each
    * invocation (Catalyst does not CSE across lambda calls), so the
    * original "fold bits 0..59, re-aggregating the token hashes inside
    * the lambda" form recomputed the md5-per-token array 60 TIMES per
    * document — invisible under count()-based timing (the whole
    * expression got pruned) and exposed by the r11 noop-sink bench fix
    * at 30.5 s for 500k docs. This form keeps both traversals as
    * aggregate INPUTS (each evaluated once): one pass over the token
    * hashes maintains all 60 ±1 counters; a second fold walks the
    * 60-element counter array with a (bit, acc) struct accumulator.
    * Identical output, md5 once per token.
    */
  def simhash(text: Column): Column = {
    // codegen'd loop ([[graft.functions.SimHash60]]) — definitionally the
    // two-fold HOF composition it replaces (md5-top60 per token, 60 ±1
    // counters, positive-counter bits), which ran interpreted with a
    // 60-element allocation per TOKEN. NULL text still → 0L (the
    // expression is null-intolerant like the aggregate chain was).
    graft.functions.SimHash60.register(
      org.apache.spark.sql.SparkSession.active)
    coalesce(
      call_function("simhash60", TextFunctions.tokens(text)), lit(0L))
  }

  /** Hamming distance between two simhash signatures (bit_count of xor). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: block on the top `prefixBits` of
    * the 60-bit signature (similar documents share the high bits with
    * overwhelming probability), pair within blocks, keep pairs within the
    * hamming-ball radius, and verify each with edit distance over a text
    * prefix (Levenshtein is the same DP in every engine — integer-exact).
    *
    * Scale shape mirrors [[minhashCandidates]]: signatures are map-only,
    * the pair space exists only inside prefix blocks (a shuffle equijoin,
    * never all-pairs), and the expensive exact verifier runs on the
    * already-blocked candidates.
    */
  def simhashPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", prefixBits: Int = 12,
      maxHamming: Int = 8): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val sh = docs
      .select(col(idCol).as("id"), col(textCol).as("txt"))
      .repartition(par)
      .select(col("id"), substring(col("txt"), 1, 40).as("prefix"),
        simhash(col("txt")).as("sh"))
      .withColumn("block", shiftright(col("sh"), 60 - prefixBits))
      .stableCheckpoint()
    val a = sh.toDF("id_a", "prefix_a", "sh_a", "block")
    val b = sh.toDF("id_b", "prefix_b", "sh_b", "block")
    a.join(b, "block")
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hammingDistance(col("sh_a"), col("sh_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"),
        levenshtein(col("prefix_a"), col("prefix_b")).cast("long")
          .as("prefix_edit_distance"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Word n-gram sets from a MATERIALIZED token-array column (see
    * [[minhashSignatureOfTokens]] for why the tokens must be an attribute:
    * an embedded `tokens(text)` would re-split the document once per gram
    * position — quadratic in document length).
    */
  def ngramSetOfTokens(toks: Column, n: Int): Column = {
    // codegen'd loop ([[graft.functions.NgramSet]]) — definitionally the
    // HOF `array_distinct(transform(sequence(1, greatest(size-n+1, 1)),
    // i -> concat_ws(' ', slice(toks, i, n))))` it replaces, which ran
    // interpreted in eleven gated queries' hottest map stage
    graft.functions.NgramSet.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("ngram_set", toks, lit(n))
  }

  /** Convenience wrapper over [[ngramSetOfTokens]]; prefer projecting the
    * token array first on anything bigger than a test row.
    */
  def ngramSet(text: Column, n: Int): Column =
    ngramSetOfTokens(TextFunctions.tokens(text), n)

  /** Exact n-gram Jaccard similarity between two n-gram set columns:
    * |A∩B| / |A∪B| — integer-count division, bit-identical everywhere.
    * |A∪B| is computed as |A|+|B|−|A∩B| (one set walk instead of two).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  /** Exact near-dup pairs above a Jaccard threshold, via an INVERTED INDEX
    * rather than a blocked cross join: explode each document's distinct
    * n-grams (hashed to 64-bit longs), self-join the posting lists on
    * (block, gram) to count shared grams per pair, then
    * jaccard = |∩| / (|A| + |B| − |∩|).
    *
    * Scale rationale: the pair space is never materialized — work is
    * Σ_g f_g² over gram frequencies (456k posting-pairs on this corpus vs
    * 1.8M full pairs × ~80-element set intersections for the cross-join
    * formulation), every step is a shuffle the optimizer plans (no
    * quadratic per-task loops), and skew is per-gram, not per-block.
    * Pairs sharing zero grams have jaccard 0 and a positive threshold
    * excludes them, so the index formulation is exactly equivalent.
    *
    * `maxGramDocFreq` is the 100 TB stop-gram guard: Σ_g f_g² is dominated
    * by the most frequent grams (boilerplate, licence headers), and one
    * gram appearing in 10⁶ documents alone contributes 10¹² posting pairs.
    * With a cap, grams whose document frequency exceeds it are treated as
    * stop-grams and removed from BOTH the posting lists and the set sizes —
    * i.e. the result is exactly [[ngramJaccardPairs]] over documents with
    * those grams deleted (jaccard over the informative-gram vocabulary;
    * spec-verified equivalence). `None` (the default, used by the gated
    * query) changes nothing.
    */
  def ngramJaccardPairs(docs: DataFrame, blockCols: Seq[String],
      textCol: String = "text", idCol: String = "doc_id", n: Int = 3,
      threshold: Double = 0.2,
      maxGramDocFreq: Option[Long] = None): DataFrame = {
    require(threshold > 0.0, "inverted-index jaccard needs a positive threshold")
    // 64-bit hashed grams: long equality in the join instead of string
    // equality; sizes unchanged modulo ~1e-9 collisions, so the SQL oracle
    // computing on string grams sees identical counts. Input is spread
    // first — gram construction (interpreted lambdas) dominates the map
    // side and single-file sources arrive as one partition.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread = docs.repartition(par)
    // Materialize ONE gram-set array per document (stableCheckpoint — the
    // arrays are ~n_grams×8 B/doc, orders smaller than the text), for two
    // reasons measured on this corpus: (a) referencing the gram array from
    // both `size` and `explode` in one projection re-evaluates the whole
    // interpreted gram construction per reference (6× the stage), and
    // (b) exchange reuse does NOT fire across the self-join's two renamed
    // sides, so an unmaterialized plan runs the full map work twice. After
    // the checkpoint both effects read a stored array instead.
    val withSet = spread
      .select((blockCols.map(col) :+ col(idCol).as("id") :+
        TextFunctions.tokens(col(textCol)).as("toks")): _*)
      .select((blockCols.map(col) :+ col("id") :+
        array_distinct(transform(ngramSetOfTokens(col("toks"), n), g => xxhash64(g)))
          .as("ngrams")): _*)
      .stableCheckpoint()
    // Carry the set size ON the posting rows: |A| and |B| then arrive with
    // the join, so no separate size-aggregate and no join-back is needed.
    val allPostings = withSet.select(
      (blockCols.map(col) :+ col("id") :+ size(col("ngrams")).as("sz") :+
        explode(col("ngrams")).as("g")): _*)
    // Stop-gram cap: count each gram's doc frequency (a window over the
    // same (block, gram) partitioning the join shuffles on anyway), drop
    // over-cap grams, and RECOMPUTE the per-doc sizes over the surviving
    // grams so |A| and |B| describe the same filtered vocabulary as |∩|.
    val postings = maxGramDocFreq match {
      case None => allPostings
      case Some(cap) =>
        import org.apache.spark.sql.expressions.Window
        val byGram = Window.partitionBy((blockCols :+ "g").map(col): _*)
        val byDoc = Window.partitionBy((blockCols :+ "id").map(col): _*)
        allPostings
          .withColumn("__df", count(lit(1)).over(byGram))
          .filter(col("__df") <= cap)
          .withColumn("sz", count(lit(1)).over(byDoc))
          .drop("__df")
    }
    val joinKeys = blockCols :+ "g"
    val pa = postings.toDF(blockCols ++ Seq("id_a", "sz_a", "g"): _*)
    val pb = postings.toDF(blockCols ++ Seq("id_b", "sz_b", "g"): _*)
    pa.join(pb, joinKeys)
      .filter(col("id_a") < col("id_b"))
      .groupBy((blockCols.map(col) :+ col("id_a") :+ col("id_b") :+
        col("sz_a") :+ col("sz_b")): _*)
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard_sim", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 4))
      .filter(col("jaccard_sim") > threshold)
      .select((blockCols.map(col) :+ col("id_a") :+ col("id_b") :+ col("jaccard_sim")): _*)
  }

  /** Connected components over an undirected duplicate-pair graph —
    * the clustering step downstream of any candidate generator
    * ([[minhashCandidates]], [[ngramJaccardPairs]]): every document in a
    * component shares a chain of above-threshold pairs, and min-id becomes
    * the cluster representative to keep.
    *
    * Iterative min-label propagation: each round every node takes the min
    * of its own label and its neighbors' labels (one join + one groupBy,
    * both distributed; `stableCheckpoint` truncates the growing lineage).
    * Rounds needed = graph diameter — near-dup components are shallow
    * chains, so convergence is fast; the driver-side loop only ever pulls
    * a scalar convergence count, never data. Deterministic: min over ids,
    * no randomness.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    // LAZY checkpoint: the edge count below is the materializing action
    // (one job saves the blocks AND returns the scalar)
    val edges0 = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .stableCheckpointLazy()
    // Right-size the iteration parallelism to the EDGE count, not the
    // session default: candidate-pair graphs are usually tiny relative
    // to the corpus, and every label-propagation round otherwise pays a
    // full-width shuffle (32 near-empty partitions per join/agg, ~10
    // rounds). ~50k edges per partition; the count is free (edges are
    // already checkpointed).
    val parts = math.max(1, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism,
      (edges0.count() / 50000L).toInt + 1))
    // Both lazy: round 1's convergence aggregate is the first action over
    // them, and its one job materializes edge AND label blocks en route.
    val edges = edges0.repartition(parts, col("dst")).stableCheckpointLazy()
    var labels = edges.select(col("src")).distinct()
      .withColumn("lbl", col("src")).stableCheckpointLazy()
    var iter = 0
    var converged = false
    // Convergence via the label-sum invariant where labels are numeric
    // (every gated caller): min-propagation can only DECREASE labels, so
    // Σlbl — as DECIMAL(38,0), a long Σ would overflow (ANSI: throw) at
    // extreme id×row scale — is strictly decreasing until the fixed
    // point and equal exactly at it. One single-column agg over the
    // checkpointed result per round instead of a join-and-count; the
    // join-count remains for non-numeric (e.g. string-id) graphs.
    val numericLbl = labels.schema("lbl").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    var prevSum = Option.empty[java.math.BigDecimal]
    // r19 attack, measured WORSE and reverted: pointer-halving
    // (l(x) := min(l(x), l(l(x))) via a prop⋈prop label self-join per
    // round) converged in ~17 rounds instead of ~21 on the sf0.1
    // semantic-pair graph — far from the O(log d) hope, because most
    // nodes settle early and the residual Σlbl decrements crawl along a
    // few long chains where the shortcut rarely lands — while the extra
    // Θ(V) self-join cost every round: family isolated ABBA min-of-5
    // 5.80 → 6.72 s (×1.16). The diameter-round loop below stays.
    while (iter < maxIter && !converged) {
      // LAZY: the convergence check right below (Σlbl or the isEmpty
      // join — both paths always run one) doubles as the materializer,
      // halving the loop's driver round-trips (2 jobs/round → 1).
      val next = edges
        .join(labels.select(col("src").as("dst"), col("lbl")), "dst")
        .select(col("src"), col("lbl"))
        .union(labels)
        .groupBy(col("src")).agg(min(col("lbl")).as("lbl"))
        .stableCheckpointLazy()
      if (numericLbl) {
        val s = next.agg(sum(col("lbl").cast("decimal(38,0)")))
          .head().getDecimal(0)
        converged = prevSum.contains(s)
        prevSum = Some(s)
      } else {
        converged = next
          .join(labels.select(col("src"), col("lbl").as("__old")), "src")
          .filter(col("lbl") =!= col("__old")).isEmpty
      }
      labels = next
      iter += 1
    }
    labels
  }
}
