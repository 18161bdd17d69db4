package graft.queries

import graft.Checkpoints.StableCheckpoint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.{Dedup, TextFunctions}

/** Gated text-analysis + dedup queries over `documents` (driver-mandated
  * extension surface). Each replays in DuckDB via md5-based hashing and
  * list comprehensions, so the whole dedup pipeline is oracle-checked end
  * to end, not just row-counted.
  */
object TextQueries {

  /** Per-document text statistics: token count, language guess, quality
    * score, fingerprints.
    *
    * Shape (r12): sort BELOW the scoring project, not above it. The old
    * `select(heavy).orderBy(doc_id)` put a range exchange over the
    * expensive projection, and RangePartitioner's reservoir sample
    * iterates EVERY child row — so the per-doc HOF scoring ran twice
    * (warm isolated profile: two ≈3.3 s single-task stages, 7.0 s
    * steady state). `repartitionByRange + sortWithinPartitions` orders
    * the CHEAP scan instead (total order: range partitions are ordered,
    * rows sorted within, projection preserves row order), the heavy
    * project evaluates once above it, and the numbered range exchange
    * also spreads the map work across 32 tasks (the one-row-group
    * testdata scan otherwise single-threads it; cluster files split
    * naturally, where this exchange is just the final presentation
    * sort). Measured 7.0 → 0.6 s warm.
    */
  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .repartitionByRange(
        spark.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.langId(col("text")).as("lang_guess"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.fingerprint(col("text")).as("fingerprint"),
        TextFunctions.minShingleFingerprint(col("text"), 3).as("min_shingle"))

  val textStatsSql: String = {
    val en = TextFunctions.langMarkers("en").map(s => s"'$s'").mkString(", ")
    val es = TextFunctions.langMarkers("es").map(s => s"'$s'").mkString(", ")
    val de = TextFunctions.langMarkers("de").map(s => s"'$s'").mkString(", ")
    val fr = TextFunctions.langMarkers("fr").map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, text, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents
       |), scored AS (
       |  SELECT doc_id, text, t,
       |    len(t) AS n_tokens,
       |    len(list_filter(t, x -> list_contains([$en], x))) AS hit_en,
       |    len(list_filter(t, x -> list_contains([$es], x))) AS hit_es,
       |    len(list_filter(t, x -> list_contains([$de], x))) AS hit_de,
       |    len(list_filter(t, x -> list_contains([$fr], x))) AS hit_fr
       |  FROM toks)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CASE WHEN greatest(hit_en, hit_es, hit_de, hit_fr) = 0 THEN 'und'
       |       WHEN hit_en = greatest(hit_en, hit_es, hit_de, hit_fr) THEN 'en'
       |       WHEN hit_es = greatest(hit_en, hit_es, hit_de, hit_fr) THEN 'es'
       |       WHEN hit_de = greatest(hit_en, hit_es, hit_de, hit_fr) THEN 'de'
       |       ELSE 'fr' END AS lang_guess,
       |  round(0.5 * least(n_tokens / 50.0, 1.0)
       |      + 0.3 * (hit_en / CAST(n_tokens AS DOUBLE))
       |      + 0.2 * (length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
       |               / CAST(length(text) AS DOUBLE)), 4) AS quality,
       |  md5(lower(trim(text))) AS fingerprint,
       |  list_min([md5(array_to_string(t[i:i+2], ' '))
       |            for i in range(1, greatest(len(t) - 2, 1) + 1)]) AS min_shingle
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  /** Training-data filter pipeline: quality score + language gate + length
    * band, emitting the kept documents — the composition a real corpus
    * cleaning job runs (filters are all pushable projections; one scan, no
    * shuffle until the final sort).
    */
  def qualityFilterPipeline(spark: SparkSession, sfDir: String): DataFrame =
    // orderedBelow instead of a final orderBy (r12): the OUTPUT scoring
    // projection evaluates once above the range exchange. The quality
    // PREDICATE still pushes below it (Catalyst pushes deterministic
    // filters through RepartitionByExpression — desirable at scale: the
    // exchange then carries only the ~surviving fraction), so the range
    // sample's residual is one predicate pass — allowlisted with
    // rationale in SortSampleLintSpec.
    QueryShapes.orderedBelow(Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .filter(col("quality") > 0.3 && col("n_tokens").between(5, 200) &&
        col("lang").isin("en", "es", "de", "fr"))
      .select(col("doc_id"), col("lang"), col("quality"), col("n_tokens"))

  val qualityFilterPipelineSql: String = {
    val en = TextFunctions.langMarkers("en").map(s => s"'$s'").mkString(", ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens,
       |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |        x -> list_contains([$en], x))) AS hit_en,
       |    length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS n_alpha,
       |    length(text) AS n_chars_txt
       |  FROM documents)
       |SELECT doc_id, lang,
       |  round(0.5 * least(n_tokens / 50.0, 1.0)
       |      + 0.3 * (hit_en / CAST(n_tokens AS DOUBLE))
       |      + 0.2 * (n_alpha / CAST(n_chars_txt AS DOUBLE)), 4) AS quality,
       |  CAST(n_tokens AS BIGINT) AS n_tokens
       |FROM scored
       |WHERE round(0.5 * least(n_tokens / 50.0, 1.0)
       |      + 0.3 * (hit_en / CAST(n_tokens AS DOUBLE))
       |      + 0.2 * (n_alpha / CAST(n_chars_txt AS DOUBLE)), 4) > 0.3
       |  AND n_tokens BETWEEN 5 AND 200
       |  AND lang IN ('en','es','de','fr')
       |ORDER BY doc_id""".stripMargin
  }

  /** Exact dedup: normalized-fingerprint groups with canonical id. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(spark, sfDir))
      .orderBy(col("fingerprint"))

  val dedupExactSql: String =
    """SELECT md5(lower(trim(text))) AS fingerprint,
      |  min(doc_id) AS canonical_id, count(*) AS n_docs
      |FROM documents
      |GROUP BY 1
      |ORDER BY fingerprint""".stripMargin

  /** MinHash(k=16) + LSH(2 bands × 8 rows) candidate pairs. */
  def dedupMinhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashCandidates(Tables.documents(spark, sfDir), k = 16, bands = 2)
      .orderBy(col("id_a"), col("id_b"))

  val dedupMinhashLshSql: String =
    """WITH toks AS (
      |  SELECT doc_id AS id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents
      |), sigs AS (
      |  SELECT id, [list_min([md5(s::VARCHAR || ':' || x) for x in t])
      |              for s in range(0, 16)] AS sig
      |  FROM toks
      |), bands AS (
      |  SELECT id, sig, b, md5(array_to_string(sig[b*8+1:b*8+8], '|')) AS bucket
      |  FROM sigs, range(0, 2) r(b)
      |)
      |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
      |  len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) / 16.0 AS est_jaccard
      |FROM bands a JOIN bands b ON a.b = b.b AND a.bucket = b.bucket AND a.id < b.id
      |ORDER BY id_a, id_b""".stripMargin

  /** EXACT set-similarity join with PPJoin-style prefix filtering — the
    * deterministic complement to the MinHash path: all document pairs
    * with character-8-gram-set Jaccard ≥ 0.95, found WITHOUT an all-pairs compare
    * and WITHOUT sketch error. Two published prunes do the work:
    * (1) length filter — 19·|b| ≤ 20·|a| and 19·|a| ≤ 20·|b|, else
    * the bound fails; (2) prefix filter — order each doc's tokens
    * globally by (document frequency asc, token) and keep only the
    * first s − ⌈0.95·s⌉ + 1 ("a qualifying pair must share a token
    * among the rarest prefix of either side"); candidates come from an
    * equi-join on those prefix tokens only. Verification is pure
    * integer arithmetic (20·|∩| ≥ 19·|∪|), so the gate hashes the
    * exact decision. (This corpus is synthetically self-similar — at
    * t = 0.5 a quarter of ALL pairs qualify, which defeats filtering;
    * the near-verbatim 0.95 regime is what exact-pair mining is for.) Scale shape:
    * one vocabulary-keyed df join, one partitioned window for the
    * prefix ranks, a token-keyed candidate join bounded by rare-token
    * posting lists, and a per-candidate verify — the standard
    * distributed PPJoin layout.
    */
  def ppjoinExactPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // explicit numbered repartition: the one-row-group documents scan
    // would otherwise run the 8-gram explosion below on a single task
    val docs = Tables.documents(spark, sfDir)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("doc_id"))
    // character 8-grams, NOT tokens: this corpus's ~31-type vocabulary
    // makes every token posting list corpus-sized (no token is "rare"),
    // which defeats prefix filtering; the gram alphabet is large enough
    // for genuine df spread — the regime the prefix filter assumes
    val gramsExpr = expr(
      "array_distinct(transform(sequence(1, greatest(n_chars - 7, 1))," +
        " p -> substring(text, p, 8)))")
    val tok = docs
      .select(col("doc_id"), explode(gramsExpr).as("tok"))
    val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // r19: sz = |distinct grams| comes straight off the gram array —
    // size(gramsExpr) per doc — instead of exploding 3.5M tok rows into
    // a per-doc count aggregate (one whole stage + exchange gone). A
    // checkpointed shared gram-set relation was also tried and measured
    // 3.02 vs 1.94 s isolated (materializing the big deserialized
    // arrays loses to recomputing the cheap transform per consumer) —
    // reverted; the explosion stays recomputed per branch on purpose.
    val sizes = docs.select(col("doc_id"),
      size(gramsExpr).cast("long").as("sz"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
    val prefix = tok.join(dfreq, "tok").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= expr("sz - ((sz * 19 + 19) div 20) + 1"))
      .select(col("tok"), col("doc_id"), col("sz"), col("rn"))
      // numbered tok-keyed repartition: the filtered prefix relation is
      // small in BYTES, so AQE coalesces the self-join below to 1-2
      // tasks — but its OUTPUT is the posting-pair explosion (the r9
      // full-surface sweep measured 2 MB in → 18 MB out on 2 tasks).
      // Pinning the count keeps the explosion at full parallelism and
      // co-partitions both join sides in one exchange.
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("tok"))
    // Positional filter (the "PP" in PPJoin): a pair sharing a prefix
    // token at full-ordering ranks (ra, rb) can overlap by at most
    // min(sz_a − ra, sz_b − rb) + 1 — both orderings agree past the
    // shared token only on the common suffix — while J ≥ 19/20 needs
    // overlap ≥ 19·(sz_a+sz_b)/39. Purely a pruning upper bound, so the
    // result set is untouched; what it buys is SCALE SHAPE: when corpus
    // growth inflates a prefix gram's posting list (df grows linearly
    // with corpus size), the unfiltered candidate stage grows
    // quadratically — the 10×-replica stress measured ×201 posting
    // pairs for ×10 data — and the positional bound is what keeps the
    // deep-rank share of those pairs out of verification.
    val cand = prefix.toDF("tok", "id_a", "sz_a", "rn_a")
      .join(prefix.toDF("tok", "id_b", "sz_b", "rn_b"), "tok")
      .filter(col("id_a") < col("id_b") &&
        col("sz_a") * 19 <= col("sz_b") * 20 && col("sz_b") * 19 <= col("sz_a") * 20 &&
        (least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b")) + 1) * 39
          >= (col("sz_a") + col("sz_b")) * 19)
      .select(col("id_a"), col("id_b"))
      // numbered (id_a, id_b) repartition BEFORE the distinct: the
      // candidate relation is ~150 KB of id pairs, so AQE coalesces the
      // distinct's exchange to ONE task — and because both verify joins
      // broadcast `sets`, the whole per-candidate array_intersect chain
      // (the query's CPU-heaviest work) then runs single-threaded in
      // that same stage (r10 sweep: 870-1250 ms on 1 task; the r9
      // sweep's MB-rounded classifier had misfiled it as a leaf scan).
      // HashPartitioning(id_a, id_b) satisfies the distinct-aggregate's
      // distribution, so ONE pinned exchange carries dedup AND verify
      // at full parallelism.
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("id_a"), col("id_b"))
      .distinct()
    // sorted gram arrays → merge-walk intersect (see minhashAccuracy)
    graft.functions.IntersectCountSortedStr.register(spark)
    val sets = docs.select(col("doc_id"), array_sort(gramsExpr).as("ts"))
    cand
      .join(sets.toDF("id_a", "ts_a"), "id_a")
      .join(sets.toDF("id_b", "ts_b"), "id_b")
      .withColumn("n_inter",
        call_function("intersect_count_sorted_str", col("ts_a"), col("ts_b")))
      .withColumn("n_union",
        (size(col("ts_a")) + size(col("ts_b"))).cast("long") - col("n_inter"))
      .filter(col("n_inter") * 20 >= col("n_union") * 19)
      .withColumn("jaccard",
        col("n_inter").cast("double") / col("n_union").cast("double"))
      .select(col("id_a"), col("id_b"), col("n_inter"), col("n_union"),
        col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val ppjoinExactPairsSql: String =
    """WITH g AS (
      |  SELECT doc_id, list_distinct([substr(text, CAST(p AS INTEGER), 8)
      |    for p in range(1, greatest(n_chars - 7, 1) + 1)]) AS ts
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(ts) AS tok FROM g),
      |dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
      |          FROM tok GROUP BY tok),
      |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
      |          FROM tok GROUP BY doc_id),
      |prefix AS (
      |  SELECT tok, doc_id, sz FROM (
      |    SELECT t.tok, t.doc_id, s.sz,
      |      row_number() OVER (PARTITION BY t.doc_id
      |        ORDER BY d.df, t.tok) AS rn
      |    FROM tok t JOIN dfreq d USING (tok) JOIN sizes s USING (doc_id))
      |  WHERE rn <= sz - ((sz * 19 + 19) // 20) + 1),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM prefix a JOIN prefix b
      |    ON a.tok = b.tok AND a.doc_id < b.doc_id
      |   AND a.sz * 19 <= b.sz * 20 AND b.sz * 19 <= a.sz * 20),
      |v AS (
      |  SELECT id_a, id_b,
      |    CAST(len(list_intersect(sa.ts, sb.ts)) AS BIGINT) AS n_inter,
      |    CAST(len(sa.ts) + len(sb.ts) AS BIGINT)
      |      - CAST(len(list_intersect(sa.ts, sb.ts)) AS BIGINT) AS n_union
      |  FROM cand JOIN g sa ON sa.doc_id = id_a
      |            JOIN g sb ON sb.doc_id = id_b)
      |SELECT id_a, id_b, n_inter, n_union,
      |  CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard
      |FROM v
      |WHERE n_inter * 20 >= n_union * 19
      |ORDER BY id_a, id_b""".stripMargin

  /** MinHash threshold-sweep — the tuning curve behind choosing the
    * dedup cut-off: candidate pairs bucketed by estimated Jaccard (17
    * dyadic values for k = 16, exactly groupable) with the cumulative
    * pair count surviving each possible threshold. Reading this table IS
    * how the `>= 0.5`-style constant in a production dedup gets picked;
    * at 100 TB it prices a threshold change before anyone re-runs the
    * pipeline. The cumulative window orders the 17-row aggregated
    * domain (bounded, Aggregate below — the pinned global-window
    * doctrine), never the pair set.
    */
  def minhashThresholdSweep(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Dedup.minhashCandidates(Tables.documents(spark, sfDir), k = 16, bands = 2)
      .groupBy(col("est_jaccard"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_pairs_at_or_above",
        sum(col("n_pairs")).over(Window.orderBy(col("est_jaccard").desc)))
      .select(col("est_jaccard"), col("n_pairs"), col("n_pairs_at_or_above"))
      .orderBy(col("est_jaccard"))
  }

  val minhashThresholdSweepSql: String =
    """WITH toks AS (
      |  SELECT doc_id AS id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents
      |), sigs AS (
      |  SELECT id, [list_min([md5(s::VARCHAR || ':' || x) for x in t])
      |              for s in range(0, 16)] AS sig
      |  FROM toks
      |), bands AS (
      |  SELECT id, sig, b, md5(array_to_string(sig[b*8+1:b*8+8], '|')) AS bucket
      |  FROM sigs, range(0, 2) r(b)
      |), pairs AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
      |    len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) / 16.0
      |      AS est_jaccard
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.bucket = b.bucket AND a.id < b.id
      |), g AS (
      |  SELECT est_jaccard, CAST(count(*) AS BIGINT) AS n_pairs
      |  FROM pairs GROUP BY est_jaccard)
      |SELECT est_jaccard, n_pairs,
      |  CAST(sum(n_pairs) OVER (ORDER BY est_jaccard DESC) AS BIGINT)
      |    AS n_pairs_at_or_above
      |FROM g
      |ORDER BY est_jaccard""".stripMargin

  /** MinHash ACCURACY audit: for every LSH candidate pair, the
    * signature-estimated Jaccard next to the exact token-set Jaccard and
    * the absolute error — the third sketch-vs-truth audit (with
    * `ann_recall_audit` and the HLL/CMS rel_error columns) that tells
    * you whether k=16 signatures are tight enough before trusting the
    * dedup threshold. Exact sets are only computed FOR THE CANDIDATES
    * (bounded by the LSH join, never all pairs), via a per-pair
    * array_intersect on distinct-token arrays — at 100 TB this is the
    * standard "verify stage" cost of an LSH dedup pipeline.
    */
  def minhashAccuracy(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.IntersectCountSortedStr.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val cand = Dedup.minhashCandidates(docs, k = 16, bands = 2)
    // array_sort once per doc buys the allocation-free merge-walk
    // intersect per candidate pair below (2.37 M pairs at sf0.1 — the
    // per-pair hash-set build was the query's dominant task time);
    // sort order never reaches the output (size/intersect-count only).
    val sets = docs.select(col("doc_id"),
      array_sort(array_distinct(TextFunctions.tokens(col("text")))).as("ts"))
    cand
      .join(sets.toDF("id_a", "ts_a"), "id_a")
      .join(sets.toDF("id_b", "ts_b"), "id_b")
      .withColumn("inter",
        call_function("intersect_count_sorted_str", col("ts_a"), col("ts_b")))
      .withColumn("na", size(col("ts_a")).cast("long"))
      .withColumn("nb", size(col("ts_b")).cast("long"))
      .withColumn("exact_jaccard",
        col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")).cast("double"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("exact_jaccard")))
      .select(col("id_a"), col("id_b"), col("est_jaccard"),
        col("exact_jaccard"), col("abs_err"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val minhashAccuracySql: String =
    """WITH toks AS (
      |  SELECT doc_id AS id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents
      |), sigs AS (
      |  SELECT id, [list_min([md5(s::VARCHAR || ':' || x) for x in t])
      |              for s in range(0, 16)] AS sig
      |  FROM toks
      |), bands AS (
      |  SELECT id, sig, b, md5(array_to_string(sig[b*8+1:b*8+8], '|')) AS bucket
      |  FROM sigs, range(0, 2) r(b)
      |), cand AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
      |    len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) / 16.0
      |      AS est_jaccard
      |  FROM bands a JOIN bands b ON a.b = b.b AND a.bucket = b.bucket
      |    AND a.id < b.id
      |), sets AS (SELECT id, list_distinct(t) AS ts FROM toks)
      |SELECT id_a, id_b, est_jaccard,
      |  CAST(len(list_intersect(sa.ts, sb.ts)) AS DOUBLE)
      |    / CAST(len(sa.ts) + len(sb.ts) - len(list_intersect(sa.ts, sb.ts))
      |           AS DOUBLE) AS exact_jaccard,
      |  abs(est_jaccard
      |    - CAST(len(list_intersect(sa.ts, sb.ts)) AS DOUBLE)
      |      / CAST(len(sa.ts) + len(sb.ts) - len(list_intersect(sa.ts, sb.ts))
      |             AS DOUBLE)) AS abs_err
      |FROM cand
      |JOIN sets sa ON sa.id = cand.id_a
      |JOIN sets sb ON sb.id = cand.id_b
      |ORDER BY id_a, id_b""".stripMargin

  /** SimHash 60-bit signatures per document.
    *
    * Same r12 shape as [[textStats]]: sort the cheap scan FIRST
    * (`repartitionByRange + sortWithinPartitions` = total order), then
    * project — `select(simhash).orderBy` made RangePartitioner's
    * reservoir sample evaluate the per-token hash loop a second time
    * (two ≈1.5 s single-task stages warm), and the numbered range
    * exchange also parallelizes the one-row-group testdata scan.
    * Measured 3.3 → 0.5 s warm.
    */
  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .repartitionByRange(
        spark.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash"))

  val dedupSimhashSql: String =
    """WITH hashed AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(x), 1, 15))::BIGINT
      |     for x in regexp_split_to_array(trim(lower(text)), '\s+')] AS hs
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1
      |                                         THEN 1 ELSE -1 END
      |                                    for h in hs]) > 0
      |                      THEN (1::BIGINT << b) ELSE 0 END
      |                 for b in range(0, 60)]) AS BIGINT) AS simhash
      |FROM hashed
      |ORDER BY doc_id""".stripMargin

  /** SimHash hamming-ball near-dup pairs with Levenshtein verification —
    * the pairing step the SimHash signatures feed ([[Dedup.simhashPairs]]):
    * 12-bit prefix blocks, hamming ≤ 8, exact edit distance over the
    * 40-char text prefixes.
    */
  def dedupSimhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, sfDir))

  val dedupSimhashPairsSql: String =
    """WITH hashed AS (
      |  SELECT doc_id, substr(text, 1, 40) AS prefix,
      |    [('0x' || substr(md5(x), 1, 15))::BIGINT
      |     for x in regexp_split_to_array(trim(lower(text)), '\s+')] AS hs
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, prefix,
      |    CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1
      |                                         THEN 1 ELSE -1 END
      |                                    for h in hs]) > 0
      |                        THEN (1::BIGINT << b) ELSE 0 END
      |                   for b in range(0, 60)]) AS BIGINT) AS s
      |  FROM hashed)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming,
      |  CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS prefix_edit_distance
      |FROM sh a JOIN sh b
      |  ON (a.s >> 48) = (b.s >> 48) AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.s, b.s)) <= 8
      |ORDER BY id_a, id_b""".stripMargin

  /** Corpus-level MinHash sketch per language via the custom typed
    * [[graft.functions.MinHashAggregator]]: per-doc signatures merged by
    * element-wise min (partial-aggregate friendly), emitting one k=8
    * signature per lang. The first/last signature elements are gated; the
    * oracle recomputes them as plain mins over the token hash ring.
    */
  def dedupMinhashCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val merge = graft.functions.MinHashAggregator.minhashMerge(8)
    Tables.documents(spark, sfDir)
      .select(col("lang"), Dedup.minhashSignature(col("text"), 8).as("sig"))
      .groupBy(col("lang"))
      .agg(merge(col("sig")).as("merged"))
      .select(col("lang"),
        element_at(col("merged"), 1).as("sig0"),
        element_at(col("merged"), 8).as("sig7"))
      .orderBy(col("lang"))
  }

  val dedupMinhashCorpusSql: String =
    """SELECT lang,
      |  min(list_min([md5('0:' || x)
      |    for x in regexp_split_to_array(trim(lower(text)), '\s+')])) AS sig0,
      |  min(list_min([md5('7:' || x)
      |    for x in regexp_split_to_array(trim(lower(text)), '\s+')])) AS sig7
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Repetition filter (Gopher-rules style): per document, the duplicate
    * 3-gram fraction (1 − distinct/total grams) and the most-frequent
    * token's share; a document is kept when both fall under the usual
    * thresholds. The gram total is derived arithmetically
    * (greatest(n_tokens−2, 1)) so the gram array is referenced exactly
    * once — a second reference would re-run the interpreted gram
    * construction per use. One scan + one (doc, token) aggregation; all
    * fractions are single divisions of identical integers, rounded before
    * the threshold compare.
    */
  def repetitionFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    // materialized once: BOTH branches below (gram stats, token dominance)
    // read the stored token arrays instead of re-running the tokenization
    // (exchange reuse does not fire across the two branches of the join)
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .repartition(par)
      .stableCheckpoint()
    val gramStats = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      greatest(size(col("toks")) - 2, lit(1)).cast("long").as("n_grams"),
      size(array_distinct(Dedup.ngramSetOfTokens(col("toks"), 3)))
        .cast("long").as("n_distinct"))
    val topToken = toks
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_count"))
    gramStats.join(topToken, "doc_id")
      .select(col("doc_id"),
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_grams").cast("double"), 4).as("dup3_frac"),
        round(col("top_count").cast("double") /
          col("n_tokens").cast("double"), 4).as("top_token_frac"))
      .withColumn("keep",
        (col("dup3_frac") <= 0.3 && col("top_token_frac") <= 0.2)
          .cast("long"))
      .orderBy(col("doc_id"))
  }

  val repetitionFilterSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
      |    CAST(greatest(len(t) - 2, 1) AS BIGINT) AS n_grams,
      |    CAST(len(list_distinct([array_to_string(t[i:i+2], ' ')
      |      for i in range(1, greatest(len(t) - 2, 1) + 1)])) AS BIGINT) AS n_distinct
      |  FROM toks),
      |tt AS (
      |  SELECT doc_id, max(c) AS top_count FROM (
      |    SELECT doc_id, tok, count(*) AS c
      |    FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      |    GROUP BY doc_id, tok)
      |  GROUP BY doc_id)
      |SELECT g.doc_id,
      |  round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) AS dup3_frac,
      |  round(CAST(top_count AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS top_token_frac,
      |  CAST(CASE WHEN round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) <= 0.3
      |         AND round(CAST(top_count AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) <= 0.2
      |       THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM g JOIN tt ON g.doc_id = tt.doc_id
      |ORDER BY g.doc_id""".stripMargin

  /** Benchmark decontamination (the GPT-3-style n-gram overlap check):
    * flag every training document sharing at least one 5-gram with the
    * eval set, with the count of distinct shared grams. The eval set here
    * is the deterministic doc_id % 97 == 0 slice (standing in for a held-
    * out benchmark); its gram set is small by construction, so the
    * broadcast semi-style join is the CORRECT scale shape — training
    * postings stream past an eval-gram set that fits everywhere. Grams
    * join on 64-bit hashes Spark-side (long equality); the oracle joins
    * the raw strings — identical counts modulo ~1e-9 collisions.
    */
  def decontaminateNgram(spark: SparkSession, sfDir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val grams = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .repartition(par)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          Dedup.ngramSetOfTokens(col("toks"), 5), g => xxhash64(g)))).as("g"))
    val evalGrams = grams.filter(col("doc_id") % 97 === 0)
      .select(col("g")).distinct()
    grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalGrams), "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared_grams"))
      .orderBy(col("doc_id"))
  }

  val decontaminateNgramSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([array_to_string(t[i:i+4], ' ')
      |      for i in range(1, greatest(len(t) - 4, 1) + 1)])) AS g
      |  FROM toks),
      |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
      |SELECT doc_id, count(DISTINCT g) AS n_shared_grams
      |FROM grams JOIN ev USING (g)
      |WHERE doc_id % 97 <> 0
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** PII scrubbing: redact emails and phone-like digit runs, emitting the
    * per-document redaction counts and the scrubbed-text fingerprint.
    * Patterns are lookaround-free (identical under Java regex and RE2) and
    * the whole pass is a map-only projection — one scan, no shuffle until
    * the final sort.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+?[0-9][0-9()\\s-]{6,}[0-9]"
    // Sort below the scrub (r12 double-evaluation class): four regex
    // passes + an md5 over the full text must not sit under a global
    // sort's range sample. orderedBelow = total order by construction.
    QueryShapes.orderedBelow(Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(phoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(regexp_replace(
          regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).as("scrubbed_fingerprint"))
  }

  val piiScrubSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '\+?[0-9][0-9()\s-]{6,}[0-9]')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(
      |        regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        '\+?[0-9][0-9()\s-]{6,}[0-9]', '<PHONE>', 'g')) AS scrubbed_fingerprint
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Exact 3-gram Jaccard near-dup pairs, blocked by lang. */
  def dedupNgramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir),
      blockCols = Seq("lang"), n = 3, threshold = 0.2)
      .orderBy(col("lang"), col("id_a"), col("id_b"))

  /** Duplicate clusters: connected components over the exact n-gram
    * Jaccard near-dup graph — each document in any above-threshold pair,
    * labeled with its cluster representative (min doc id reachable through
    * the pair graph). The oracle recomputes the same pairs and takes the
    * transitive closure with a recursive CTE.
    */
  def dedupComponents(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir),
      blockCols = Seq("lang"), n = 3, threshold = 0.2)
    Dedup.connectedComponents(pairs)
      .select(col("src").as("doc_id"), col("lbl").as("component"))
      .orderBy(col("doc_id"))
  }

  /** Shared oracle preamble: exact 3-gram Jaccard similar pairs per lang
    * via an inverted-index candidate join rather than all-pairs. A pair
    * with jaccard > 0 must share at least one gram, so joining the
    * exploded (lang, id, gram) postings on the gram and COUNTING matches
    * yields the exact intersection size for exactly the candidate pairs;
    * because each doc's gram list is list_distinct'ed,
    * |union| = |a| + |b| - isect. At sf0.1 this is 326k posting matches
    * (max gram df = 14) instead of 3.3M all-pairs each paying an O(n*m)
    * list_intersect — the all-pairs form made DuckDB exceed the replay's
    * 150 s budget; this form runs in single-digit seconds. Defines CTEs
    * grams / ex / inter / sizes / simpairs(lang, id_a, id_b, jaccard_sim).
    */
  val gramSimPairsSqlPreamble: String =
    """grams AS (
      |  SELECT lang, doc_id AS id,
      |    list_distinct([array_to_string(t[i:i+2], ' ')
      |      for i in range(1, greatest(len(t) - 2, 1) + 1)]) AS g
      |  FROM (SELECT lang, doc_id,
      |          regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |        FROM documents)),
      |ex AS (SELECT lang, id, unnest(g) AS gram FROM grams),
      |inter AS (
      |  SELECT a.lang AS lang, a.id AS id_a, b.id AS id_b, count(*) AS isect
      |  FROM ex a JOIN ex b ON a.lang = b.lang AND a.gram = b.gram AND a.id < b.id
      |  GROUP BY 1, 2, 3),
      |sizes AS (SELECT lang, id, len(g) AS sz FROM grams),
      |simpairs AS (
      |  SELECT i.lang AS lang, i.id_a, i.id_b,
      |    round(i.isect / CAST(sa.sz + sb.sz - i.isect AS DOUBLE), 4) AS jaccard_sim
      |  FROM inter i
      |  JOIN sizes sa ON sa.lang = i.lang AND sa.id = i.id_a
      |  JOIN sizes sb ON sb.lang = i.lang AND sb.id = i.id_b)""".stripMargin

  val dedupComponentsSql: String =
    "WITH RECURSIVE " + gramSimPairsSqlPreamble + """,
      |pairs AS (SELECT id_a, id_b FROM simpairs WHERE jaccard_sim > 0.2),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(src, lbl) AS (
      |  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      |  UNION
      |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src)
      |SELECT src AS doc_id, min(lbl) AS component
      |FROM reach
      |GROUP BY src
      |ORDER BY doc_id""".stripMargin

  val dedupNgramJaccardSql: String =
    "WITH " + gramSimPairsSqlPreamble + """
      |SELECT lang, id_a, id_b, jaccard_sim
      |FROM simpairs WHERE jaccard_sim > 0.2
      |ORDER BY lang, id_a, id_b""".stripMargin
}
