package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-5 corpus additions, batch 3: asymmetric containment pairs
  * (quote / subset detection), per-document novelty against a reference
  * split, an embedding-norm audit over the vector table, and a
  * readability proxy — the remaining text-pipeline primitives a
  * training-data curator runs that the dedup/quality families don't
  * already cover.
  *
  * Exactness discipline as elsewhere: integer counts, DECIMAL widening
  * where a 100 TB sum wraps a long, doubles only in final expressions
  * with identical association, and double CONSTANTS built from integer
  * ratios (`CAST(39 AS DOUBLE)/CAST(100 AS DOUBLE)`) so neither engine's
  * decimal-literal typing can perturb a bit.
  */
object CorpusSixth {

  /** Character 8-gram set of a document — the same shingle alphabet the
    * ppjoin / suffix-span queries use (ref: consumer-side dedup needs no
    * tokenizer agreement, just bytes).
    */
  private val gramsExpr = expr(
    "array_distinct(transform(sequence(1, greatest(n_chars - 7, 1))," +
      " p -> substring(text, p, 8)))")

  // ------------------------------------------------------- containment

  /** Asymmetric containment pairs: document pairs where at least half of
    * the SMALLER document's 8-grams appear in the larger one —
    * `C(small→large) = |A∩B| / |A|` — the quote-/subset-detection
    * primitive that symmetric Jaccard misses (a paragraph quoted inside
    * a long page has tiny Jaccard but containment ≈ 1).
    *
    * Candidates must share at least TWO rare grams (posting df ≤ 20) —
    * the inverted-index quadratic guard of `link_predict_users`/
    * `knn_graph_grams` (pair generation costs Σ_{df≤20} df² ≤
    * 20·|postings|, never all-pairs) plus a ≥2-votes cut that drops the
    * single-chance-gram pair noise dominating the candidate set (4× at
    * sf0.1). A mostly-boilerplate small doc whose overlap rides on
    * high-df grams escapes candidacy — the documented recall trade of
    * every pruned index here, mirrored exactly in the oracle (a
    * measured 264-of-294 recall vs the share-any-rare-gram rule at
    * sf0.1, bought back only by near-quadratic candidate sets in this
    * corpus's compressed gram alphabet). Verification
    * intersects per-document gram-HASH arrays (sorted `xxhash64` ids):
    * shipping 8-byte longs instead of 8-char strings to every candidate
    * row cuts the verify shuffle ~4× and the fused
    * [[graft.functions.IntersectCountSorted]] merge walk turns the
    * per-pair intersect into primitive compares (measured 19 → 6.7 s at
    * sf0.1 together with the 2-vote cut). The oracle intersects
    * the exact STRING sets, so the gate also audits the hashing: a
    * collision would have to land between two grams of one candidate
    * pair (≤ 1100 grams → P < 2⁻⁴⁴ per pair, vanishing at any corpus
    * size since only within-pair grams can collide observably) and
    * would fail the hash compare loudly. The containment filter is the
    * integer compare `2·inter ≥ sz_small`; the one double is the final
    * ratio.
    */
  def containmentPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // explicit numbered repartition: documents arrives as ONE parquet
    // row group, and the per-row gram hashing below is the query's CPU
    // bill — without this the whole transform runs on a single task
    // (AQE can't help: it sizes by bytes and never splits a scan)
    val docs = Tables.documents(spark, sfDir)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("doc_id"))
    val tok = docs.select(col("doc_id"), explode(gramsExpr).as("tok"))
    val rare = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20).select(col("tok"))
    val posting = tok.join(rare, "tok")
    val cand = posting.toDF("tok", "id_a")
      .join(posting.toDF("tok", "id_b"), "tok")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_rare"))
      .filter(col("n_shared_rare") >= 2)
      .select(col("id_a"), col("id_b"))
    val hashSetExpr = expr(
      "array_sort(array_distinct(transform(" +
        "sequence(1, greatest(n_chars - 7, 1))," +
        " p -> xxhash64(substring(text, p, 8)))))")
    val sets = docs.select(col("doc_id"), hashSetExpr.as("ts"))
    graft.functions.IntersectCountSorted.register(spark)
    cand
      .join(sets.toDF("id_a", "ts_a"), "id_a")
      .join(sets.toDF("id_b", "ts_b"), "id_b")
      .withColumn("n_inter",
        call_function("intersect_count_sorted", col("ts_a"), col("ts_b")))
      .withColumn("sz_a", size(col("ts_a")).cast("long"))
      .withColumn("sz_b", size(col("ts_b")).cast("long"))
      // deterministic small/large orientation: by size, then by id
      .withColumn("small_first",
        col("sz_a") < col("sz_b") ||
          (col("sz_a") === col("sz_b") && col("id_a") < col("id_b")))
      .select(
        when(col("small_first"), col("id_a")).otherwise(col("id_b")).as("id_small"),
        when(col("small_first"), col("id_b")).otherwise(col("id_a")).as("id_large"),
        col("n_inter"),
        when(col("small_first"), col("sz_a")).otherwise(col("sz_b")).as("sz_small"),
        when(col("small_first"), col("sz_b")).otherwise(col("sz_a")).as("sz_large"))
      .filter(col("n_inter") * 2 >= col("sz_small"))
      .withColumn("containment",
        col("n_inter").cast("double") / col("sz_small").cast("double"))
      .orderBy(col("id_small"), col("id_large"))
  }

  val containmentPairsSql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_distinct([text[p:p+7]
      |      for p in range(1, greatest(n_chars - 7, 1) + 1)]) AS ts
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(ts) AS tok FROM g),
      |rare AS (SELECT tok FROM tok GROUP BY tok HAVING count(*) <= 20),
      |posting AS (SELECT doc_id, tok FROM tok JOIN rare USING (tok)),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM posting a JOIN posting b
      |    ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |  HAVING count(*) >= 2),
      |v AS (
      |  SELECT id_a, id_b,
      |    CAST(len(list_intersect(ga.ts, gb.ts)) AS BIGINT) AS n_inter,
      |    CAST(len(ga.ts) AS BIGINT) AS sz_a,
      |    CAST(len(gb.ts) AS BIGINT) AS sz_b
      |  FROM cand
      |  JOIN g ga ON ga.doc_id = id_a
      |  JOIN g gb ON gb.doc_id = id_b),
      |o AS (
      |  SELECT
      |    CASE WHEN sz_a < sz_b OR (sz_a = sz_b AND id_a < id_b)
      |      THEN id_a ELSE id_b END AS id_small,
      |    CASE WHEN sz_a < sz_b OR (sz_a = sz_b AND id_a < id_b)
      |      THEN id_b ELSE id_a END AS id_large,
      |    n_inter,
      |    least(sz_a, sz_b) AS sz_small,
      |    greatest(sz_a, sz_b) AS sz_large
      |  FROM v)
      |SELECT id_small, id_large, n_inter, sz_small, sz_large,
      |  CAST(n_inter AS DOUBLE) / CAST(sz_small AS DOUBLE) AS containment
      |FROM o
      |WHERE n_inter * 2 >= sz_small
      |ORDER BY id_small, id_large""".stripMargin

  // ---------------------------------------------------------- novelty

  /** Per-document novelty against a reference split: for every
    * ODD-doc_id document, the share of its 8-grams that never occur in
    * the EVEN-doc_id half of the corpus — the incremental-crawl "how
    * much of this batch is genuinely new text" gauge (novelty ≈ 0 means
    * the reference already covers it; the batch-side twin of
    * `decontaminate_ngram`'s eval protection).
    *
    * Scale shape: the reference gram set stays DISTRIBUTED — the probe
    * is a gram-keyed LEFT ANTI join (shuffle hash on the gram), never a
    * broadcast of the reference vocabulary (which is corpus-sized at
    * 100 TB). Counts are exact integers; the one double is
    * `n_novel / n_grams`.
    */
  def noveltyVsReference(spark: SparkSession, sfDir: String): DataFrame = {
    // NUMBERED repartition: spread the 8-gram explosion off the
    // single-partition documents scan
    val docs = Tables.documents(spark, sfDir)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("doc_id"))
    val grams = docs.select(col("doc_id"), explode(gramsExpr).as("g"))
    val ref = grams.filter(col("doc_id") % 2 === 0).select(col("g")).distinct()
    val tgt = grams.filter(col("doc_id") % 2 === 1)
    val novel = tgt.join(ref, Seq("g"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    tgt.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams").cast("double"))
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  val noveltyVsReferenceSql: String =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct([text[p:p+7]
      |    for p in range(1, greatest(n_chars - 7, 1) + 1)])) AS g
      |  FROM documents),
      |ref AS (SELECT DISTINCT g FROM g WHERE doc_id % 2 = 0),
      |tgt AS (SELECT doc_id, g FROM g WHERE doc_id % 2 = 1),
      |tot AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
      |  FROM tgt GROUP BY doc_id),
      |nov AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel
      |  FROM tgt ANTI JOIN ref USING (g)
      |  GROUP BY doc_id)
      |SELECT t.doc_id, t.n_grams,
      |  coalesce(n.n_novel, 0) AS n_novel,
      |  CAST(coalesce(n.n_novel, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
      |    AS novelty
      |FROM tot t LEFT JOIN nov n ON t.doc_id = n.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ------------------------------------------------- embedding audit

  /** Embedding-norm audit per label: vector count, zero-vector count and
    * mean squared L2 norm over the embeddings table — the "did a batch
    * of degenerate vectors slip into the index" check run before any ANN
    * build.
    *
    * Float components quantize to EXACT integers
    * (`round(double(x)·1000)` — float→double is exact, so both engines
    * round identical values) and the per-vector Σ-of-squares folds
    * inside the ARRAY via a higher-order `aggregate`/`list_sum` — no
    * explode, no shuffle of 64× component rows; the per-label sum widens
    * to DECIMAL (10¹²  vectors × ~10⁷ per-vector norm passes a long at
    * 100 TB) and the emitted column narrows back to BIGINT per the repo
    * gate convention (fits int64 at every gate sf). The one double is
    * the final mean.
    */
  def embeddingNormAudit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"),
        expr("aggregate(transform(embedding," +
          " x -> cast(round(cast(x as double) * 1000) as bigint)" +
          " * cast(round(cast(x as double) * 1000) as bigint))," +
          " cast(0 as bigint), (acc, v) -> acc + v)").as("norm2q"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("norm2q") === 0, 1L).otherwise(0L)).as("n_zero"),
        sum(expr("cast(norm2q as decimal(19,0))")).as("sum_norm2q"))
      .select(col("label"), col("n_vecs"), col("n_zero"),
        col("sum_norm2q").cast("long").as("sum_norm2q"),
        (col("sum_norm2q").cast("double") / col("n_vecs").cast("double"))
          .as("mean_norm2q"))
      .orderBy(col("label"))

  val embeddingNormAuditSql: String =
    """WITH q AS (
      |  SELECT label,
      |    list_sum(list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
      |        * CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS norm2q
      |  FROM embeddings)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(sum(CASE WHEN norm2q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |  CAST(CAST(sum(norm2q) AS HUGEINT) AS BIGINT) AS sum_norm2q,
      |  CAST(sum(norm2q) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_norm2q
      |FROM q
      |GROUP BY label
      |ORDER BY label""".stripMargin

  // ----------------------------------------------------- readability

  /** Flesch–Kincaid-style readability proxy per source: grade ≈
    * `0.39·(words/sentences) + 11.8·(syllables/words) − 15.59`, with
    * sentences counted as `[.!?]+` runs (min 1) and syllables as vowel
    * runs `[aeiouy]+` — the standard heuristic with regex-countable
    * surrogates (both regexes are in the RE2 ∩ Java-regex common
    * subset, so the two engines count identically).
    *
    * All three corpus totals are exact integer sums; the grade is one
    * fixed-association double expression whose CONSTANTS are integer
    * ratios (`39/100`, `59/5`, `1559/100` — each a single IEEE divide,
    * bit-identical cross-engine, immune to decimal-literal typing).
    */
  def readabilityProxy(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"),
        expr("size(split(trim(text), '\\\\s+'))").cast("long").as("w"),
        expr("greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1)")
          .cast("long").as("s"),
        expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
          .cast("long").as("y"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("words"),
        sum(col("s")).as("sentences"),
        sum(col("y")).as("syllables"))
      .withColumn("fk_grade",
        expr("(cast(39 as double) / cast(100 as double))" +
          " * (cast(words as double) / cast(sentences as double))" +
          " + (cast(59 as double) / cast(5 as double))" +
          " * (cast(syllables as double) / cast(words as double))" +
          " - (cast(1559 as double) / cast(100 as double))"))
      .orderBy(col("source"))

  val readabilityProxySql: String =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w,
      |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
      |      AS s,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
      |      AS y
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(w) AS BIGINT) AS words,
      |  CAST(sum(s) AS BIGINT) AS sentences,
      |  CAST(sum(y) AS BIGINT) AS syllables,
      |  (CAST(39 AS DOUBLE) / CAST(100 AS DOUBLE))
      |    * (CAST(sum(w) AS DOUBLE) / CAST(sum(s) AS DOUBLE))
      |  + (CAST(59 AS DOUBLE) / CAST(5 AS DOUBLE))
      |    * (CAST(sum(y) AS DOUBLE) / CAST(sum(w) AS DOUBLE))
      |  - (CAST(1559 AS DOUBLE) / CAST(100 AS DOUBLE)) AS fk_grade
      |FROM d
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // -------------------------------------------------- tokenizer fertility

  /** Tokenizer fertility (subword pieces per whitespace word) by
    * language — the "how expensive is this language for my tokenizer"
    * audit run before fixing a per-language sampling mix. Pieces come
    * from the BPE-ish pre-tokenization regex (letter runs / digit runs /
    * single punctuation — the classic GPT-2-style split classes); no
    * learned merges are applied, so the count is deterministic and
    * identical cross-engine. Map-only scan → per-language integer sums;
    * the ONE double expression is the final pieces/words ratio.
    */
  def tokenizerFertility(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("lang"),
        graft.text.TextFunctions.tokenCount(col("text")).as("words"),
        graft.text.TextFunctions.subwordCount(col("text")).as("pieces"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("words")).as("total_words"),
        sum(col("pieces")).as("total_pieces"))
      .select(col("lang"), col("n_docs"), col("total_words"),
        col("total_pieces"),
        (col("total_pieces").cast("double") /
          col("total_words").cast("double")).as("fertility"))
      .orderBy(col("lang"))
  }

  val tokenizerFertilitySql: String =
    """WITH d AS (
      |  SELECT lang,
      |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS words,
      |    len(regexp_extract_all(lower(trim(text)),
      |      '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS pieces
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(words) AS BIGINT) AS total_words,
      |  CAST(sum(pieces) AS BIGINT) AS total_pieces,
      |  CAST(sum(pieces) AS DOUBLE) / CAST(sum(words) AS DOUBLE)
      |    AS fertility
      |FROM d
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // --------------------------------------------------- curriculum buckets

  /** Curriculum staging: documents bucketed into 10 quality stages
    * (fixed-width score bins, NOT quantiles — a global quantile over
    * |docs| rows is the single-partition sort this repo designs out;
    * fixed bins are map-only and the stage of a doc never shifts when
    * the corpus grows). Stage = ⌊quality·10⌋ clamped to 9, using the
    * SAME composite quality score `quality_filter_pipeline` gates, so
    * the two queries stay mutually consistent. Per-stage min/max of the
    * score are order-independent (unlike a double sum) and therefore
    * hash-safe; avg_chars is the one division.
    */
  def curriculumBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("n_chars"),
        graft.text.TextFunctions.qualityScore(col("text")).as("q"))
      .select(col("n_chars"),
        least(floor(col("q") * 10).cast("long"), lit(9L)).as("stage"),
        col("q"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        min(col("q")).as("min_quality"), max(col("q")).as("max_quality"))
      .select(col("stage"), col("n_docs"), col("total_chars"),
        (col("total_chars").cast("double") / col("n_docs").cast("double"))
          .as("avg_chars"),
        col("min_quality"), col("max_quality"))
      .orderBy(col("stage"))
  }

  val curriculumBucketsSql: String = {
    val en = graft.text.TextFunctions.langMarkers("en")
      .map(s => s"'$s'").mkString(", ")
    s"""WITH scored AS (
       |  SELECT n_chars,
       |    round(0.5 * least(
       |        len(regexp_split_to_array(trim(lower(text)), '\\s+')) / 50.0,
       |        1.0)
       |      + 0.3 * (len(list_filter(
       |          regexp_split_to_array(trim(lower(text)), '\\s+'),
       |          x -> list_contains([$en], x)))
       |        / CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+'))
       |            AS DOUBLE))
       |      + 0.2 * (length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
       |        / CAST(length(text) AS DOUBLE)), 4) AS q
       |  FROM documents)
       |SELECT LEAST(CAST(floor(q * 10) AS BIGINT), 9) AS stage,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS avg_chars,
       |  min(q) AS min_quality, max(q) AS max_quality
       |FROM scored
       |GROUP BY 1
       |ORDER BY stage""".stripMargin
  }

  // --------------------------------------------------- vocab growth curve

  /** Marginal vocabulary-growth curve: ingest sources in id order and
    * report, per source, how many of its distinct word trigrams no
    * EARLIER source contains — the diminishing-returns measurement
    * behind "is the next crawl batch still adding anything?". No
    * iteration needed: a trigram's introducing source is simply
    * min(source_idx) over its occurrences, so the whole curve is one
    * gram-keyed aggregation (the vocabulary shuffle every corpus
    * statistic in this repo pays) plus a per-source count — novelty
    * ratio is the one final division.
    */
  def vocabGrowthCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = Tables.documents(spark, sfDir)
      .select(expr("try_cast(substring(source, 4) as int)").as("src_idx"),
        graft.text.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("src_idx"),
        explode(graft.text.Dedup.ngramSetOfTokens(col("toks"), 3)).as("g"))
      .distinct() // per-source distinct trigram sets
    val totals = grams.groupBy(col("src_idx"))
      .agg(count(lit(1)).as("total_grams"))
    val news = grams.groupBy(col("g"))
      .agg(min(col("src_idx")).as("src_idx"))
      .groupBy(col("src_idx")).agg(count(lit(1)).as("new_grams"))
    totals.join(news, Seq("src_idx"), "left")
      .withColumn("new_grams", coalesce(col("new_grams"), lit(0L)))
      .select(col("src_idx").cast("long").as("src_idx"), col("total_grams"),
        col("new_grams"),
        (col("new_grams").cast("double") / col("total_grams").cast("double"))
          .as("novelty_ratio"))
      .orderBy(col("src_idx"))
  }

  val vocabGrowthCurveSql: String =
    """WITH toks AS (
      |  SELECT try_cast(substr(source, 4, 9) AS INTEGER) AS src_idx,
      |    regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT src_idx,
      |    unnest(list_distinct([array_to_string(t[i:i+2], ' ')
      |      for i in range(1, greatest(len(t) - 2, 1) + 1)])) AS g
      |  FROM toks),
      |totals AS (
      |  SELECT src_idx, CAST(count(*) AS BIGINT) AS total_grams
      |  FROM grams GROUP BY src_idx),
      |intro AS (
      |  SELECT g, min(src_idx) AS src_idx FROM grams GROUP BY g),
      |news AS (
      |  SELECT src_idx, CAST(count(*) AS BIGINT) AS new_grams
      |  FROM intro GROUP BY src_idx)
      |SELECT CAST(t.src_idx AS BIGINT) AS src_idx, t.total_grams,
      |  coalesce(n.new_grams, 0) AS new_grams,
      |  CAST(coalesce(n.new_grams, 0) AS DOUBLE)
      |    / CAST(t.total_grams AS DOUBLE) AS novelty_ratio
      |FROM totals t LEFT JOIN news n ON t.src_idx = n.src_idx
      |ORDER BY src_idx""".stripMargin
}
