package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TopKAggregator

/** Fifth-wave corpus/pipeline operators: rational-arithmetic lexical
  * diversity scoring, exact-substring duplicate spans (the suffix-array
  * dedup shape re-expressed as an inverted gram index), and a
  * deterministic bounded per-key reservoir sample.
  *
  * Determinism contract (same as the rest of the corpus surface): all
  * scores stay in integer/rational arithmetic until one final division
  * of identical operands, hashes are md5-derived, so the DuckDB oracle
  * reproduces every row bit-for-bit.
  */
object CorpusFifth {

  /** Per-document lexical-diversity metrics WITHOUT transcendentals:
    * type-token ratio and the token-collision probability Σc²/n² (the
    * chance two uniformly drawn tokens are equal — Simpson index; the
    * rational-arithmetic stand-in for entropy, which would hinge on
    * cross-engine log() ulps). Flags the repetitive tail. Map-side
    * explode + one (doc_id, token) shuffle + one doc_id shuffle —
    * both keyed on the doc, so at 100 TB this is two well-partitioned
    * aggregations with map-side combine, no global state.
    */
  def lexicalDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sum_sq"))
      .withColumn("ttr",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .withColumn("collision_p",
        col("sum_sq").cast("double")
          / (col("n_tokens") * col("n_tokens")).cast("double"))
      .withColumn("repetitive", col("collision_p") > expr("cast(0.08 as double)"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("sum_sq"),
        col("ttr"), col("collision_p"), col("repetitive"))
      .orderBy(col("doc_id"))
  }

  val lexicalDiversitySql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |tc AS (
      |  SELECT doc_id, t, count(*) AS c FROM tok WHERE t <> '' GROUP BY 1, 2),
      |d AS (
      |  SELECT doc_id,
      |    CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(c * c) AS BIGINT) AS sum_sq
      |  FROM tc GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_types, sum_sq,
      |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
      |  CAST(sum_sq AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE)
      |    AS collision_p,
      |  CAST(sum_sq AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE)
      |    > CAST(0.08 AS DOUBLE) AS repetitive
      |FROM d
      |ORDER BY doc_id""".stripMargin

  /** Character-level gram length for [[suffixDupSpans]]. */
  private val G = 30

  /** Exact-substring duplicate spans: for every document, the fraction of
    * character positions whose G=30-char gram appears verbatim in at
    * least one OTHER document — the distributed re-expression of
    * suffix-array training-data dedup (find verbatim copied spans, not
    * just near-identical whole docs). Never pairs documents: positions
    * explode map-side, the inverted index shuffles on the gram, and a
    * gram's doc-spread (count distinct doc) marks its positions. At
    * 100 TB the shuffle carries Σ|doc| posting rows — the same
    * asymptotics as tokenizing the corpus — versus the n² of any
    * pairwise approach.
    *
    * The posting KEY is not the raw 30-char gram but its md5 split into
    * two 60-bit limbs (r14: the raw-string key was the engine's last
    * Θ(chars × gram-width) scratch hazard — >52 GB shuffle scratch at
    * ×1000, disk-exhausting on one box; two longs are 16 fixed bytes vs
    * ~38 for the string, and the window sort compares longs instead of
    * 30-char UTF-8). 120 bits is collision-safe at corpus scale: even
    * 10¹² distinct grams give expected collisions n²/2¹²¹ ≈ 4·10⁻¹³;
    * a single 60-bit limb would already expect collisions at ~10⁹ grams,
    * hence two. The oracle groups by the SAME two limbs, so the gate
    * hash proves the rewrite transparent rather than assuming it.
    */
  def suffixDupSpans(spark: SparkSession, sfDir: String): DataFrame = {
    // Numbered repartition before the ~270× position fan-out: the
    // one-row-group testdata scan otherwise runs the whole explode +
    // substring on ONE task (r12 warm profile: 2.0 s single-task stage
    // writing 24 MB). Shuffling the pre-explosion docs costs ~1.5 MB —
    // two orders less than the exploded postings that shuffle next —
    // so the exchange pays for itself at any scale where the input
    // arrives under-split; on a real cluster the scan splits naturally
    // and this is a no-op-sized safety net. Measured 3.2 → 1.0 s warm.
    val pos = Tables.documents(spark, sfDir)
      .filter(col("n_chars") >= G)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), col("n_chars") - (G - 1))).as("p"))
      // one md5 per position (hx projected once, split twice), gram
      // string never leaves the map stage
      .withColumn("hx",
        md5(expr(s"substring(text, cast(p as int), $G)").cast("binary")))
      .select(col("doc_id"),
        conv(substring(col("hx"), 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(col("hx"), 17, 15), 16, 10).cast("long").as("h2"))
    // "gram appears in >= 2 distinct docs" ⟺ min(doc_id) ≠ max(doc_id)
    // over the gram's postings — two invertible window aggregates on ONE
    // gram-keyed shuffle, instead of a countDistinct + join-back (which
    // shuffles the posting list twice). Same trick an inverted index
    // uses to tag singleton terms.
    val wg = Window.partitionBy(col("h1"), col("h2"))
    pos
      .withColumn("dup",
        min(col("doc_id")).over(wg) =!= max(col("doc_id")).over(wg))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pos"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_pos"))
      .withColumn("dup_frac",
        col("n_dup_pos").cast("double") / col("n_pos").cast("double"))
      .select(col("doc_id"), col("n_pos"), col("n_dup_pos"), col("dup_frac"))
      .orderBy(col("doc_id"))
  }

  val suffixDupSpansSql: String =
    s"""WITH pos0 AS (
      |  SELECT doc_id, text, unnest(range(1, n_chars - ${G - 2})) AS p
      |  FROM documents WHERE n_chars >= $G),
      |hp AS (
      |  SELECT doc_id, md5(substr(text, CAST(p AS INTEGER), $G)) AS hx
      |  FROM pos0),
      |pos AS (
      |  SELECT doc_id,
      |    ('0x' || substr(hx, 1, 15))::BIGINT AS h1,
      |    ('0x' || substr(hx, 17, 15))::BIGINT AS h2
      |  FROM hp),
      |spread AS (
      |  SELECT h1, h2, count(DISTINCT doc_id) AS nd
      |  FROM pos GROUP BY h1, h2)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_pos,
      |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_pos,
      |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS dup_frac
      |FROM pos JOIN spread USING (h1, h2)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Composite C4-style corpus filter audit: every hygiene signal in ONE
    * scan-and-aggregate pass — length, language, token-collision
    * repetition ([[lexicalDiversity]] semantics), dominant-token share —
    * each as a flag column plus the first-failing `drop_reason` in a
    * fixed priority order (the audit trail a data pipeline keeps so
    * "why did my doc disappear?" is answerable). All thresholds are
    * rational-arithmetic comparisons of exact integers, so the gate
    * hashes every verdict. One (doc_id, token) shuffle + one doc_id
    * aggregation — the same two-shuffle shape as lexicalDiversity, with
    * the verdict logic map-side after it.
    */
  def corpusFilterReport(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), col("lang"), col("text"))
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val stats = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        max(col("c")).as("max_c"),
        sum(col("c") * col("c")).as("sum_sq"))
    docs.drop("text").join(stats, "doc_id")
      .withColumn("collision_p",
        col("sum_sq").cast("double")
          / (col("n_tokens") * col("n_tokens")).cast("double"))
      .withColumn("max_share",
        col("max_c").cast("double") / col("n_tokens").cast("double"))
      .withColumn("f_too_short", col("n_chars") < 120)
      .withColumn("f_non_en", col("lang") =!= "en")
      .withColumn("f_repetitive", col("collision_p") > expr("cast(0.08 as double)"))
      .withColumn("f_dominated", col("max_share") > expr("cast(0.15 as double)"))
      .withColumn("keep",
        !col("f_too_short") && !col("f_non_en") && !col("f_repetitive")
          && !col("f_dominated"))
      .withColumn("drop_reason",
        when(col("f_too_short"), "too_short")
          .when(col("f_non_en"), "non_en")
          .when(col("f_repetitive"), "repetitive")
          .when(col("f_dominated"), "dominated")
          .otherwise(lit(null).cast("string")))
      .select(col("doc_id"), col("n_chars"), col("lang"), col("n_tokens"),
        col("collision_p"), col("max_share"), col("f_too_short"),
        col("f_non_en"), col("f_repetitive"), col("f_dominated"),
        col("keep"), col("drop_reason"))
      .orderBy(col("doc_id"))
  }

  val corpusFilterReportSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |tc AS (
      |  SELECT doc_id, t, count(*) AS c FROM tok WHERE t <> '' GROUP BY 1, 2),
      |stats AS (
      |  SELECT doc_id,
      |    CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(max(c) AS BIGINT) AS max_c,
      |    CAST(sum(c * c) AS BIGINT) AS sum_sq
      |  FROM tc GROUP BY doc_id),
      |r AS (
      |  SELECT d.doc_id, d.n_chars, d.lang, s.n_tokens,
      |    CAST(s.sum_sq AS DOUBLE) / CAST(s.n_tokens * s.n_tokens AS DOUBLE)
      |      AS collision_p,
      |    CAST(s.max_c AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) AS max_share,
      |    d.n_chars < 120 AS f_too_short,
      |    d.lang <> 'en' AS f_non_en,
      |    CAST(s.sum_sq AS DOUBLE) / CAST(s.n_tokens * s.n_tokens AS DOUBLE)
      |      > CAST(0.08 AS DOUBLE) AS f_repetitive,
      |    CAST(s.max_c AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
      |      > CAST(0.15 AS DOUBLE) AS f_dominated
      |  FROM documents d JOIN stats s ON d.doc_id = s.doc_id)
      |SELECT doc_id, n_chars, lang, n_tokens, collision_p, max_share,
      |  f_too_short, f_non_en, f_repetitive, f_dominated,
      |  NOT (f_too_short OR f_non_en OR f_repetitive OR f_dominated) AS keep,
      |  CASE WHEN f_too_short THEN 'too_short'
      |       WHEN f_non_en THEN 'non_en'
      |       WHEN f_repetitive THEN 'repetitive'
      |       WHEN f_dominated THEN 'dominated'
      |       ELSE NULL END AS drop_reason
      |FROM r
      |ORDER BY doc_id""".stripMargin

  /** Cross-source contamination matrix: for every pair of sources, how
    * many DISTINCT 30-char grams they share verbatim — the provenance
    * audit that tells you which crawl sources copy from which (mirror
    * sites, syndication, templating) before you decide dedup survivor
    * priorities. Same inverted gram index as [[suffixDupSpans]] —
    * including the r14 fixed-width key: the shuffle carries the gram's
    * md5 as two 60-bit longs, not the raw 30-char string (see
    * [[suffixDupSpans]] for the collision arithmetic; the oracle groups
    * by the same limbs). The pair expansion happens per gram over its
    * ≤20 distinct sources (bounded by the source vocabulary, NOT by
    * corpus size), so the 100 TB cost is the gram shuffle, and the
    * output is |sources|² rows regardless of scale.
    */
  def sourceOverlapMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Each gram's source membership as a BITMASK (sources are 'src0'..
    // 'src19' by data contract — the same invariant mixture_sample keys
    // on): ONE gram-keyed bit_or of codegen'd longs — no per-group set
    // objects — then the mask HISTOGRAM (≤ 2^20 but practically a few
    // hundred rows) pair-expands against a broadcast 190-row pair table.
    // The only data-sized shuffle carries (gram, long); everything after
    // is driver-trivial. This is the bitmap-index formulation of
    // "which sources share content" — the 100 TB answer to a
    // posting-list self-join.
    val masks = Tables.documents(spark, sfDir)
      .filter(col("n_chars") >= G)
      // explicit numbered repartition after the pushed filter: the
      // one-row-group scan otherwise leaves the gram explosion on 1 task
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .select(expr("cast(substring(source, 4) as int)").as("si"),
        col("text"),
        explode(sequence(lit(1), col("n_chars") - (G - 1))).as("p"))
      .withColumn("hx",
        md5(expr(s"substring(text, cast(p as int), $G)").cast("binary")))
      .select(col("si"),
        conv(substring(col("hx"), 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(col("hx"), 17, 15), 16, 10).cast("long").as("h2"))
      .groupBy(col("h1"), col("h2"))
      .agg(expr("bit_or(shiftleft(1L, si))").as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
    val pairs = (for { a <- 0 until 20; b <- a + 1 until 20 } yield (a, b))
      .toDF("a", "b")
    masks.crossJoin(broadcast(pairs))
      .filter(expr("shiftright(mask, a) % 2 = 1 and shiftright(mask, b) % 2 = 1"))
      // pair labels in STRING order ('src12' < 'src4') to match the
      // oracle's a.source < b.source comparison on the raw names
      .groupBy(
        least(concat(lit("src"), col("a")), concat(lit("src"), col("b")))
          .as("src_a"),
        greatest(concat(lit("src"), col("a")), concat(lit("src"), col("b")))
          .as("src_b"))
      .agg(sum(col("cnt")).as("shared_grams"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val sourceOverlapMatrixSql: String =
    s"""WITH pos0 AS (
      |  SELECT source, text, unnest(range(1, n_chars - ${G - 2})) AS p
      |  FROM documents WHERE n_chars >= $G),
      |hp AS (
      |  SELECT source, md5(substr(text, CAST(p AS INTEGER), $G)) AS hx
      |  FROM pos0),
      |grams AS (
      |  SELECT DISTINCT source,
      |    ('0x' || substr(hx, 1, 15))::BIGINT AS h1,
      |    ('0x' || substr(hx, 17, 15))::BIGINT AS h2
      |  FROM hp)
      |SELECT a.source AS src_a, b.source AS src_b,
      |  CAST(count(*) AS BIGINT) AS shared_grams
      |FROM grams a JOIN grams b
      |  ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.source < b.source
      |GROUP BY 1, 2
      |ORDER BY src_a, src_b""".stripMargin

  /** Class-distinctive terms (c-TF-IDF flavor): for each language, the
    * top-5 tokens by integer-fixed-point LIFT — how over-represented the
    * token is in that language vs the whole corpus:
    * lift = (c_lang_tok / n_lang) / (c_tok / N), scaled ×10⁶ in 128-bit
    * integer arithmetic (DECIMAL(38,0) / HUGEINT — a 1e13-token corpus
    * would wrap the naive BIGINT product) so the RANKING is pure integer
    * arithmetic at any corpus size (the same trick as `tfidf_top_terms`
    * — no double comparisons anywhere near a rank). Bound on the EMITTED
    * value: the integral divide narrows lift_fp to BIGINT, and since
    * c_t ≥ c_lt ≥ 5 the worst case is 10⁶·N/5 — exact for corpora up to
    * N ≈ 4.6·10¹³ tokens; past that the final would have to stay
    * DECIMAL (the 128-bit intermediates are safe to 10³² regardless). The curation use: what vocabulary defines each class/slice
    * of a corpus. Two token-keyed aggregations + a per-class top-5
    * window over the (class, token) domain — at 100 TB the window input
    * is vocabulary-sized, not corpus-sized.
    */
  def classTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val byLangTok = tok.groupBy(col("lang"), col("t"))
      .agg(count(lit(1)).as("c_lt"))
    val byTok = byLangTok.groupBy(col("t")).agg(sum(col("c_lt")).as("c_t"))
    val byLang = byLangTok.groupBy(col("lang")).agg(sum(col("c_lt")).as("n_l"))
    val totals = byTok.agg(sum(col("c_t")).as("n_total"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("lift_fp").desc, col("t"))
    byLangTok
      .join(byTok, "t").join(broadcast(byLang), "lang")
      .crossJoin(broadcast(totals))
      .filter(col("c_lt") >= 5) // drop noise terms before ranking
      // 128-bit-wide fixed point: c_lt·n_total·10⁶ tops out near 1e32 at
      // a 1e13-token corpus — silent Long wrap in non-ANSI Spark, a bind
      // error in DuckDB. DECIMAL(38,0) here / HUGEINT in the oracle keep
      // the integer ranking exact at every scale; IntegralDivide then
      // returns the BIGINT lift both engines hash (exact while
      // 10⁶·N/5 ≤ Long.Max, i.e. N ≲ 4.6e13 tokens — see docstring).
      .withColumn("lift_fp",
        expr("(cast(c_lt as decimal(38,0)) * cast(n_total as decimal(38,0))" +
          " * 1000000) div (cast(n_l as decimal(38,0)) * cast(c_t as decimal(38,0)))"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("rnk"), col("t").as("token"), col("c_lt"),
        col("c_t"), col("lift_fp"))
      .orderBy(col("lang"), col("rnk"))
  }

  val classTfidfSql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents),
      |lt AS (
      |  SELECT lang, t, CAST(count(*) AS BIGINT) AS c_lt
      |  FROM tok WHERE t <> '' GROUP BY lang, t),
      |bt AS (SELECT t, CAST(sum(c_lt) AS BIGINT) AS c_t FROM lt GROUP BY t),
      |bl AS (SELECT lang, CAST(sum(c_lt) AS BIGINT) AS n_l
      |       FROM lt GROUP BY lang),
      |n AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_total FROM bt),
      |scored AS (
      |  SELECT lt.lang, lt.t, lt.c_lt, bt.c_t,
      |    (CAST(lt.c_lt AS HUGEINT) * CAST(n_total AS HUGEINT) * 1000000)
      |      // (CAST(bl.n_l AS HUGEINT) * CAST(bt.c_t AS HUGEINT)) AS lift_fp
      |  FROM lt JOIN bt USING (t) JOIN bl USING (lang), n
      |  WHERE lt.c_lt >= 5),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY lang
      |    ORDER BY lift_fp DESC, t) AS BIGINT) AS rnk
      |  FROM scored)
      |SELECT lang, rnk, t AS token, c_lt, c_t, CAST(lift_fp AS BIGINT)
      |  AS lift_fp
      |FROM ranked
      |WHERE rnk <= 5
      |ORDER BY lang, rnk""".stripMargin

  /** K-anonymity release audit: per (lang, source) cell, release the
    * count only if ≥ 5 documents share the cell, else suppress — plus
    * the released flag and the cell's share of the corpus. The
    * governance step before publishing per-slice statistics of a
    * training corpus: no cell small enough to identify a contributor
    * leaves the system. One scan + one tiny groupBy; the suppression
    * rule is a pure integer comparison, so the release decision itself
    * is oracle-gated.
    */
  def kanonReport(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_docs"))
    val total = cells.agg(sum(col("n_docs")).as("n_total"))
    cells.crossJoin(broadcast(total))
      .withColumn("released", col("n_docs") >= 5)
      .withColumn("released_count",
        when(col("released"), col("n_docs")).otherwise(lit(null).cast("long")))
      .withColumn("share",
        when(col("released"),
          col("n_docs").cast("double") / col("n_total").cast("double"))
          .otherwise(lit(null).cast("double")))
      .select(col("lang"), col("source"), col("released"),
        col("released_count"), col("share"))
      .orderBy(col("lang"), col("source"))
  }

  val kanonReportSql: String =
    """WITH cells AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY lang, source),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM cells)
      |SELECT lang, source,
      |  n_docs >= 5 AS released,
      |  CASE WHEN n_docs >= 5 THEN n_docs ELSE NULL END AS released_count,
      |  CASE WHEN n_docs >= 5
      |       THEN CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)
      |       ELSE NULL END AS share
      |FROM cells, t
      |ORDER BY lang, source""".stripMargin

  /** Prefix dedup: documents sharing their normalized leading 8-token
    * span — the boilerplate-lead detector (template intros, syndicated
    * headers) that whole-document hashing misses entirely (this corpus
    * has ZERO exact dups but 23 shared-prefix groups at sf0.01). Same
    * one-shuffle hash-group shape as `dedup_exact_groups`, keyed on the
    * md5 of the prefix; survivor = min doc_id, and the distinct-source
    * count shows whether the copying crosses source boundaries.
    */
  def dedupPrefix(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        md5(array_join(slice(split(col("text"), " "), 1, 8), " "))
          .as("prefix_hash"))
      .groupBy(col("prefix_hash"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("keep_doc_id"))
      .filter(col("n_docs") >= 2)
      .select(col("prefix_hash"), col("n_docs"), col("n_sources"),
        col("keep_doc_id"))
      .orderBy(col("prefix_hash"))
  }

  val dedupPrefixSql: String =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    md5(array_to_string(string_split(text, ' ')[1:8], ' '))
      |      AS prefix_hash
      |  FROM documents)
      |SELECT prefix_hash,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |  min(doc_id) AS keep_doc_id
      |FROM h
      |GROUP BY prefix_hash
      |HAVING count(*) >= 2
      |ORDER BY prefix_hash""".stripMargin

  /** Vocabulary-concentration (Zipf) audit: what share of all token
    * OCCURRENCES the top-3 / top-10 / top-25 most frequent types cover
    * (ranks sized to this corpus's 31-type vocabulary) — the number that sizes a tokenizer vocabulary and predicts
    * how far a stopword list reaches. Ranking and cumulative sums are
    * exact BIGINTs over the aggregated VOCABULARY domain (never the
    * corpus); one final division per row. Ties rank (count desc, token
    * asc) in both engines.
    */
  def zipfCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n_total"))
    // Only ranks 3/10/25 are consumed, so the rank+cumsum never needs
    // the whole vocabulary: r18 ran BOTH through a single-partition
    // global window over every type — a domain that GROWS with the
    // corpus (the bench tail's "No Partition Defined" WindowExec class).
    // r19: distributed top-25 (orderBy+limit = TakeOrderedAndProject,
    // partial top-k per task) then rank and cumulative sum over the
    // 25-row relation via its triangle self-join — rnk(a) = #{b ⪯ a},
    // cum(a) = Σ_{b ⪯ a} c(b) under the SAME strictly-unique ordering
    // (c desc, t asc; t is distinct), so every emitted value is
    // identical by construction and no WindowExec remains at all.
    val top = counts.orderBy(col("c").desc, col("t")).limit(25)
    val ranked = top.toDF("ta", "ca")
      .join(top.toDF("tb", "cb"),
        col("cb") > col("ca") ||
          (col("cb") === col("ca") && col("tb") <= col("ta")))
      .groupBy(col("ta"), col("ca"))
      .agg(count(lit(1)).as("rnk"), sum(col("cb")).as("cum"))
    ranked
      .filter(col("rnk").isin(3L, 10L, 25L))
      .crossJoin(broadcast(total))
      .withColumn("coverage",
        col("cum").cast("double") / col("n_total").cast("double"))
      .select(col("rnk").as("top_k"), col("cum").as("occurrences_covered"),
        col("n_total"), col("coverage"))
      .orderBy(col("top_k"))
  }

  val zipfCoverageSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |counts AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS c
      |  FROM tok WHERE t <> '' GROUP BY t),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM counts),
      |ranked AS (
      |  SELECT c,
      |    CAST(row_number() OVER (ORDER BY c DESC, t) AS BIGINT) AS rnk,
      |    CAST(sum(c) OVER (ORDER BY c DESC, t
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM counts)
      |SELECT rnk AS top_k, cum AS occurrences_covered, n_total,
      |  CAST(cum AS DOUBLE) / CAST(n_total AS DOUBLE) AS coverage
      |FROM ranked, tot
      |WHERE rnk IN (3, 10, 25)
      |ORDER BY top_k""".stripMargin

  private val ReservoirK = 8

  /** Deterministic bounded "reservoir" sample: the k=8 documents with the
    * smallest md5-derived keys per source — a uniform-without-replacement
    * per-key sample that any executor can recompute (no RNG state).
    * Implemented with the mergeable bounded [[TopKAggregator]] (score =
    * negated 52-bit hash), so each map task holds ≤ k entries per source
    * and the shuffle moves k-row buffers, never the corpus — the scale
    * contrast to the oracle's window row_number, which must sort every
    * group. 52-bit keys (13 hex chars) stay exact in the aggregator's
    * double score.
    */
  def reservoirSample(spark: SparkSession, sfDir: String): DataFrame = {
    val topk = TopKAggregator.topK(ReservoirK)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 13), 16, 10) as bigint)")
          .as("h"))
      .groupBy(col("source"))
      .agg(topk(-col("h").cast("double"), col("doc_id")).as("kept"))
      .select(col("source"), posexplode(col("kept")).as(Seq("pos", "sd")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
        col("sd._2").as("doc_id"),
        (-col("sd._1")).cast("long").as("sample_key"))
      .orderBy(col("source"), col("rank"))
  }

  val reservoirSampleSql: String =
    s"""WITH h AS (
      |  SELECT source, doc_id,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS h
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id, h,
      |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
      |      AS rank
      |  FROM h)
      |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, h AS sample_key
      |FROM r
      |WHERE rank <= $ReservoirK
      |ORDER BY source, rank""".stripMargin
}
