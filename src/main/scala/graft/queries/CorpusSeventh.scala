package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{Dedup, TextFunctions}

/** Round-5 corpus additions, batch 7: a dedup-pipeline quality
  * evaluation (LSH candidate pairs scored against exact-duplicate truth
  * pairs) and word-collocation mining with a fixed-point PMI lift —
  * the eval-and-explore operators a curation team runs AFTER the dedup
  * and tokenizer families have produced their artifacts.
  *
  * Exactness discipline as elsewhere: integer counts everywhere,
  * fixed-point integer lifts instead of libm log (cross-engine
  * bit-stability), doubles only in final single divisions.
  */
object CorpusSeventh {

  // ----------------------------------------------------- dedup eval

  /** Precision/recall of the MinHash-LSH candidate generator against
    * the EXACT n-gram-Jaccard near-duplicate pairs (the
    * `dedup_ngram_jaccard` ground truth — the corpus has no byte-exact
    * duplicates, so set-similarity > 0.2 IS the duplicate relation this
    * pipeline hunts) — the eval every dedup pipeline needs before
    * trusting its candidate budget: how many true duplicate pairs does
    * banding recall, and how much of the candidate budget is spent on
    * non-duplicates? Truth pairs come from the lang-blocked exact
    * similarity join (keyed, prefix-guarded — never all-pairs);
    * candidates are the production `dedup_minhash_lsh` path. TP/FP/FN
    * are exact integer counts via one pair-keyed join; precision and
    * recall are the two final divisions.
    */
  def dedupEvalPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val truth = Dedup.ngramJaccardPairs(docs,
      blockCols = Seq("lang"), n = 3, threshold = 0.2)
      .select(col("id_a"), col("id_b"))
    val cand = Dedup.minhashCandidates(docs, k = 16, bands = 2)
      .select(col("id_a"), col("id_b"))
    val tp = cand.join(truth, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("tp"))
    val nc = cand.agg(count(lit(1)).as("n_candidates"))
    val nt = truth.agg(count(lit(1)).as("n_truth_pairs"))
    nc.crossJoin(broadcast(nt)).crossJoin(broadcast(tp))
      .select(col("n_truth_pairs"), col("n_candidates"), col("tp"),
        (col("tp").cast("double") / col("n_candidates").cast("double"))
          .as("pair_precision"),
        (col("tp").cast("double") / col("n_truth_pairs").cast("double"))
          .as("pair_recall"))
  }

  // Ground-truth pairs come from TextQueries.gramSimPairsSqlPreamble's
  // inverted-index join (not all-pairs) — see its Scaladoc; the all-pairs
  // form was one of the four sf0.1 replay oracle timeouts.
  val dedupEvalPairsSql: String =
    "WITH " + TextQueries.gramSimPairsSqlPreamble + """,
      |toks AS (
      |  SELECT doc_id AS id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |sigs AS (
      |  SELECT id, [list_min([md5(s::VARCHAR || ':' || x) for x in t])
      |              for s in range(0, 16)] AS sig
      |  FROM toks),
      |bands AS (
      |  SELECT id, b, md5(array_to_string(sig[b*8+1:b*8+8], '|')) AS bucket
      |  FROM sigs, range(0, 2) r(b)),
      |cand AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.bucket = b.bucket AND a.id < b.id),
      |truth AS (SELECT id_a, id_b FROM simpairs WHERE jaccard_sim > 0.2),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS tp
      |  FROM cand JOIN truth USING (id_a, id_b)),
      |c AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cand),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_truth_pairs FROM truth)
      |SELECT t.n_truth_pairs, c.n_candidates, m.tp,
      |  CAST(m.tp AS DOUBLE) / CAST(c.n_candidates AS DOUBLE)
      |    AS pair_precision,
      |  CAST(m.tp AS DOUBLE) / CAST(t.n_truth_pairs AS DOUBLE)
      |    AS pair_recall
      |FROM c, t, m""".stripMargin

  // -------------------------------------------------- collocation PMI

  /** Top word collocations by document co-occurrence, ranked by count
    * with a fixed-point PMI-style lift
    * `(c_ab · n_docs · 10⁶) div (c_a · c_b)` — monotone in PMI like
    * `class_tfidf`'s integer idf, exact in 64-bit arithmetic where libm
    * log is not. The quadratic pair step is bounded: only tokens from
    * the TOP-200 document-frequency vocabulary pair up (a broadcast
    * set), so per-doc pair fan-out is capped by hits² ≤ 200² regardless
    * of document length, and the pair aggregation is keyed by the pair.
    * `c_ab·n_docs` reaches ~10²⁴ at 100 TB → DECIMAL (HUGEINT oracle
    * side), with the lift emitted as the exact integer quotient.
    */
  def collocationPmi(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.Checkpoints.StableCheckpoint
    // Materialized once: the tokenize+distinct+explode pass feeds the df
    // aggregate AND the pair probe (exchange reuse does not fire across
    // the renamed sides — same rationale as the MinHash signature pass).
    val docTok = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text"))))
          .as("tok"))
      .stableCheckpoint()
    // Every document tokenizes to ≥1 token, so n_docs is the plain
    // document count — no distinct over the exploded token relation.
    val nDocs = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("n_docs"))
    val df = docTok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // top-200 df vocabulary; ties broken by token for determinism
    val vocab = df.orderBy(col("df").desc, col("tok")).limit(200)
    val hits = docTok.join(broadcast(vocab), Seq("tok"))
    val pairs = hits.toDF("ta", "doc_id", "dfa")
      .join(hits.toDF("tb", "doc_id", "dfb"), Seq("doc_id"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"), col("dfa"), col("dfb"))
      .agg(count(lit(1)).as("c_ab"))
    pairs.crossJoin(broadcast(nDocs))
      .select(col("ta"), col("tb"), col("c_ab"),
        expr("""cast((cast(c_ab as decimal(38,0))
          * cast(n_docs as decimal(38,0)) * 1000000)
          div (cast(dfa as decimal(38,0))
          * cast(dfb as decimal(38,0))) as long)""").as("lift_fp"))
      .orderBy(col("c_ab").desc, col("ta"), col("tb"))
      .limit(30)
  }

  val collocationPmiSql: String =
    """WITH dt AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(
      |      regexp_split_to_array(trim(lower(text)), '\s+'))) AS tok
      |  FROM documents),
      |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dt),
      |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt
      |  GROUP BY tok),
      |vocab AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 200),
      |hits AS (SELECT dt.doc_id, dt.tok, v.df FROM dt
      |  JOIN vocab v USING (tok)),
      |pairs AS (
      |  SELECT a.tok AS ta, b.tok AS tb, a.df AS dfa, b.df AS dfb,
      |    CAST(count(*) AS BIGINT) AS c_ab
      |  FROM hits a JOIN hits b
      |    ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY a.tok, b.tok, a.df, b.df)
      |SELECT ta, tb, c_ab,
      |  CAST(CAST(c_ab AS HUGEINT) * CAST(n_docs AS HUGEINT) * 1000000
      |    // (CAST(dfa AS HUGEINT) * CAST(dfb AS HUGEINT)) AS BIGINT)
      |    AS lift_fp
      |FROM pairs, n
      |ORDER BY c_ab DESC, ta, tb
      |LIMIT 30""".stripMargin

  // -------------------------------------- token percentiles by source

  /** Per-source token-count percentiles (p50/p90/p99) from the LENGTH
    * HISTOGRAM — the per-feed sizing profile a batch planner reads
    * before picking sequence lengths. The repo's rank convention
    * (value at ⌊p·(n−1)⌋+1) picked per source from a SOURCE-KEYED
    * cumulative window over distinct lengths — no global window, no
    * row-level sort; everything integer.
    */
  def tokenPercentilesBySource(spark: SparkSession, sfDir: String): DataFrame = {
    val h = Tables.documents(spark, sfDir)
      .select(col("source"),
        TextFunctions.tokenCount(col("text")).as("n_tok"))
      .groupBy(col("source"), col("n_tok"))
      .agg(count(lit(1)).as("cnt"))
    val bySrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_tok"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    def pick(p: String, as: String) =
      max(when(col("cum") >=
        expr(s"cast(floor(cast($p as double) * cast(n - 1 as double)) as bigint) + 1") &&
        col("cum") - col("cnt") <
          expr(s"cast(floor(cast($p as double) * cast(n - 1 as double)) as bigint) + 1"),
        col("n_tok"))).as(as)
    h
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(bySrc))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        pick("0.5", "p50_tokens"), pick("0.9", "p90_tokens"),
        pick("0.99", "p99_tokens"))
      .orderBy(col("source"))
  }

  val tokenPercentilesBySourceSql: String =
    """WITH h AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
      |      AS BIGINT) AS n_tok,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY source, n_tok),
      |c AS (
      |  SELECT source, n_tok, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY n_tok
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
      |  FROM h)
      |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
      |  max(CASE WHEN cum >= CAST(floor(CAST(0.5 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
      |    AND cum - cnt < CAST(floor(CAST(0.5 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN n_tok END)
      |    AS p50_tokens,
      |  max(CASE WHEN cum >= CAST(floor(CAST(0.9 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
      |    AND cum - cnt < CAST(floor(CAST(0.9 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN n_tok END)
      |    AS p90_tokens,
      |  max(CASE WHEN cum >= CAST(floor(CAST(0.99 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
      |    AND cum - cnt < CAST(floor(CAST(0.99 AS DOUBLE)
      |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN n_tok END)
      |    AS p99_tokens
      |FROM c
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ------------------------------------------------------ RAG chunk plan

  /** RAG-ingest sizing: chunk every document at 512 tokens with a
    * 64-token overlap (stride 448) and report, per source, the chunk
    * count, padded token volume, and padding overhead — the capacity
    * plan a retrieval pipeline runs before embedding a corpus.
    * `n_chunks = max(1, ⌈(tokens − 64) / 448⌉)` in pure integral
    * arithmetic (`(x + 447) div 448` — cross-engine-safe truncation);
    * map-only into a per-source aggregate; overhead is the one
    * division.
    */
  def ragChunkPlan(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("source"),
        TextFunctions.tokenCount(col("text")).as("n_tok"))
      .withColumn("n_chunks",
        greatest(lit(1L), expr("(n_tok - 64 + 447) div 448")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"),
        sum(col("n_chunks")).as("total_chunks"),
        sum(col("n_chunks") * 512).as("padded_tokens"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("total_chunks"), col("padded_tokens"),
        (col("padded_tokens").cast("double") /
          col("total_tokens").cast("double")).as("overhead_ratio"))
      .orderBy(col("source"))
  }

  val ragChunkPlanSql: String =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
      |      AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT source, n_tok,
      |    GREATEST(1, (n_tok - 64 + 447) // 448) AS n_chunks
      |  FROM d)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |  CAST(sum(n_chunks) AS BIGINT) AS total_chunks,
      |  CAST(sum(n_chunks * 512) AS BIGINT) AS padded_tokens,
      |  CAST(sum(n_chunks * 512) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)
      |    AS overhead_ratio
      |FROM c
      |GROUP BY source
      |ORDER BY source""".stripMargin
}
