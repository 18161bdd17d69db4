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

  val dedupEvalPairsSql: String =
    """WITH toks AS (
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
      |grams AS (
      |  SELECT lang, doc_id AS id,
      |    list_distinct([array_to_string(t3[i:i+2], ' ')
      |      for i in range(1, greatest(len(t3) - 2, 1) + 1)]) AS g
      |  FROM (SELECT lang, doc_id,
      |          regexp_split_to_array(trim(lower(text)), '\s+') AS t3
      |        FROM documents)),
      |truth AS (
      |  SELECT a.id AS id_a, b.id AS id_b
      |  FROM grams a JOIN grams b ON a.lang = b.lang AND a.id < b.id
      |  WHERE round(len(list_intersect(a.g, b.g))
      |        / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE), 4)
      |    > 0.2),
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
    val docTok = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text"))))
          .as("tok"))
    val nDocs = docTok.agg(countDistinct(col("doc_id")).as("n_docs"))
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
}
