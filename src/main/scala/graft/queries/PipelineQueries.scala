package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions

/** Training-data pipeline operators beyond cleaning/dedup: deterministic
  * splits, stratified sampling, vocabulary building and corpus statistics.
  * Everything is hash-deterministic (no RNG — reproducible across engines,
  * re-runs and cluster sizes, which is what a training pipeline needs from
  * its split/sample step) and replayable by the DuckDB oracle.
  *
  * Scale notes: every operator here is a single scan plus one hash-keyed
  * aggregation — no joins, no skew-prone keys (md5 spreads uniformly), and
  * the split/sample predicates are pure projections that pipeline into the
  * scan, so at 100 TB each is one map pass + one (combiner-friendly)
  * shuffle of pre-aggregated partials.
  */
object PipelineQueries {

  /** 60-bit md5 prefix of a column — the shared hash ring (identical in
    * DuckDB via ('0x'||substr(md5(x),1,15))::BIGINT).
    */
  private def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Deterministic train/val/test split (8/1/1 by md5(doc_id) mod 10):
    * the assignment is a pure function of the id, so it is stable under
    * re-partitioning, re-runs and appends. Emits per-(split, lang) counts
    * and total token mass — the bookkeeping a pipeline reports per shard.
    */
  def splitTrainTest(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("bucket", hash60(col("doc_id")) % 10)
      .withColumn("split",
        when(col("bucket") < 8, "train")
          .when(col("bucket") === 8, "val")
          .otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"))
      .select(col("split"), col("lang"), col("n_docs"),
        col("n_tokens").cast("long").as("n_tokens"))
      .orderBy(col("split"), col("lang"))

  val splitTrainTestSql: String =
    """WITH assigned AS (
      |  SELECT lang, text,
      |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 AS bucket
      |  FROM documents)
      |SELECT CASE WHEN bucket < 8 THEN 'train'
      |            WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
      |  lang, count(*) AS n_docs,
      |  CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT)
      |    AS n_tokens
      |FROM assigned
      |GROUP BY 1, 2
      |ORDER BY split, lang""".stripMargin

  /** Stratified deterministic sample: ~10% of documents per language via
    * a hash threshold on the id (md5 mod 100 < 10). Unlike `TABLESAMPLE`,
    * membership is reproducible and per-stratum rates are exact-in-
    * expectation regardless of physical layout. Emits the sampled ids.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(hash60(col("doc_id")) % 100 < 10)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("doc_id"))

  val stratifiedSampleSql: String =
    """SELECT lang, doc_id, n_chars
      |FROM documents
      |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 10
      |ORDER BY lang, doc_id""".stripMargin

  /** Vocabulary building: document frequency of each token (distinct per
    * doc — explode + count), keeping tokens appearing in ≥ 1% of docs,
    * ordered by df desc then token. The df groupBy is combiner-friendly
    * (per-partition partials) and md5-free: the shuffle key is the token.
    */
  def vocabDocFreq(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    docs
      .select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
      // Integer arithmetic for the 1% threshold: df·100 ≥ N avoids the
      // engines disagreeing on double(0.01)·N at the boundary.
      .filter(col("df") * 100 >= lit(nDocs))
      .orderBy(col("df").desc, col("token"))
  }

  val vocabDocFreqSql: String =
    """WITH exploded AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    regexp_split_to_array(trim(lower(text)), '\s+'))) AS token
      |  FROM documents)
      |SELECT token, count(DISTINCT doc_id) AS df
      |FROM exploded
      |GROUP BY token
      |HAVING count(DISTINCT doc_id) * 100 >= (SELECT count(*) FROM documents)
      |ORDER BY df DESC, token""".stripMargin

  /** Per-language corpus statistics: docs, token mass (whitespace and
    * BPE-ish subword counts), char mass, and the interpolated median
    * document length — the shape of a corpus-profile report.
    */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars"),
        TextFunctions.tokenCount(col("text")).as("n_tok"),
        TextFunctions.subwordCount(col("text")).as("n_sub"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("total_tokens"),
        sum(col("n_sub")).cast("long").as("total_subwords"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        // Exact interpolated median: both engines average the two middle
        // values of identical operands, so the double matches bit-for-bit.
        percentile(col("n_chars"), lit(0.5)).as("median_chars"))
      .orderBy(col("lang"))

  val corpusStatsSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT)
      |    AS total_tokens,
      |  CAST(sum(len(regexp_extract_all(lower(trim(text)),
      |      '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS total_subwords,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  quantile_cont(n_chars, 0.5) AS median_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Token budget per training pack (tokens per sequence after concat). */
  private val PackBudget = 512L

  /** Sequence packing, concat-and-chunk style: within each language
    * stream, documents are laid end-to-end in deterministic doc_id order
    * and cut into fixed 512-token packs; each document is labeled with the
    * pack its first token lands in and its offset inside that pack — the
    * assignment step of an LLM pre-training batch packer (documents
    * crossing a boundary continue into the next pack, exactly like the
    * usual tokenize→concat→chunk dataloader).
    *
    * One window shuffle on lang (running token total over doc_id order);
    * the division/modulo are integer ops on exact longs, so the oracle
    * replays bit-identically. At scale the lang partitions are the
    * parallelism unit; a finer pre-partitioning key (lang, shard) drops in
    * without changing the arithmetic.
    */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        // integer `div`, not `/`: Spark's / is double division, which
        // would lose exactness past 2^53 total tokens
        expr(s"start_offset div $PackBudget").as("pack_id"),
        (col("start_offset") % PackBudget).as("pack_offset"))
      .orderBy(col("lang"), col("doc_id"))
  }

  val packSequencesSql: String =
    s"""WITH t AS (
       |  SELECT lang, doc_id,
       |    CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT lang, doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (
       |      PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
       |  FROM t)
       |SELECT lang, doc_id, n_tokens,
       |  CAST(start_offset // $PackBudget AS BIGINT) AS pack_id,
       |  CAST(start_offset % $PackBudget AS BIGINT) AS pack_offset
       |FROM c
       |ORDER BY lang, doc_id""".stripMargin
}
