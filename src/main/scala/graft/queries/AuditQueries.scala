package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions

/** Pipeline-governance audits (round 5): the checks a training-data
  * pipeline runs BEFORE shipping a corpus — split hygiene, padding
  * economics, watermark sizing, and amount-distribution forensics. All
  * map-side or one-tiny-shuffle shapes.
  */
object AuditQueries {

  private def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  private def splitOf(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bucket = hash60(docId) % 10
    when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
  }

  /** Exact-duplicate leakage across the train/val/test split: a text
    * that appears verbatim in train AND in an eval split silently
    * inflates eval scores. Groups texts by md5, counts groups straddling
    * ≥2 splits and the eval docs contaminated by a train twin — the
    * governance number, computed identically by the oracle (same
    * md5-mod-10 assignment as `split_train_test`). One text-hash shuffle
    * at corpus scale; the verdict is a single row.
    */
  def splitLeakageExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(splitOf(col("doc_id")).as("split"), md5(col("text")).as("th"))
      .groupBy(col("th"))
      .agg(countDistinct(col("split")).as("n_splits"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") =!= "train", 1L).otherwise(0L)).as("n_eval"))
      .agg(
        sum(when(col("n_splits") > 1, 1L).otherwise(0L))
          .as("cross_split_groups"),
        sum(when(col("n_train") > 0, col("n_eval")).otherwise(0L))
          .as("contaminated_eval_docs"))

  val splitLeakageExactSql: String =
    """WITH a AS (
      |  SELECT CASE
      |      WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 < 8
      |        THEN 'train'
      |      WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 = 8
      |        THEN 'val'
      |      ELSE 'test' END AS split,
      |    md5(text) AS th
      |  FROM documents),
      |g AS (
      |  SELECT th, count(DISTINCT split) AS n_splits,
      |    sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
      |    sum(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS n_eval
      |  FROM a GROUP BY th)
      |SELECT
      |  CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS cross_split_groups,
      |  CAST(sum(CASE WHEN n_train > 0 THEN n_eval ELSE 0 END) AS BIGINT)
      |    AS contaminated_eval_docs
      |FROM g""".stripMargin

  /** Padding-waste audit for fixed-bucket batch packing: round every
    * document's token count up to the next multiple of 64 (the classic
    * length-bucketed batching) and report, per bucket, how many padding
    * tokens the bucket burns and the padded share of its slots — the
    * number that decides bucket granularity before a training run.
    * Map-only arithmetic over one scan + a bucket-keyed aggregation.
    */
  def paddingWaste(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
      .withColumn("bucket", expr("((tok + 63) div 64) * 64"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("n_tokens"),
        sum(col("bucket") - col("tok")).as("padding_tokens"))
      .withColumn("waste_share",
        col("padding_tokens").cast("double") /
          (col("n_docs") * col("bucket")).cast("double"))
      .orderBy(col("bucket"))

  val paddingWasteSql: String =
    """WITH t AS (
      |  SELECT CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
      |    AS BIGINT) AS tok
      |  FROM documents),
      |b AS (SELECT tok, ((tok + 63) // 64) * 64 AS bucket FROM t)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(tok) AS BIGINT) AS n_tokens,
      |  CAST(sum(bucket - tok) AS BIGINT) AS padding_tokens,
      |  CAST(sum(bucket - tok) AS DOUBLE)
      |    / CAST(count(*) * bucket AS DOUBLE) AS waste_share
      |FROM b
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  /** Event-time lateness histogram — THE statistic that sizes a
    * streaming watermark: per user, how far each event arrives behind
    * the event-time high-water mark seen so far, bucketed by minute and
    * capped at 60. Choosing `withWatermark("ts", "X minutes")` means
    * accepting the mass beyond bucket X as dropped; this query turns
    * that into a measured trade-off. The testdata carries no arrival
    * column (events.parquet is ts-ordered), so arrival order is a
    * DETERMINISTIC md5 permutation of event_id — a worst-case-ish
    * shuffled-arrival model both engines replay bit-for-bit; with a real
    * ingest feed, substitute its arrival sequence. One partitioned
    * running max + a 61-bucket aggregation.
    */
  def watermarkLatenessHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("arrival", md5(col("event_id").cast("string")))
      .withColumn("hwm", max(col("ts")).over(
        Window.partitionBy(col("user_id")).orderBy(col("arrival"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("late_us",
        expr("unix_micros(cast(hwm as timestamp)) - unix_micros(cast(ts as timestamp))"))
      .withColumn("late_min", least(expr("late_us div 60000000"), lit(60L)))
      .groupBy(col("late_min"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("late_min"))

  val watermarkLatenessHistogramSql: String =
    """WITH h AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    max(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
      |      ORDER BY md5(CAST(event_id AS VARCHAR))
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
      |  FROM events),
      |l AS (
      |  SELECT least((epoch_us(hwm) - epoch_us(ts)) // 60000000, 60)
      |    AS late_min
      |  FROM h)
      |SELECT late_min, CAST(count(*) AS BIGINT) AS n_events
      |FROM l
      |GROUP BY late_min
      |ORDER BY late_min""".stripMargin

  /** Out-of-vocabulary rate of the eval splits under the TRAIN split's
    * vocabulary — the tokenizer-coverage number that decides whether a
    * vocab generalizes or the split broke the distribution: per
    * language, what share of val/test token OCCURRENCES never appear in
    * train. Vocabulary is a distinct-token aggregation (map-side
    * combined); the membership probe is a LEFT ANTI join on the token
    * key — at 100 TB both sides stay token-keyed, never doc-keyed.
    */
  def oovRateSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(col("lang"), splitOf(col("doc_id")).as("split"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val vocab = tok.filter(col("split") === "train").select(col("t")).distinct()
    val eval_ = tok.filter(col("split") =!= "train")
    val oov = eval_.join(vocab, Seq("t"), "left_anti")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_oov"))
    eval_.groupBy(col("lang")).agg(count(lit(1)).as("n_eval_tokens"))
      .join(oov, Seq("lang"), "left")
      .withColumn("n_oov", coalesce(col("n_oov"), lit(0L)))
      .withColumn("oov_share",
        col("n_oov").cast("double") / col("n_eval_tokens").cast("double"))
      .orderBy(col("lang"))
  }

  val oovRateSplitSql: String =
    """WITH tok AS (
      |  SELECT lang,
      |    CASE
      |      WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 < 8
      |        THEN 'train'
      |      WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 = 8
      |        THEN 'val'
      |      ELSE 'test' END AS split,
      |    unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |tk AS (SELECT * FROM tok WHERE t <> ''),
      |vocab AS (SELECT DISTINCT t FROM tk WHERE split = 'train'),
      |ev AS (SELECT lang, t FROM tk WHERE split <> 'train'),
      |oov AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_oov
      |  FROM ev ANTI JOIN vocab USING (t)
      |  GROUP BY lang),
      |tot AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_eval_tokens
      |  FROM ev GROUP BY lang)
      |SELECT tot.lang, n_eval_tokens, coalesce(n_oov, 0) AS n_oov,
      |  CAST(coalesce(n_oov, 0) AS DOUBLE) / CAST(n_eval_tokens AS DOUBLE)
      |    AS oov_share
      |FROM tot LEFT JOIN oov ON tot.lang = oov.lang
      |ORDER BY tot.lang""".stripMargin

  /** Benford first-digit audit over line-item amounts: organic financial
    * amounts follow log-ish first-digit frequencies; a synthetic or
    * tampered column does not. Pure integer digit extraction (first
    * character of the cents string — no float log anywhere near the
    * grouping), one scan, 9-row output with exact counts and the
    * observed share.
    */
  def benfordAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .select(substring(col("cents").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_items"))
    val tot = d.agg(sum(col("n_items")).as("total"))
    d.crossJoin(broadcast(tot))
      .withColumn("share",
        col("n_items").cast("double") / col("total").cast("double"))
      .select(col("digit"), col("n_items"), col("share"))
      .orderBy(col("digit"))
  }

  val benfordAuditSql: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM lineitem),
      |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_items
      |      FROM d GROUP BY digit),
      |t AS (SELECT sum(n_items) AS total FROM g)
      |SELECT digit, n_items,
      |  CAST(n_items AS DOUBLE) / CAST(total AS DOUBLE) AS share
      |FROM g, t
      |ORDER BY digit""".stripMargin
}
