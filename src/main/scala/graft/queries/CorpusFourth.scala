package graft.queries

import graft.Checkpoints.StableCheckpoint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.{Dedup, TextFunctions}

/** Fourth corpus-operator batch: C4-style boilerplate n-gram flagging,
  * per-source cap sampling (domain balancing), bigram-frequency quality
  * scoring (the transcendental-free stand-in for LM perplexity
  * filtering), and dedup survivor selection (the keep-list a dedup pass
  * actually ships).
  */
object CorpusFourth {

  private def toks(spark: SparkSession, sfDir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      // single-file parquet arrives as one partition; spread BEFORE the
      // per-row gram/explode work or it runs serially
      .repartition(par)
  }

  /** Boilerplate detection, C4-style: a 5-gram is boilerplate when it
    * appears in ≥ 10% of documents (df·10 ≥ n_docs — integer-threshold
    * arithmetic, never a double percent); each document reports its
    * distinct-gram count and boilerplate fraction in ppm. The boilerplate
    * set is provably tiny — Σdf over all grams is n_docs·G (G = avg
    * distinct grams/doc), so at most 10·G grams can clear the 10% bar —
    * which is why it broadcasts, turning the per-doc tagging into a
    * map-only broadcast left join no matter the corpus size. The gram
    * df aggregation is the one shuffle.
    */
  def boilerplateNgrams(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = toks(spark, sfDir)
      .select(col("doc_id"), explode(Dedup.ngramSetOfTokens(col("toks"), 5)).as("gram"))
      .stableCheckpoint() // reused: df aggregation + per-doc tagging
    val nDocs = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val boiler = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 10 >= col("n_docs"))
      .select(col("gram"), col("df"))
    grams.join(broadcast(boiler), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df").isNotNull, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        expr("(n_boiler * 1000000L) div n_grams").as("boiler_ppm"))
      .orderBy(col("doc_id"))
  }

  val boilerplateNgramsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([array_to_string(t[i:i+4], ' ')
      |      for i in range(1, greatest(len(t) - 4, 1) + 1)])) AS gram
      |  FROM toks),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |df AS (SELECT gram, count(*) AS df FROM grams GROUP BY 1),
      |boiler AS (SELECT gram, df FROM df, n WHERE df * 10 >= n_docs)
      |SELECT g.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN b.df IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_boiler,
      |  (CAST(sum(CASE WHEN b.df IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000) // count(*) AS boiler_ppm
      |FROM grams g LEFT JOIN boiler b USING (gram)
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  /** Domain balancing: keep at most 10 documents per source, chosen by
    * deterministic md5-hash rank (tiebreak doc_id) — the per-domain cap
    * every crawl-scale mixture applies so one hot domain can't dominate
    * the training set. The rank-filter plans as Spark 4's native
    * WindowGroupLimit: each map task keeps its local top-10 per source
    * BEFORE the shuffle, so a 10⁹-doc domain moves ≤ 10·partitions rows,
    * never its full row set.
    */
  def domainCapSample(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .withColumn("h",
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("source"), col("rk"), col("doc_id"))
      .orderBy(col("source"), col("rk"))
  }

  val domainCapSampleSql: String =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
      |  FROM h)
      |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id
      |FROM r WHERE rk <= 10
      |ORDER BY source, rk""".stripMargin

  /** Bigram-frequency quality score — the transcendental-free stand-in
    * for LM perplexity filtering (no ln/exp ever crosses the gate): per
    * document, the mean corpus frequency of its bigrams (×1000, integer
    * div) and the fraction of rare bigrams (corpus count < 3, ppm). Low
    * mean + high rare-fraction marks gibberish; high mean marks
    * boilerplate. Two shuffles: the corpus bigram count and the
    * tag-back join on the bigram key (hot bigrams are AQE skew-join
    * territory — same posture as every gram join in this repo).
    */
  def lmQualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val bi = toks(spark, sfDir)
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("bg"))
      .stableCheckpoint() // reused: corpus counts + per-doc tagging
    val cf = bi.groupBy(col("bg")).agg(count(lit(1)).as("cf"))
    bi.join(cf, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("cf")).as("sum_cf"),
        sum(when(col("cf") < 3, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(sum_cf * 1000L) div n_bigrams").as("mean_cf_x1000"),
        expr("(n_rare * 1000000L) div n_bigrams").as("rare_ppm"))
      .orderBy(col("doc_id"))
  }

  val lmQualityScoreSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    unnest([array_to_string(t[i:i+1], ' ')
      |            for i in range(1, len(t))]) AS bg
      |  FROM toks WHERE len(t) >= 2),
      |cf AS (SELECT bg, count(*) AS cf FROM bi GROUP BY 1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  (CAST(sum(cf) AS BIGINT) * 1000) // count(*) AS mean_cf_x1000,
      |  (CAST(sum(CASE WHEN cf < 3 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
      |    // count(*) AS rare_ppm
      |FROM bi JOIN cf USING (bg)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Dedup survivor selection: the step after clustering that a real
    * pipeline ships — per duplicate cluster (same components as
    * `dedup_components`), keep the longest document (tie → smallest
    * doc_id) and report cluster size. Survivor choice is a single
    * max-of-struct aggregation — (n_chars, −doc_id) lexicographic max —
    * NOT a per-cluster sort window, so the reduction stays one
    * map-side-combinable shuffle at any cluster-count scale.
    */
  def dedupSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.ngramJaccardPairs(docs, blockCols = Seq("lang"),
      n = 3, threshold = 0.2)
    Dedup.connectedComponents(pairs)
      .join(docs.select(col("doc_id").as("src"), col("n_chars")), Seq("src"))
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_chars").as("c"), (-col("src")).as("negid"))).as("best"))
      .select(col("lbl").as("component"), col("n_members"),
        (-col("best.negid")).as("survivor_id"),
        col("best.c").as("survivor_chars"))
      .orderBy(col("component"))
  }

  // Candidate generation via TextQueries.gramSimPairsSqlPreamble's
  // inverted-index join (not all-pairs) — see its Scaladoc; the all-pairs
  // form was one of the four sf0.1 replay oracle timeouts.
  val dedupSurvivorsSql: String =
    "WITH RECURSIVE " + TextQueries.gramSimPairsSqlPreamble + """,
      |pairs AS (SELECT id_a, id_b FROM simpairs WHERE jaccard_sim > 0.2),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(src, lbl) AS (
      |  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      |  UNION
      |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src),
      |comp AS (
      |  SELECT src, min(lbl) AS component FROM reach GROUP BY src),
      |m AS (
      |  SELECT c.component, c.src, d.n_chars
      |  FROM comp c JOIN documents d ON c.src = d.doc_id),
      |ranked AS (
      |  SELECT component, src, n_chars,
      |    row_number() OVER (PARTITION BY component
      |                       ORDER BY n_chars DESC, src) AS rn,
      |    count(*) OVER (PARTITION BY component) AS n_members
      |  FROM m)
      |SELECT component, CAST(n_members AS BIGINT) AS n_members,
      |  src AS survivor_id, n_chars AS survivor_chars
      |FROM ranked WHERE rn = 1
      |ORDER BY component""".stripMargin
}
