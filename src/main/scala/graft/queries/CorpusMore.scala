package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.BloomFilterAggregator
import graft.text.{Dedup, TextFunctions}

/** Corpus-preparation operators, round 3: the sketch-prefiltered
  * decontamination pass, fixed-point TF-IDF term ranking, passage-level
  * (token-chunk) duplication, deterministic weighted sampling, and n-gram
  * language-model count tables. Oracle-parity rules as everywhere: all
  * scoring in exact integer arithmetic (no transcendental functions — both
  * engines' libm may differ in the last ulp), every ORDER BY fully
  * tiebroken.
  */
object CorpusMore {

  private def toks(spark: SparkSession, sfDir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      // single-file parquet arrives as one partition; spread BEFORE the
      // per-row gram/explode work or it runs serially
      .repartition(par)
  }

  /** Bloom-prefiltered benchmark decontamination. Same semantics as
    * [[TextQueries.decontaminateNgram]] (shared 5-grams vs a held-out
    * slice, here doc_id % 89 == 0) but the training side first probes a
    * broadcast [[BloomFilterAggregator]] bitset built over the eval grams,
    * and only surviving candidates reach the exact string join.
    *
    * Scale shape: the bitset is FIXED-SIZE (2^20 bits = 128 KiB here; size
    * m to ~10 bits/eval-gram at scale) regardless of training volume, the
    * probe is map-only over codegen'd built-ins (md5 → conv → shift/mask —
    * no UDF touches the 100 TB side), and the exact-verify join afterwards
    * carries only the ≈(matches + fp·non-matches) survivors instead of
    * every training gram. Bloom filters have no false negatives, so the
    * output is byte-identical to the unfiltered run — the oracle is the
    * EXACT SQL, making the gate itself prove the prefilter transparent.
    */
  def decontaminateBloom(spark: SparkSession, sfDir: String): DataFrame = {
    val numBits = 1 << 20
    val grams = toks(spark, sfDir)
      .select(col("doc_id"),
        explode(Dedup.ngramSetOfTokens(col("toks"), 5)).as("g"))
    val ev = grams.filter(col("doc_id") % 89 === 0).select(col("g")).distinct()
    val bloom = ev.agg(
      BloomFilterAggregator.bloomBuild(numBits)(col("g")).as("bloom"))
    val h1 = s"cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint) % $numBits"
    val h2 = s"cast(conv(substring(md5(g), 17, 15), 16, 10) as bigint) % $numBits"
    def probe(h: String): String =
      s"(shiftright(element_at(bloom, cast(($h) div 64 as int) + 1)," +
        s" cast(($h) % 64 as int)) & 1) = 1"
    grams.filter(col("doc_id") % 89 =!= 0)
      .crossJoin(broadcast(bloom))
      .filter(expr(probe(h1)) && expr(probe(h2)))
      .join(broadcast(ev), "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared_grams"))
      .orderBy(col("doc_id"))
  }

  val decontaminateBloomSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([array_to_string(t[i:i+4], ' ')
      |      for i in range(1, greatest(len(t) - 4, 1) + 1)])) AS g
      |  FROM toks),
      |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 89 = 0)
      |SELECT doc_id, count(DISTINCT g) AS n_shared_grams
      |FROM grams JOIN ev USING (g)
      |WHERE doc_id % 89 <> 0
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Fixed-point TF-IDF: top-5 terms per document. idf is the integer
    * quotient (N·10⁶) div df — monotone in 1/df like log(N/df) but exact
    * in 64-bit arithmetic, so ranks are bit-identical across engines
    * (libm log is NOT). Two shuffles (term stats, per-doc window), both
    * on natural keys; the df side joins on the term, which at corpus
    * scale is a shuffle join by design (the vocabulary grows with the
    * corpus — never assume it broadcasts).
    */
  def tfidfTopTerms(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = toks(spark, sfDir)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * expr("(n_docs * 1000000L) div df"))
      .withColumn("rnk", row_number().over(byDoc).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val tfidfTopTermsSql: String =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id,
      |          unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |        FROM documents)
      |  GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf.tf, df.df,
      |    tf.tf * ((n_docs * 1000000) // df.df) AS score,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY tf.tf * ((n_docs * 1000000) // df.df) DESC,
      |               term) AS BIGINT) AS rnk
      |  FROM tf JOIN df USING (term), n)
      |SELECT doc_id, term, tf, df, score, rnk
      |FROM scored WHERE rnk <= 5
      |ORDER BY doc_id, rnk""".stripMargin

  /** Passage-level duplication: chunk every document into consecutive
    * 4-token pieces (the whitespace-token analog of paragraph/passage
    * dedup — the testdata has no newlines) and surface chunks recurring
    * across documents. One explode + one groupBy on the chunk text; at
    * scale the groupBy key would be the chunk's 64-bit hash with the text
    * carried as min() payload, but the shape is identical.
    */
  def dedupChunks(spark: SparkSession, sfDir: String): DataFrame =
    toks(spark, sfDir)
      .filter(size(col("toks")) >= 4)
      .select(col("doc_id"),
        // `div`, not `/` — Spark's `/` on integers is double division
        explode(transform(
          expr("sequence(0, (size(toks) div 4) - 1)"),
          i => concat_ws(" ", slice(col("toks"), i * 4 + 1, lit(4)))))
          .as("chunk"))
      .groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") > 1)
      .orderBy(col("n_occurrences").desc, col("n_docs").desc, col("chunk"))
      .limit(200)

  val dedupChunksSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |chunks AS (
      |  SELECT doc_id,
      |    unnest([array_to_string(t[i*4+1 : i*4+4], ' ')
      |            for i in range(0, len(t) // 4)]) AS chunk
      |  FROM toks WHERE len(t) >= 4)
      |SELECT chunk, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
      |FROM chunks
      |GROUP BY chunk
      |HAVING count(DISTINCT doc_id) > 1
      |ORDER BY n_occurrences DESC, n_docs DESC, chunk
      |LIMIT 200""".stripMargin

  /** Deterministic weighted sampling (exponential-race analog): each
    * document races with priority hash60(doc_id) div n_chars — a longer
    * document divides the uniform 60-bit key by a larger weight, so its
    * expected priority is proportionally smaller, and the k smallest win
    * ≈ weight-proportional sampling. Pure integer arithmetic (the
    * textbook u^(1/w) key needs a transcendental), replayable on any
    * engine, and map-only + top-k (TakeOrderedAndProject) — no shuffle of
    * the corpus at any scale.
    */
  def sampleWeighted(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)" +
          " div n_chars").as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(50)

  val sampleWeightedSql: String =
    """SELECT doc_id, n_chars,
      |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT // n_chars
      |    AS priority
      |FROM documents
      |ORDER BY priority, doc_id
      |LIMIT 50""".stripMargin

  /** Language-ID confusion matrix: the n-gram-marker classifier
    * ([[TextFunctions.langId]]) evaluated against the labeled `lang`
    * column — per (actual, predicted) counts plus per-actual-language
    * accuracy (a ratio of identical longs, cross-engine exact). The
    * standard model-eval companion to the langid scorer: one map-only
    * classification pass, one tiny groupBy.
    */
  def langidConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("predicted"))
    val cells = docs.groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    val totals = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"),
        sum(when(col("lang") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
    cells.join(totals, "lang")
      .select(col("lang"), col("predicted"), col("n"),
        (col("n_correct").cast("double") / col("n_lang").cast("double"))
          .as("lang_accuracy"))
      .orderBy(col("lang"), col("predicted"))
  }

  val langidConfusionSql: String = {
    val marker = Seq("en", "es", "de", "fr").map { l =>
      val ms = TextFunctions.langMarkers(l).map(s => s"'$s'").mkString(", ")
      l -> s"len(list_filter(t, x -> list_contains([$ms], x)))"
    }.toMap
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    ${marker("en")} AS hit_en, ${marker("es")} AS hit_es,
       |    ${marker("de")} AS hit_de, ${marker("fr")} AS hit_fr
       |  FROM (SELECT doc_id, lang,
       |          regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |        FROM documents)),
       |pred AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN greatest(hit_en, hit_es, hit_de, hit_fr) = 0 THEN 'und'
       |         WHEN hit_en = greatest(hit_en, hit_es, hit_de, hit_fr) THEN 'en'
       |         WHEN hit_es = greatest(hit_en, hit_es, hit_de, hit_fr) THEN 'es'
       |         WHEN hit_de = greatest(hit_en, hit_es, hit_de, hit_fr) THEN 'de'
       |         ELSE 'fr' END AS predicted
       |  FROM scored),
       |cells AS (
       |  SELECT lang, predicted, count(*) AS n FROM pred GROUP BY 1, 2),
       |totals AS (
       |  SELECT lang, count(*) AS n_lang,
       |    CAST(sum(CASE WHEN lang = predicted THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_correct
       |  FROM pred GROUP BY 1)
       |SELECT cells.lang, predicted, n,
       |  CAST(n_correct AS DOUBLE) / CAST(n_lang AS DOUBLE) AS lang_accuracy
       |FROM cells JOIN totals ON cells.lang = totals.lang
       |ORDER BY cells.lang, predicted""".stripMargin
  }

  /** Trigram language-model count table: every consecutive 3-token window
    * (NOT distinct — LM counts are occurrence counts), aggregated
    * corpus-wide with document frequencies, top 200. The explode→groupBy
    * pair is the canonical count-table build; at 100 TB the only change
    * is hash-keyed grams and a count cutoff pushed into a partial-agg
    * HAVING.
    */
  def ngramLmCounts(spark: SparkSession, sfDir: String): DataFrame =
    toks(spark, sfDir)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(col("toks")) - 2),
          i => concat_ws(" ", slice(col("toks"), i, lit(3))))).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("gram"))
      .limit(200)

  val ngramLmCountsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |    unnest([array_to_string(t[i:i+2], ' ')
      |            for i in range(1, len(t) - 1)]) AS gram
      |  FROM toks WHERE len(t) >= 3)
      |SELECT gram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      |FROM grams
      |GROUP BY gram
      |ORDER BY n DESC, gram
      |LIMIT 200""".stripMargin
}
