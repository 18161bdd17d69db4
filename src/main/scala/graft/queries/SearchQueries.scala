package graft.queries

import graft.Checkpoints.StableCheckpoint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sim.Similarity
import graft.text.TextFunctions

/** Hybrid retrieval: the lexical+vector fusion step a training-data
  * pipeline runs to mine hard examples or build eval sets. Lexical
  * candidates come from an inverted token index, vector candidates from
  * embedding cosine, and the two rankings fuse with Reciprocal Rank
  * Fusion — all rank arithmetic in integers (RRF contribution :=
  * 1e6 div (60 + rank)), so the fused scores are bit-identical across
  * engines.
  */
object SearchQueries {

  /** RRF over the first five documents as queries (doc_id/vec_id share
    * the id space at generation). Per query: top-10 lexical candidates by
    * shared-distinct-token count (inverted-index equi-join — work is
    * Σ posting², never |docs|²), top-10 vector candidates by exact cosine
    * (the 5-row query side broadcasts), fused score = Σ 1e6 div
    * (60 + rank) over whichever lists contain the candidate, top-5 kept.
    * Every rank is fully tiebroken (score desc, candidate id asc) and the
    * rank-filters plan as WindowGroupLimit partial top-k.
    */
  def rrfHybridSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val postings = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      // repartition RAW text first: tokenize is the map cost and would
      // otherwise run inside the one-partition scan stage
      .repartition(par)
      .select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("tok"))
      .stableCheckpoint() // both index sides read stored partitions
    val lexW = Window.partitionBy(col("q")).orderBy(col("shared").desc, col("c"))
    val lex = postings.toDF("q", "tok").filter(col("q") < 5)
      .join(postings.toDF("c", "tok"), Seq("tok"))
      .filter(col("q") =!= col("c"))
      .groupBy(col("q"), col("c")).agg(count(lit(1)).as("shared"))
      .withColumn("lrk", row_number().over(lexW).cast("long"))
      .filter(col("lrk") <= 10)
      .select(col("q"), col("c"), col("lrk"))

    Similarity.registerCosine(spark)
    val v = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("e"))
    val vecW = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("c"))
    val vec = v.toDF("c", "e_c")
      .join(broadcast(v.toDF("q", "e_q").filter(col("q") < 5)))
      .filter(col("q") =!= col("c"))
      .withColumn("sim", round(Similarity.cosine(col("e_q"), col("e_c")), 6))
      .withColumn("vrk", row_number().over(vecW).cast("long"))
      .filter(col("vrk") <= 10)
      .select(col("q"), col("c"), col("vrk"))

    val fusedW = Window.partitionBy(col("q")).orderBy(col("score").desc, col("c"))
    lex.join(vec, Seq("q", "c"), "full_outer")
      .select(col("q"), col("c"),
        (coalesce(expr("1000000L div (60 + lrk)"), lit(0L)) +
          coalesce(expr("1000000L div (60 + vrk)"), lit(0L))).as("score"))
      .withColumn("rrf_rank", row_number().over(fusedW).cast("long"))
      .filter(col("rrf_rank") <= 5)
      .select(col("q").as("query_id"), col("rrf_rank"),
        col("c").as("doc_id"), col("score").as("rrf_score"))
      .orderBy(col("query_id"), col("rrf_rank"))
  }

  val rrfHybridSearchSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')))
      |      AS tok
      |  FROM documents),
      |lexp AS (
      |  SELECT a.doc_id AS q, b.doc_id AS c, count(*) AS shared
      |  FROM toks a JOIN toks b ON a.tok = b.tok
      |  WHERE a.doc_id < 5 AND b.doc_id <> a.doc_id
      |  GROUP BY 1, 2),
      |lex AS (
      |  SELECT q, c, row_number() OVER (
      |    PARTITION BY q ORDER BY shared DESC, c) AS lrk
      |  FROM lexp),
      |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |vecp AS (
      |  SELECT a.vec_id AS q, b.vec_id AS c,
      |    round(list_dot_product(a.e, b.e)
      |      / (sqrt(list_dot_product(a.e, a.e))
      |         * sqrt(list_dot_product(b.e, b.e))), 6) AS sim
      |  FROM v a JOIN v b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
      |vec AS (
      |  SELECT q, c, row_number() OVER (
      |    PARTITION BY q ORDER BY sim DESC, c) AS vrk
      |  FROM vecp),
      |fused AS (
      |  SELECT COALESCE(l.q, vv.q) AS q, COALESCE(l.c, vv.c) AS c,
      |    COALESCE(1000000 // (60 + l.lrk), 0)
      |      + COALESCE(1000000 // (60 + vv.vrk), 0) AS score
      |  FROM (SELECT * FROM lex WHERE lrk <= 10) l
      |  FULL OUTER JOIN (SELECT * FROM vec WHERE vrk <= 10) vv
      |    ON l.q = vv.q AND l.c = vv.c),
      |ranked AS (
      |  SELECT q, c, score, row_number() OVER (
      |    PARTITION BY q ORDER BY score DESC, c) AS rrf_rank
      |  FROM fused)
      |SELECT q AS query_id, CAST(rrf_rank AS BIGINT) AS rrf_rank,
      |  c AS doc_id, CAST(score AS BIGINT) AS rrf_score
      |FROM ranked WHERE rrf_rank <= 5
      |ORDER BY query_id, rrf_rank""".stripMargin

  /** BM25 ranked retrieval (k1=1.2, b=0.75) over the inverted index, with
    * the repo's determinism discipline: the real BM25 idf is ln-based —
    * libm never crosses the gate — so idf is the fixed-point rarity ratio
    * (N·1e6 div df), the same substitution `tfidf_top_terms` gates; and
    * each (term, doc) contribution is computed as one double chain over
    * identical operands then ROUNDED TO AN INTEGER micro-point, so the
    * per-(query, doc) score is an exact long sum — reduction-order
    * independent where a raw double Σ would diverge between engines.
    * Shuffle profile: tf/df aggregations + the term-key probe join; the
    * top-10 rank filter is WindowGroupLimit partial top-k.
    */
  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .repartition(par)
    val postings = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .stableCheckpoint() // reused: df aggregation + probe join
    val stats = postings.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    val df = postings.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val qTerms = postings.filter(col("doc_id") < 5)
      .select(col("doc_id").as("q"), col("tok")).distinct()
    val w = Window.partitionBy(col("q")).orderBy(col("score").desc, col("c"))
    qTerms
      .join(postings.toDF("c", "dl", "tok", "tf"), Seq("tok"))
      .filter(col("q") =!= col("c"))
      .join(df, Seq("tok"))
      .crossJoin(broadcast(stats))
      // one double chain over identical operands, rounded to micro-points
      .withColumn("contrib", expr(
        "cast(round(cast((n_docs * 1000000L) div df as double)" +
          " * (cast(tf as double) * cast(2.2 as double))" +
          " / (cast(tf as double) + cast(1.2 as double)" +
          "    * (cast(0.25 as double) + cast(0.75 as double)" +
          "       * (cast(dl as double)" +
          "          / (cast(total_len as double) / cast(n_docs as double)))))" +
          ") as bigint)"))
      .groupBy(col("q"), col("c")).agg(sum(col("contrib")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("q").as("query_id"), col("rank"),
        col("c").as("doc_id"), col("score").as("bm25_micro"))
      .orderBy(col("query_id"), col("rank"))
  }

  val bm25TopKSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |postings AS (
      |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS tok
      |  FROM toks),
      |tfp AS (
      |  SELECT doc_id, dl, tok, count(*) AS tf
      |  FROM postings GROUP BY 1, 2, 3),
      |stats AS (
      |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len
      |  FROM (SELECT DISTINCT doc_id, dl FROM tfp)),
      |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tfp GROUP BY 1),
      |q AS (SELECT DISTINCT doc_id AS q, tok FROM tfp WHERE doc_id < 5),
      |scored AS (
      |  SELECT q.q, p.doc_id AS c,
      |    CAST(sum(CAST(round(CAST((n_docs * 1000000) // df.df AS DOUBLE)
      |      * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
      |      / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |         * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
      |            * (CAST(dl AS DOUBLE)
      |               / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
      |      ) AS BIGINT)) AS BIGINT) AS score
      |  FROM q
      |  JOIN tfp p ON p.tok = q.tok AND p.doc_id <> q.q
      |  JOIN df ON df.tok = q.tok
      |  CROSS JOIN stats
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT q, c, score, row_number() OVER (
      |    PARTITION BY q ORDER BY score DESC, c) AS rank
      |  FROM scored)
      |SELECT q AS query_id, CAST(rank AS BIGINT) AS rank, c AS doc_id,
      |  score AS bm25_micro
      |FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin
}
