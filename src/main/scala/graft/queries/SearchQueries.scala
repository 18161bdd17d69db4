package graft.queries

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
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .repartition(par)
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("tok"))
      .localCheckpoint() // both index sides read stored partitions
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
}
