package graft.queries

import graft.Checkpoints.StableCheckpoint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sim.Similarity
import graft.text.Dedup

/** Gated similarity-search queries over `embeddings` (vec_id, embedding
  * float[64], label). Cosine math is sequential-double in both engines
  * (verified: DuckDB `list_dot_product` ≡ Spark left-fold), similarities
  * are rounded to 6 decimals before any rank/filter so cross-engine
  * ordering is stable.
  */
object SimQueries {

  private val Dim = 64
  private val LshBits = 8

  /** The shared DuckDB literal for the LSH bucket expression (one CASE
    * term per hyperplane bit) — a single generator so every oracle uses
    * the identical bucket definition.
    */
  private def lshBitTermsSql: String =
    Similarity.hyperplaneWeights(LshBits, Dim).zipWithIndex.map {
      case (w, i) =>
        val arr = w.mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(e, CAST($arr AS DOUBLE[])) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  /** The shared semantic edge set (LSH bucket candidates verified at
    * cosine ≥ 0.25) that `dedup_semantic_components`, the DBSCAN triage
    * and the modularity eval all claim to operate on — ONE definition so
    * a threshold or rounding change cannot silently diverge them.
    * Emits (id_a, la, id_b, lb); label columns are free to drop.
    */
  private def semanticPairs(spark: SparkSession, sfDir: String): DataFrame = {
    Similarity.registerCosine(spark)
    val v = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        Similarity.toDoubleVec(col("embedding")).as("e"))
      .withColumn("bucket", Similarity.lshBucket(col("e"), LshBits, Dim))
      .stableCheckpoint() // both self-join sides read stored partitions
    v.toDF("id_a", "la", "e_a", "bucket")
      .join(v.toDF("id_b", "lb", "e_b", "bucket"), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(Similarity.cosine(col("e_a"), col("e_b")), 6))
      .filter(col("sim") >= expr("cast(0.25 as double)"))
      .select(col("id_a"), col("la"), col("id_b"), col("lb"))
  }

  /** Exact brute-force top-5 neighbors for the first 20 vectors. */
  def simTopKBruteForce(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.bruteForceTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < 20), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val simTopKBruteForceSql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
      |    round(list_dot_product(q.e, c.e)
      |          / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6) AS sim
      |  FROM v q JOIN v c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
      |SELECT query_id, rank, corpus_id, sim FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY sim DESC, corpus_id) AS rank
      |  FROM scored)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Embedding-cosine near-dup pairs, blocked by label. */
  def simNearDupCosine(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark; Similarity.registerCosine(spark2)
    val v = Tables.embeddings(spark, sfDir).select(
      col("label"), col("vec_id"),
      Similarity.toDoubleVec(col("embedding")).as("e"))
    val a = v.toDF("label", "id_a", "e_a")
    val b = v.toDF("label", "id_b", "e_b")
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(Similarity.cosine(col("e_a"), col("e_b")), 6))
      .filter(col("sim") > 0.3)
      .select(col("label"), col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("label"), col("id_a"), col("id_b"))
  }

  val simNearDupCosineSql: String =
    """WITH v AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
      |SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_dot_product(a.e, b.e)
      |        / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS sim
      |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_dot_product(a.e, b.e)
      |        / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) > 0.3
      |ORDER BY label, id_a, id_b""".stripMargin

  /** Bucketed (IVF-style) approximate top-3: the full ANN scale path —
    * LSH bucket assignment, bucket-equijoin candidate generation, exact
    * rank within the bucket — oracle-checked end to end.
    */
  def simLshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.lshTopK(corpus = emb,
        queries = emb.filter(col("vec_id") < 20), k = 3,
        nBits = LshBits, dim = Dim)
      .orderBy(col("query_id"), col("rank"))
  }

  val simLshTopKSql: String = {
    val bitTerms = lshBitTermsSql
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e, CAST($bitTerms AS BIGINT) AS bucket FROM v),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |    round(list_dot_product(q.e, c.e)
       |          / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6) AS sim
       |  FROM b q JOIN b c ON q.bucket = c.bucket
       |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |SELECT query_id, rank, corpus_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY sim DESC, corpus_id) AS rank
       |  FROM scored)
       |WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Multi-probe LSH top-3: queries probe their home bucket plus all 8
    * Hamming-1 neighbors — the recall lever over [[simLshTopK]] without
    * extra tables; only the tiny query side expands ×9.
    */
  def simLshMultiProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.lshTopKMultiProbe(corpus = emb,
        queries = emb.filter(col("vec_id") < 20), k = 3,
        nBits = LshBits, dim = Dim)
      .orderBy(col("query_id"), col("rank"))
  }

  val simLshMultiProbeSql: String = {
    val bitTerms = lshBitTermsSql
    val flips = (0 until LshBits).map(i => s"xor(home_bucket, ${1L << i})")
      .mkString("[", ", ", ", home_bucket]")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e, CAST($bitTerms AS BIGINT) AS home_bucket FROM v),
       |probes AS (
       |  SELECT vec_id, e, unnest($flips) AS bucket
       |  FROM b WHERE vec_id < 20),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |    round(list_dot_product(q.e, c.e)
       |          / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6) AS sim
       |  FROM probes q JOIN b c ON q.bucket = c.home_bucket
       |  WHERE c.vec_id <> q.vec_id)
       |SELECT query_id, rank, corpus_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY sim DESC, corpus_id) AS rank
       |  FROM scored)
       |WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  /** LSH bucket histogram (8-bit random-hyperplane signatures): the
    * map-only bucketing step of the ANN scale path, fully oracle-checked.
    */
  def simLshBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    Similarity.registerCosine(spark)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        Similarity.lshBucket(Similarity.toDoubleVec(col("embedding")),
          LshBits, Dim).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"),
        countDistinct(col("label")).as("n_labels"),
        min(col("vec_id")).as("min_vec_id"))
      .orderBy(col("bucket"))
  }

  /** Semantic dedup: duplicate CLUSTERS in embedding space — the step an
    * LLM data pipeline runs after lexical dedup (MinHash/SimHash find
    * copies; this finds paraphrases). Composes the two existing scale
    * paths end-to-end: LSH bucketing generates candidate pairs (bucket
    * equi-join, never all-pairs n²), exact cosine ≥ 0.25 verifies them,
    * and min-label propagation ([[graft.text.Dedup.connectedComponents]])
    * closes pairs into clusters. At 100 TB every stage is bounded: the
    * self-join keys on the 2^8-bucket space (skew = bucket occupancy,
    * tunable via nBits), the pair set carries only (id, id), and each CC
    * iteration is one shuffle of (id, label).
    */
  def dedupSemanticComponents(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = semanticPairs(spark, sfDir).select(col("id_a"), col("id_b"))
    Dedup.connectedComponents(pairs)
      .select(col("src").as("vec_id"), col("lbl").as("component"))
      .orderBy(col("vec_id"))
  }

  val dedupSemanticComponentsSql: String = {
    val bitTerms = lshBitTermsSql
    s"""WITH RECURSIVE v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e, CAST($bitTerms AS BIGINT) AS bucket FROM v),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       |  WHERE round(list_dot_product(a.e, b2.e)
       |        / (sqrt(list_dot_product(a.e, a.e))
       |           * sqrt(list_dot_product(b2.e, b2.e))), 6)
       |    >= CAST(0.25 AS DOUBLE)),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(src, lbl) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
       |  UNION
       |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src)
       |SELECT src AS vec_id, min(lbl) AS component
       |FROM reach
       |GROUP BY src
       |ORDER BY vec_id""".stripMargin
  }

  /** ANN quality audit: recall@3 of the single-probe LSH path against
    * the exact brute-force top-3, per query — the metric that decides
    * whether an ANN index is production-ready, computed inside the
    * engine (no external eval harness). Both sides tie-break
    * deterministically (sim rounded to 6, then corpus_id), so recall is
    * exact and gate-able. Scale: the expensive side is the exact top-k,
    * which at 100 TB runs over a SAMPLE of queries (here: 20) — the
    * standard recall-estimation protocol; the LSH side is the production
    * bucket-join path already gated by `sim_lsh_topk`.
    */
  def annRecallAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(corpus = emb, queries = queries, k = 3)
      .select(col("query_id"), col("corpus_id"))
    val approx = Similarity.lshTopK(corpus = emb, queries = queries, k = 3,
        nBits = LshBits, dim = Dim)
      .select(col("query_id"), col("corpus_id"))
    val matched = exact.join(approx, Seq("query_id", "corpus_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_match"))
    queries.select(col("vec_id").as("query_id"))
      .join(matched, Seq("query_id"), "left")
      .withColumn("n_match", coalesce(col("n_match"), lit(0L)))
      .withColumn("recall_at_3",
        col("n_match").cast("double") / expr("cast(3 as double)"))
      .select(col("query_id"), col("n_match"), col("recall_at_3"))
      .orderBy(col("query_id"))
  }

  val annRecallAuditSql: String = {
    val bitTerms = lshBitTermsSql
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e, CAST($bitTerms AS BIGINT) AS bucket FROM v),
       |exact AS (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round(list_dot_product(q.e, c.e)
       |              / (sqrt(list_dot_product(q.e, q.e))
       |                 * sqrt(list_dot_product(c.e, c.e))), 6) DESC,
       |        c.vec_id) AS rank
       |    FROM v q JOIN v c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |  WHERE rank <= 3),
       |approx AS (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round(list_dot_product(q.e, c.e)
       |              / (sqrt(list_dot_product(q.e, q.e))
       |                 * sqrt(list_dot_product(c.e, c.e))), 6) DESC,
       |        c.vec_id) AS rank
       |    FROM b q JOIN b c ON q.bucket = c.bucket
       |    WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |  WHERE rank <= 3),
       |m AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_match
       |  FROM exact JOIN approx USING (query_id, corpus_id)
       |  GROUP BY query_id)
       |SELECT q.vec_id AS query_id,
       |  coalesce(m.n_match, 0) AS n_match,
       |  CAST(coalesce(m.n_match, 0) AS DOUBLE) / CAST(3 AS DOUBLE)
       |    AS recall_at_3
       |FROM (SELECT vec_id FROM v WHERE vec_id < 20) q
       |LEFT JOIN m ON m.query_id = q.vec_id
       |ORDER BY query_id""".stripMargin
  }

  /** Matryoshka truncation audit: recall@3 of brute-force search over
    * HALF-dimension prefixes (slice 1..32 of 64) against the full-dim
    * exact top-3, per query — the measurement behind shipping truncated
    * embeddings (half the storage and FLOPs per probe at 100 TB; this
    * query prices the recall cost). Same deterministic tie-break
    * protocol as [[annRecallAudit]] (cosine rounded to 6, then
    * corpus_id), same sampled-query scale shape.
    */
  def embedTruncationRecall(spark: SparkSession, sfDir: String): DataFrame = {
    Similarity.registerCosine(spark)
    val half = Dim / 2
    val v = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("e"))
      .withColumn("t", expr(s"slice(e, 1, $half)"))
      .stableCheckpoint() // four self-join sides read stored partitions
    def top3(vecCol: String): DataFrame = {
      val q = v.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col(vecCol).as("qv"))
      val c = v.select(col("vec_id").as("corpus_id"), col(vecCol).as("cv"))
      q.join(c, col("corpus_id") =!= col("query_id"))
        .withColumn("sim", round(Similarity.cosine(col("qv"), col("cv")), 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("sim").desc, col("corpus_id"))))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("corpus_id"))
    }
    val matched = top3("e").join(top3("t"), Seq("query_id", "corpus_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_match"))
    v.filter(col("vec_id") < 20).select(col("vec_id").as("query_id"))
      .join(matched, Seq("query_id"), "left")
      .withColumn("n_match", coalesce(col("n_match"), lit(0L)))
      .withColumn("recall_at_3",
        col("n_match").cast("double") / expr("cast(3 as double)"))
      .select(col("query_id"), col("n_match"), col("recall_at_3"))
      .orderBy(col("query_id"))
  }

  val embedTruncationRecallSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    CAST(embedding AS DOUBLE[])[1:${Dim / 2}] AS t
       |  FROM embeddings),
       |full3 AS (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round(list_dot_product(q.e, c.e)
       |              / (sqrt(list_dot_product(q.e, q.e))
       |                 * sqrt(list_dot_product(c.e, c.e))), 6) DESC,
       |        c.vec_id) AS rank
       |    FROM v q JOIN v c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |  WHERE rank <= 3),
       |trunc3 AS (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round(list_dot_product(q.t, c.t)
       |              / (sqrt(list_dot_product(q.t, q.t))
       |                 * sqrt(list_dot_product(c.t, c.t))), 6) DESC,
       |        c.vec_id) AS rank
       |    FROM v q JOIN v c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |  WHERE rank <= 3),
       |m AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_match
       |  FROM full3 JOIN trunc3 USING (query_id, corpus_id)
       |  GROUP BY query_id)
       |SELECT q.vec_id AS query_id,
       |  coalesce(m.n_match, 0) AS n_match,
       |  CAST(coalesce(m.n_match, 0) AS DOUBLE) / CAST(3 AS DOUBLE)
       |    AS recall_at_3
       |FROM (SELECT vec_id FROM v WHERE vec_id < 20) q
       |LEFT JOIN m ON m.query_id = q.vec_id
       |ORDER BY query_id""".stripMargin

  /** Contrastive hard-negative mining: pairs that COLLIDE in LSH space
    * yet are dissimilar (cosine < 0.1) — exactly the negatives a
    * contrastive embedding trainer wants (hash-confusable, semantically
    * far), and the dual of [[dedupSemanticComponents]] (same candidate
    * generation, opposite filter). Never all-pairs: the bucket equi-join
    * bounds candidates by bucket occupancy, the mining filter is a
    * map-side comparison on the joined rows, and the output carries only
    * (bucket, id, id, sim).
    */
  def hardNegativePairs(spark: SparkSession, sfDir: String): DataFrame = {
    Similarity.registerCosine(spark)
    val v = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("e"))
      .withColumn("bucket", Similarity.lshBucket(col("e"), LshBits, Dim))
      .stableCheckpoint() // both self-join sides read stored partitions
    v.toDF("id_a", "e_a", "bucket")
      .join(v.toDF("id_b", "e_b", "bucket"), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(Similarity.cosine(col("e_a"), col("e_b")), 6))
      .filter(col("sim") < expr("cast(0.1 as double)"))
      .select(col("bucket"), col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("bucket"), col("id_a"), col("id_b"))
  }

  val hardNegativePairsSql: String = {
    val bitTerms = lshBitTermsSql
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e, CAST($bitTerms AS BIGINT) AS bucket FROM v)
       |SELECT a.bucket, a.vec_id AS id_a, b2.vec_id AS id_b,
       |  round(list_dot_product(a.e, b2.e)
       |        / (sqrt(list_dot_product(a.e, a.e))
       |           * sqrt(list_dot_product(b2.e, b2.e))), 6) AS sim
       |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       |WHERE round(list_dot_product(a.e, b2.e)
       |      / (sqrt(list_dot_product(a.e, a.e))
       |         * sqrt(list_dot_product(b2.e, b2.e))), 6)
       |  < CAST(0.1 AS DOUBLE)
       |ORDER BY a.bucket, id_a, id_b""".stripMargin
  }

  /** Oracle generated with the SAME Scala-computed hyperplane weights
    * embedded as literal DOUBLE[] arrays.
    */
  val simLshBucketsSql: String = {
    val bitTerms = lshBitTermsSql
    s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |bucketed AS (SELECT vec_id, label, CAST($bitTerms AS BIGINT) AS bucket FROM v)
       |SELECT bucket, count(*) AS n_vectors,
       |  count(DISTINCT label) AS n_labels, min(vec_id) AS min_vec_id
       |FROM bucketed
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin
  }

  /** DBSCAN-style density classification of the embedding table:
    * core (≥ 3 neighbors at cosine ≥ 0.25), border (adjacent to a core
    * point but not core), noise (the rest) — the density-clustering
    * triage behind outlier-aware semantic dedup. Neighbor edges reuse
    * the `dedup_semantic_components` candidate machinery (LSH bucket
    * equi-join + exact cosine verify — never all-pairs; note: like that
    * query, the neighborhood is the IN-BUCKET one, the documented LSH
    * approximation). Degrees and the core-adjacency check are keyed
    * aggregations/semi-joins; output is the 3-row class histogram.
    */
  def dbscanCorePoints(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = semanticPairs(spark, sfDir)
      .select(col("id_a"), col("id_b"))
      .stableCheckpoint() // degrees + adjacency probes below
    val adj = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val classified = Tables.embeddings(spark, sfDir).select(col("vec_id"))
      .join(deg.toDF("vec_id", "deg"), Seq("vec_id"), "left")
      .withColumn("deg", coalesce(col("deg"), lit(0L)))
    val core = classified.filter(col("deg") >= 3).select(col("vec_id"))
    // border: non-core with at least one CORE neighbor (semi join)
    val borderIds = adj.join(core.toDF("v"), Seq("v"), "left_semi")
      .select(col("u").as("vec_id")).distinct()
      .join(core, Seq("vec_id"), "left_anti")
    classified
      .join(core.withColumn("is_core", lit(true)), Seq("vec_id"), "left")
      .join(borderIds.withColumn("is_border", lit(true)), Seq("vec_id"),
        "left")
      .select(
        when(col("is_core"), "core")
          .when(col("is_border"), "border")
          .otherwise("noise").as("point_class"))
      .groupBy(col("point_class"))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("point_class"))
  }

  val dbscanCorePointsSql: String = {
    val bitTerms = lshBitTermsSql
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e, CAST($bitTerms AS BIGINT) AS bucket FROM v),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       |  WHERE round(list_dot_product(a.e, b2.e)
       |        / (sqrt(list_dot_product(a.e, a.e))
       |           * sqrt(list_dot_product(b2.e, b2.e))), 6)
       |    >= CAST(0.25 AS DOUBLE)),
       |adj AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
       |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj
       |  GROUP BY u),
       |core AS (SELECT u AS vec_id FROM deg WHERE deg >= 3),
       |border AS (
       |  SELECT DISTINCT adj.u AS vec_id
       |  FROM adj JOIN core c ON adj.v = c.vec_id
       |  WHERE adj.u NOT IN (SELECT vec_id FROM core)),
       |cls AS (
       |  SELECT v.vec_id,
       |    CASE WHEN v.vec_id IN (SELECT vec_id FROM core) THEN 'core'
       |         WHEN v.vec_id IN (SELECT vec_id FROM border) THEN 'border'
       |         ELSE 'noise' END AS point_class
       |  FROM v)
       |SELECT point_class, CAST(count(*) AS BIGINT) AS n_vectors
       |FROM cls
       |GROUP BY point_class
       |ORDER BY point_class""".stripMargin
  }

  /** Label-noise scan: vectors whose LSH-bucket neighbors vote a
    * DIFFERENT majority label than their own — the standard candidate
    * list for mislabeled training data (kNN-disagreement, restricted to
    * the bucket neighborhood so the pairing stays an equi-join, never
    * all-pairs). Votes are integer counts; the per-vector majority is a
    * keyed rank-1 pick with deterministic ties (count DESC, label ASC);
    * the output aggregates disagreement per true label with the one
    * final rate division. Vectors alone in their bucket have no voters
    * and are excluded (both engines identically).
    */
  def labelNoiseScan(spark: SparkSession, sfDir: String): DataFrame = {
    Similarity.registerCosine(spark)
    val v = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        Similarity.lshBucket(Similarity.toDoubleVec(col("embedding")),
          LshBits, Dim).as("bucket"))
      .stableCheckpoint()
    // Numbered bucket repartition carrying the self-join (r13 ×100
    // sweep): the checkpointed (vec_id, label, bucket) relation is ~2 MB,
    // so AQE coalesced both join sides to 2 tasks — and the join OUTPUT
    // is the bucket² vote fan-out plus its partial aggregate, which then
    // ran 22 of the query's 23 s on 2 threads (writing 42 MB). Input
    // bytes say nothing about fan-out mass; the numbered count pins the
    // pair generation at full width.
    val par = spark.sparkContext.defaultParallelism
    val votes = v.toDF("vec_id", "own_label", "bucket")
      .repartition(par, col("bucket"))
      .join(v.select(col("vec_id").as("nbr_id"), col("label")
        .as("nbr_label"), col("bucket")), Seq("bucket"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .groupBy(col("vec_id"), col("own_label"), col("nbr_label"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cnt").desc, col("nbr_label"))
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("own_label").as("label"))
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("nbr_label") =!= col("own_label"), 1L).otherwise(0L))
          .as("n_disagree"))
      .select(col("label"), col("n_checked"), col("n_disagree"),
        (col("n_disagree").cast("double") / col("n_checked").cast("double"))
          .as("disagree_rate"))
      .orderBy(col("label"))
  }

  val labelNoiseScanSql: String = {
    val bitTerms = lshBitTermsSql
    s"""WITH v AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
       |  FROM embeddings),
       |b AS (SELECT vec_id, label, CAST($bitTerms AS BIGINT) AS bucket
       |  FROM v),
       |votes AS (
       |  SELECT a.vec_id, a.label AS own_label, n.label AS nbr_label,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM b a JOIN b n
       |    ON a.bucket = n.bucket AND a.vec_id <> n.vec_id
       |  GROUP BY a.vec_id, a.label, n.label),
       |pick AS (
       |  SELECT vec_id, own_label, nbr_label FROM (
       |    SELECT vec_id, own_label, nbr_label,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY cnt DESC, nbr_label) AS rn
       |    FROM votes)
       |  WHERE rn = 1)
       |SELECT own_label AS label, CAST(count(*) AS BIGINT) AS n_checked,
       |  CAST(sum(CASE WHEN nbr_label <> own_label THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_disagree,
       |  CAST(sum(CASE WHEN nbr_label <> own_label THEN 1 ELSE 0 END)
       |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS disagree_rate
       |FROM pick
       |GROUP BY own_label
       |ORDER BY label""".stripMargin
  }

  /** Newman modularity of the GROUND-TRUTH label partition on the
    * semantic-similarity graph — "do the labels actually correspond to
    * similarity communities?" as one exact number. Edges are the
    * `dedup_semantic_components` candidate pairs; with m edges, L_c
    * intra-community edges and d_c community degree sums, modularity is
    * `Q = Σ_c (4·m·L_c − d_c²) / (4m²)` — the numerator is exact
    * DECIMAL integer arithmetic (d_c² reaches ~10²⁴ at corpus scale),
    * the division happens ONCE at the end. Per-community rows carry the
    * integer ingredients; the verdict-style exactness means a labeling
    * or similarity regression shifts Q bit-visibly.
    */
  def labelModularity(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = semanticPairs(spark, sfDir)
      .stableCheckpoint() // m, L_c and d_c all derive from this edge set
    val m = pairs.agg(count(lit(1)).as("m"))
    val intra = pairs.filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("l_c"))
    val degSum = pairs.select(col("la").as("label"))
      .unionAll(pairs.select(col("lb").as("label")))
      .groupBy(col("label")).agg(count(lit(1)).as("d_c"))
    degSum.join(intra, Seq("label"), "left")
      .withColumn("l_c", coalesce(col("l_c"), lit(0L)))
      .crossJoin(broadcast(m))
      .select(col("label"), col("l_c"), col("d_c"), col("m"),
        ((lit(4) * col("m").cast("decimal(38,0)")
          * col("l_c").cast("decimal(38,0)")
          - col("d_c").cast("decimal(38,0)")
          * col("d_c").cast("decimal(38,0)")).cast("double") /
          (lit(4).cast("decimal(38,0)") * col("m").cast("decimal(38,0)")
            * col("m").cast("decimal(38,0)")).cast("double"))
          .as("q_contrib"))
      .orderBy(col("label"))
  }

  val labelModularitySql: String = {
    val bitTerms = lshBitTermsSql
    s"""WITH v AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
       |  FROM embeddings),
       |b AS (SELECT vec_id, label, e, CAST($bitTerms AS BIGINT) AS bucket
       |  FROM v),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, a.label AS la,
       |    b2.vec_id AS id_b, b2.label AS lb
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       |  WHERE round(list_dot_product(a.e, b2.e)
       |        / (sqrt(list_dot_product(a.e, a.e))
       |           * sqrt(list_dot_product(b2.e, b2.e))), 6)
       |    >= CAST(0.25 AS DOUBLE)),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
       |intra AS (
       |  SELECT la AS label, CAST(count(*) AS BIGINT) AS l_c
       |  FROM pairs WHERE la = lb GROUP BY la),
       |deg AS (
       |  SELECT label, CAST(count(*) AS BIGINT) AS d_c FROM (
       |    SELECT la AS label FROM pairs
       |    UNION ALL SELECT lb AS label FROM pairs)
       |  GROUP BY label)
       |SELECT deg.label, coalesce(intra.l_c, 0) AS l_c, deg.d_c, m.m,
       |  CAST(4 * CAST(m.m AS HUGEINT) * CAST(coalesce(intra.l_c, 0)
       |      AS HUGEINT)
       |    - CAST(deg.d_c AS HUGEINT) * CAST(deg.d_c AS HUGEINT)
       |    AS DOUBLE)
       |  / CAST(4 * CAST(m.m AS HUGEINT) * CAST(m.m AS HUGEINT) AS DOUBLE)
       |    AS q_contrib
       |FROM deg LEFT JOIN intra ON deg.label = intra.label, m
       |ORDER BY deg.label""".stripMargin
  }
}
