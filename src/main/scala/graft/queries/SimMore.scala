package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sim.Similarity

/** Vector-pipeline operators beyond search: IVF-style centroid assignment
  * (the k-means E-step that builds an ANN index's inverted lists) and
  * L2-normalize + int8 scalar quantization (the compression step of a
  * vector-store ingest). Deterministic like the rest of the sim surface:
  * centroids are integer-weight vectors derived from md5 and embedded as
  * literals in the oracle SQL; all doubles come from identical operands.
  */
object SimMore {

  private val K = 8
  private val Dim = 64

  /** The K fixed centroids (integer components, reproducible). */
  private def centroids: Array[Array[Long]] =
    Similarity.hyperplaneWeights(K, Dim)

  /** Per-vector argmax-cosine assignment against the literal centroids:
    * (vec_id, e, centroid_id). Map-only — K fused-cosine evaluations per
    * row, no join, no shuffle. Ties break to the lowest centroid id via
    * array_position-on-max.
    */
  private def assignedVectors(spark: SparkSession, sfDir: String): DataFrame = {
    Similarity.registerCosine(spark)
    val sims: Column = array(centroids.toIndexedSeq.map { c =>
      val cCol = array(c.toIndexedSeq.map(v => lit(v.toDouble)): _*)
      round(Similarity.cosine(col("e"), cCol), 6)
    }: _*)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("e"))
      .withColumn("sims", sims)
      .withColumn("centroid_id",
        (array_position(col("sims"), array_max(col("sims"))) - 1).cast("long"))
  }

  /** Assignment (k-means E-step) aggregated into the inverted-list
    * histogram (count + smallest member per list); the only shuffle is the
    * final tiny groupBy.
    */
  def annCentroidAssign(spark: SparkSession, sfDir: String): DataFrame =
    assignedVectors(spark, sfDir)
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec_id"))
      .orderBy(col("centroid_id"))

  /** Centroid update (k-means M-step), completing one full Lloyd
    * iteration with the E-step above: per (cluster, component), the mean
    * of the member vectors' components in FIXED POINT — components are
    * quantized to 1e-9 (`round(x·1e9)` rounds half-away-from-zero
    * identically in both engines; a decimal cast would not — the engines
    * round the double's decimal expansion differently in the last place)
    * and summed as exact longs, so the sum is reduction-order independent
    * across any cluster size; the mean is then one division chain of
    * identical operands. Emitted long-form — one row per (centroid_id,
    * component) — which also keeps the gate free of raw list columns.
    * Shuffle profile: posexplode is map-side; one combiner-friendly
    * aggregation on (centroid_id, i).
    */
  def annCentroidUpdate(spark: SparkSession, sfDir: String): DataFrame =
    assignedVectors(spark, sfDir)
      .select(col("centroid_id"), posexplode(col("e")).as(Seq("i0", "x")))
      .groupBy(col("centroid_id"), (col("i0") + 1).cast("long").as("i"))
      .agg(sum(round(col("x") * 1e9).cast("long")).as("sum_q9"),
        count(lit(1)).as("n_members"))
      .select(col("centroid_id"), col("i"),
        (col("sum_q9").cast("double") / lit(1e9) / col("n_members"))
          .as("mean_component"),
        col("n_members"))
      .orderBy(col("centroid_id"), col("i"))

  /** Shared oracle CTE: per-vector sims + assignment. */
  private def assignedSqlCtes: String = {
    val simTerms = centroids.map { c =>
      val arr = c.mkString("[", ", ", "]")
      s"round(list_dot_product(e, CAST($arr AS DOUBLE[])) / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(CAST($arr AS DOUBLE[]), CAST($arr AS DOUBLE[])))), 6)"
    }.mkString("[", ",\n      ", "]")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |sims AS (
       |  SELECT vec_id, e, $simTerms AS sims FROM v),
       |assigned AS (
       |  SELECT vec_id, e,
       |    CAST(list_indexof(sims, list_max(sims)) - 1 AS BIGINT) AS centroid_id
       |  FROM sims)""".stripMargin
  }

  val annCentroidAssignSql: String =
    s"""$assignedSqlCtes
       |SELECT centroid_id,
       |  count(*) AS n_vectors, min(vec_id) AS min_vec_id
       |FROM assigned
       |GROUP BY 1
       |ORDER BY centroid_id""".stripMargin

  val annCentroidUpdateSql: String =
    s"""$assignedSqlCtes,
       |exploded AS (
       |  SELECT centroid_id, unnest(e) AS x,
       |    unnest(range(1, len(e) + 1)) AS i
       |  FROM assigned)
       |SELECT centroid_id, CAST(i AS BIGINT) AS i,
       |  CAST(CAST(sum(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE)
       |       / 1e9 / count(*) AS DOUBLE) AS mean_component,
       |  count(*) AS n_members
       |FROM exploded
       |GROUP BY centroid_id, i
       |ORDER BY centroid_id, i""".stripMargin

  /** Clustering inertia (the k-means objective): per centroid, the summed
    * cosine DISTANCE (1 − best-sim) of its members — the convergence /
    * quality metric that closes the Lloyd loop (E-step `annCentroidAssign`,
    * M-step `annCentroidUpdate`). Distances quantize to 1e-6 longs before
    * the sum (sims are already round(·,6), so this is exact re-gridding,
    * and the long sum is reduction-order free); the emitted doubles are
    * division chains of identical operands. Map-only + one tiny groupBy.
    */
  def annInertia(spark: SparkSession, sfDir: String): DataFrame =
    assignedVectors(spark, sfDir)
      .withColumn("d_q6",
        round((lit(1.0) - array_max(col("sims"))) * lit(1e6)).cast("long"))
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_members"), sum(col("d_q6")).as("inertia_q6"))
      .select(col("centroid_id"), col("n_members"), col("inertia_q6"),
        (col("inertia_q6").cast("double") / lit(1e6)).as("inertia"),
        (col("inertia_q6").cast("double") / lit(1e6)
          / col("n_members").cast("double")).as("mean_distance"))
      .orderBy(col("centroid_id"))

  val annInertiaSql: String =
    s"""$assignedSqlCtes,
       |d AS (
       |  SELECT CAST(list_indexof(sims, list_max(sims)) - 1 AS BIGINT)
       |           AS centroid_id,
       |    CAST(round((1.0 - list_max(sims)) * 1e6) AS BIGINT) AS d_q6
       |  FROM sims)
       |SELECT centroid_id, count(*) AS n_members,
       |  CAST(sum(d_q6) AS BIGINT) AS inertia_q6,
       |  CAST(CAST(sum(d_q6) AS BIGINT) AS DOUBLE) / 1e6 AS inertia,
       |  CAST(CAST(sum(d_q6) AS BIGINT) AS DOUBLE) / 1e6
       |    / CAST(count(*) AS DOUBLE) AS mean_distance
       |FROM d
       |GROUP BY centroid_id
       |ORDER BY centroid_id""".stripMargin

  /** L2-normalize + int8 scalar quantization: q_i = round(127·e_i/‖e‖).
    * Map-only compression pass; emits the quantized vector, its norm and
    * an exact integer checksum. Both engines divide identical doubles and
    * round half-away-from-zero, so the int8 codes agree exactly.
    */
  def embedQuantize(spark: SparkSession, sfDir: String): DataFrame =
    // orderedBelow, not a final orderBy: the norm + per-component
    // quantization HOFs must not re-run inside a range sample (r12
    // double-evaluation class, SortSampleLintSpec).
    QueryShapes.orderedBelow(Tables.embeddings(spark, sfDir), col("vec_id"))
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("e"))
      // raw_norm is projected once and referenced twice below — a lambda
      // embedding the dot-product expression would re-reduce the whole
      // vector per element (see graft.text.Dedup for the measured cost).
      .withColumn("raw_norm",
        sqrt(aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v)))
      .select(col("vec_id"), round(col("raw_norm"), 6).as("norm"),
        transform(col("e"),
          x => round(lit(127.0) * x / col("raw_norm")).cast("int")).as("q"))
      .select(col("vec_id"), col("norm"),
        // joined string rather than a raw list column: the engines' arrow
        // list types differ only in the inner field NAME, which would trip
        // schema-level compares; the codes themselves are identical.
        array_join(col("q"), ",").as("q_codes"),
        aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("checksum"))

  /** Johnson–Lindenstrauss random projection 64 → 16 dims: the standard
    * embedding-compression step before ANN indexing (distances preserved
    * within 1±ε). The projection matrix is 16 deterministic integer
    * hyperplanes ([[Similarity.hyperplaneWeights]], literals in the
    * oracle), each output component a fixed-order codegen'd
    * multiply-add chain — map-only, no shuffle, ~4× smaller vectors.
    * Components are emitted quantized to 1e-6 fixed point so the gate
    * compares exact longs.
    */
  def embedRandomProjection(spark: SparkSession, sfDir: String): DataFrame = {
    Similarity.registerCosine(spark)
    val w = Similarity.hyperplaneWeights(16, Dim)
    val projCols = w.zipWithIndex.map { case (row, j) =>
      // One fused DotProduct loop against a folded array literal replaces
      // the former unrolled 64-term multiply-add chain: identical strict
      // left-to-right accumulation (bit-for-bit), but 16 expression nodes
      // instead of ~1 000 — the plan itself was the cost (task-deser).
      val wCol = array(row.toIndexedSeq.map(v => lit(v.toDouble)): _*)
      val chain = Similarity.dot(col("e"), wCol)
      round(chain * lit(1e6)).cast("long").as(s"p$j")
    }
    // orderedBelow: 16 codegen'd 64-term multiply-add chains per row —
    // the projection must evaluate once, not inside a range sample.
    QueryShapes.orderedBelow(Tables.embeddings(spark, sfDir), col("vec_id"))
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("e"))
      .select(col("vec_id") +: projCols.toIndexedSeq: _*)
      .select(col("vec_id"),
        concat_ws(",", (0 until 16).map(j => col(s"p$j")): _*).as("proj_q6"),
        (0 until 16).map(j => col(s"p$j")).reduceLeft(_ + _).as("checksum"))
  }

  val embedRandomProjectionSql: String = {
    val w = Similarity.hyperplaneWeights(16, Dim)
    val comps = w.map { row =>
      val arr = row.mkString("[", ", ", "]")
      s"CAST(round(list_dot_product(e, CAST($arr AS DOUBLE[])) * 1000000) AS BIGINT)"
    }
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |p AS (SELECT vec_id, ${comps.zipWithIndex
        .map { case (c, j) => s"$c AS p$j" }.mkString(",\n    ")}
       |  FROM v)
       |SELECT vec_id,
       |  array_to_string([${(0 until 16).map(j => s"p$j").mkString(", ")}], ',')
       |    AS proj_q6,
       |  ${(0 until 16).map(j => s"p$j").mkString(" + ")} AS checksum
       |FROM p
       |ORDER BY vec_id""".stripMargin
  }

  val embedQuantizeSql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS raw_norm FROM v),
      |qz AS (SELECT vec_id, round(raw_norm, 6) AS norm,
      |         [CAST(round(127.0 * x / raw_norm) AS INTEGER) for x in e] AS q
      |       FROM n)
      |SELECT vec_id, norm,
      |  array_to_string(q, ',') AS q_codes,
      |  CAST(list_sum(q) AS BIGINT) AS checksum
      |FROM qz
      |ORDER BY vec_id""".stripMargin

  /** Per-label centroid components in FIXED-POINT arithmetic: each
    * embedding coordinate is floored to 2^20ths, summed exactly as
    * BIGINTs per (label, dim), and divided once at the end — the
    * class-prototype computation (mean embedding per label) made
    * reduction-order-proof. The naive float mean would hash-diverge
    * under any repartition; this is the pattern for EVERY
    * vector-averaging step at 100 TB (k-means M-step ships the same
    * trick in `ann_centroid_update`). One posexplode (map-side) + one
    * (label, dim) aggregation with map-side combine.
    */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim0", "v")))
      .select(col("label"), (col("dim0") + 1).cast("long").as("dim"),
        floor(col("v").cast("double") * lit(1048576L)).cast("long").as("fp"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("fp")).as("sum_fp"))
      .withColumn("centroid",
        col("sum_fp").cast("double")
          / (col("n") * lit(1048576L)).cast("double"))
      .select(col("label"), col("dim"), col("n"), col("sum_fp"),
        col("centroid"))
      .orderBy(col("label"), col("dim"))
  }

  val labelCentroidsSql: String =
    """WITH v AS (
      |  SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |comp AS (
      |  SELECT label, CAST(i AS BIGINT) AS dim,
      |    CAST(floor(e[CAST(i AS INTEGER)] * 1048576) AS BIGINT) AS fp
      |  FROM v, (SELECT unnest(range(1, 65)) AS i)),
      |s AS (
      |  SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(fp) AS BIGINT) AS sum_fp
      |  FROM comp GROUP BY label, dim)
      |SELECT label, dim, n, sum_fp,
      |  CAST(sum_fp AS DOUBLE) / CAST(n * 1048576 AS DOUBLE) AS centroid
      |FROM s
      |ORDER BY label, dim""".stripMargin

  // ------------------------------------------- PCA via power iteration

  /** Leading principal direction of the embedding table by TWO power
    * iterations over the Gram matrix — `v ← QᵀQ v` — carried out
    * ENTIRELY in integer arithmetic so the eigenvector hash-gates:
    * vectors quantize to q_d = round(64·e_d) (ints), the per-row scalar
    * q·v and the per-dim sums Σ_rows q_d·(q·v) are exact BIGINTs, and
    * between iterations v rescales to ≤1000 magnitude by integer
    * division (both engines truncate toward zero — verified DuckDB `//`
    * = Spark `div`). Shapes: each iteration is one map-side dot product
    * + one 64-group aggregation (posexplode → sum — the mergeable
    * matvec shape that holds at any scale); the 64-row v rides a
    * broadcast. Second-iteration products reach ~10²⁰ at 10¹² rows, so
    * that sum widens to DECIMAL. Output: the 64 integer loadings of the
    * (unnormalized) leading eigenvector estimate.
    */
  def pcaPowerIteration(spark: SparkSession, sfDir: String): DataFrame = {
    val q = transform(Similarity.toDoubleVec(col("embedding")),
      x => round(x * 64).cast("long"))
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), q.as("q"))
    // iteration 1: v0 = 1⃗, so q·v0 = Σ q_d
    val it1 = rows
      .withColumn("dot1", aggregate(col("q"), lit(0L), (acc, v) => acc + v))
      .select(posexplode(col("q")).as(Seq("d", "qd")), col("dot1"))
      .groupBy(col("d")).agg(sum(col("qd") * col("dot1")).as("w1"))
    val v1 = it1
      .crossJoin(broadcast(it1.agg(
        expr("max(abs(w1)) div 1000").as("s1"))))
      .select(col("d"), expr("w1 div (s1 + 1)").as("v1d"))
    // iteration 2: dot2 = q·v1 per row, then per-dim sums in DECIMAL
    val dot2 = rows
      .select(col("vec_id"), posexplode(col("q")).as(Seq("d", "qd")))
      .join(broadcast(v1), Seq("d"))
      .groupBy(col("vec_id")).agg(sum(col("qd") * col("v1d")).as("dot2"))
    val it2 = rows.join(dot2, Seq("vec_id"))
      .select(posexplode(col("q")).as(Seq("d", "qd")), col("dot2"))
      .groupBy(col("d"))
      .agg(sum(expr("cast(qd as decimal(38,0)) * cast(dot2 as decimal(38,0))"))
        .as("w2"))
    it2
      .crossJoin(broadcast(it2.agg(
        expr("max(abs(w2)) div 1000").as("s2"))))
      .select((col("d") + 1).cast("long").as("dim"),
        expr("cast(w2 div (s2 + 1) as long)").as("loading"))
      .orderBy(col("dim"))
  }

  val pcaPowerIterationSql: String =
    """WITH v AS (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(round(x * 64) AS BIGINT)) AS q
      |  FROM embeddings),
      |d1 AS (SELECT vec_id, q, list_sum(q) AS dot1 FROM v),
      |e1 AS (
      |  SELECT r.d, CAST(sum(d1.q[r.d] * d1.dot1) AS BIGINT) AS w1
      |  FROM d1, range(1, 65) r(d) GROUP BY r.d),
      |m1 AS (SELECT max(abs(w1)) // 1000 AS s1 FROM e1),
      |v1 AS (SELECT d, w1 // (s1 + 1) AS v1d FROM e1, m1),
      |d2 AS (
      |  SELECT d1.vec_id, CAST(sum(d1.q[v1.d] * v1.v1d) AS BIGINT) AS dot2
      |  FROM d1, v1 GROUP BY d1.vec_id),
      |e2 AS (
      |  SELECT r.d,
      |    sum(CAST(d1.q[r.d] AS HUGEINT) * CAST(d2.dot2 AS HUGEINT)) AS w2
      |  FROM d1 JOIN d2 USING (vec_id), range(1, 65) r(d) GROUP BY r.d),
      |m2 AS (SELECT max(abs(w2)) // 1000 AS s2 FROM e2)
      |SELECT CAST(d AS BIGINT) AS dim,
      |  CAST(w2 // (s2 + 1) AS BIGINT) AS loading
      |FROM e2, m2
      |ORDER BY dim""".stripMargin

  // ------------------------------------------------------ cluster purity

  /** Purity of the k-means assignment against the ground-truth labels —
    * the external clustering-quality eval (majority-label fraction per
    * cluster) run whenever labeled data exists. Reuses the literal
    * E-step assignment; one keyed join back to the label column, a
    * (cluster × label) aggregation, and a per-cluster rank-1 pick with
    * deterministic ties (count DESC, label ASC — keyed window, pushed as
    * WindowGroupLimit). Purity is the one final division.
    */
  def clusterPurity(spark: SparkSession, sfDir: String): DataFrame = {
    val lbl = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"))
    val counts = assignedVectors(spark, sfDir)
      .select(col("vec_id"), col("centroid_id"))
      .join(lbl, Seq("vec_id"))
      .groupBy(col("centroid_id"), col("label"))
      .agg(count(lit(1)).as("cnt"))
    // Totals as a re-aggregation of the (cluster × label) counts rather
    // than a second window over the ranked rows — keeps the rank filter
    // directly above its window so WindowGroupLimit pushes map-side.
    val totals = counts.groupBy(col("centroid_id"))
      .agg(sum(col("cnt")).as("n_vectors"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("centroid_id"))
      .orderBy(col("cnt").desc, col("label"))
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(totals, Seq("centroid_id"))
      .select(col("centroid_id"), col("n_vectors"),
        col("label").as("majority_label"), col("cnt").as("n_majority"),
        (col("cnt").cast("double") / col("n_vectors").cast("double"))
          .as("purity"))
      .orderBy(col("centroid_id"))
  }

  val clusterPuritySql: String =
    s"""$assignedSqlCtes,
       |cnt AS (
       |  SELECT a.centroid_id, emb.label, CAST(count(*) AS BIGINT) AS cnt
       |  FROM assigned a JOIN embeddings emb USING (vec_id)
       |  GROUP BY a.centroid_id, emb.label),
       |r AS (
       |  SELECT centroid_id, label, cnt,
       |    row_number() OVER (PARTITION BY centroid_id
       |      ORDER BY cnt DESC, label) AS rn,
       |    CAST(sum(cnt) OVER (PARTITION BY centroid_id) AS BIGINT)
       |      AS n_vectors
       |  FROM cnt)
       |SELECT centroid_id, n_vectors, label AS majority_label,
       |  cnt AS n_majority,
       |  CAST(cnt AS DOUBLE) / CAST(n_vectors AS DOUBLE) AS purity
       |FROM r WHERE rn = 1
       |ORDER BY centroid_id""".stripMargin

  // -------------------------------------------------- knn label accuracy

  /** Leave-one-out k-NN classification accuracy on the embedding table:
    * for a 50-query sample, predict each query's label by majority vote
    * of its 5 exact nearest neighbors (cosine, self excluded) and score
    * against the true label — the standard "are these embeddings any
    * good" eval. The expensive exact top-k runs over the broadcast
    * query SAMPLE (the recall-estimation protocol `ann_recall_audit`
    * uses); votes and the majority pick are integer counts with
    * deterministic ties (count DESC, label ASC); accuracy is the one
    * final division.
    */
  def knnLabelAccuracy(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 50)
    val lbl = emb.select(col("vec_id"), col("label"))
    val votes = Similarity.bruteForceTopK(corpus = emb, queries = queries,
        k = 5)
      .join(lbl.toDF("corpus_id", "nbr_label"), Seq("corpus_id"))
      .groupBy(col("query_id"), col("nbr_label"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cnt").desc, col("nbr_label"))
    val pred = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("nbr_label").as("predicted"))
    pred.join(lbl.toDF("query_id", "true_label"), Seq("query_id"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("predicted") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("n_queries"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_queries").cast("double"))
          .as("accuracy"))
  }

  val knnLabelAccuracySql: String =
    """WITH v AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings),
      |nn AS (
      |  SELECT query_id, corpus_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        round(list_dot_product(q.e, c.e)
      |              / (sqrt(list_dot_product(q.e, q.e))
      |                 * sqrt(list_dot_product(c.e, c.e))), 6) DESC,
      |        c.vec_id) AS rank
      |    FROM v q JOIN v c ON q.vec_id < 50 AND c.vec_id <> q.vec_id)
      |  WHERE rank <= 5),
      |votes AS (
      |  SELECT nn.query_id, c.label AS nbr_label,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM nn JOIN v c ON nn.corpus_id = c.vec_id
      |  GROUP BY nn.query_id, c.label),
      |pred AS (
      |  SELECT query_id, nbr_label AS predicted FROM (
      |    SELECT query_id, nbr_label, cnt,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY cnt DESC, nbr_label) AS rn
      |    FROM votes)
      |  WHERE rn = 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_queries,
      |  CAST(sum(CASE WHEN p.predicted = q.label THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_correct,
      |  CAST(sum(CASE WHEN p.predicted = q.label THEN 1 ELSE 0 END)
      |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
      |FROM pred p JOIN v q ON p.query_id = q.vec_id""".stripMargin
}
