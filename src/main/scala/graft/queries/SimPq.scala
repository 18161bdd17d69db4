package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Checkpoints.StableCheckpoint
import graft.sim.Similarity

/** Product quantization (PQ) + asymmetric distance computation (ADC) —
  * the compression/scoring pair behind IVF-PQ ANN indexes, completing the
  * similarity scale path (exact brute force → LSH buckets/multiprobe →
  * IVF centroids → PQ codes): at 100 TB the corpus lives as M-byte codes
  * (here 8 bytes/vector vs 256 bytes of floats) and a query scans codes
  * with a precomputed per-subspace lookup table — no float vector is ever
  * touched at query time.
  *
  * Determinism engineering: sub-codebooks are the integer
  * [[Similarity.hyperplaneWeights]] vectors (embedded as literals in the
  * oracle SQL), so (a) encoding distances are fixed-order double chains
  * over identical operands — argmin ties break to the lowest code in both
  * engines (first-index-of-min); (b) the QUERY is an integer vector too,
  * so the ADC lookup tables are exact integer literals computed at plan
  * time, and the emitted approximate distance is an exact LONG — the
  * entire PQ pipeline hash-matches the oracle with no float emitted.
  */
object SimPq {

  private val M = 8        // subspaces
  private val SubDim = 8   // dims per subspace (M * SubDim = 64)
  private val K = 8        // codes per subspace

  /** codebook(m)(k) = 8-dim integer centroid for code k of subspace m. */
  private def codebook: Array[Array[Array[Long]]] =
    Similarity.hyperplaneWeights(M * K, SubDim)
      .grouped(K).toArray

  /** Integer query vector (64-dim), distinct from every codebook row. */
  private def queryVec: Array[Long] =
    Similarity.hyperplaneWeights(M * K + 1, SubDim).last ++
      Similarity.hyperplaneWeights(M * K + 2, SubDim).last ++
      Similarity.hyperplaneWeights(M * K + 3, SubDim).last ++
      Similarity.hyperplaneWeights(M * K + 4, SubDim).last ++
      Similarity.hyperplaneWeights(M * K + 5, SubDim).last ++
      Similarity.hyperplaneWeights(M * K + 6, SubDim).last ++
      Similarity.hyperplaneWeights(M * K + 7, SubDim).last ++
      Similarity.hyperplaneWeights(M * K + 8, SubDim).last

  /** ADC lookup table: table(m)(k) = ‖q_m − c_{m,k}‖² — exact integers
    * (both operands integral).
    */
  private def adcTable: Array[Array[Long]] = {
    val q = queryVec
    codebook.zipWithIndex.map { case (cents, m) =>
      cents.map { c =>
        (0 until SubDim).map { d =>
          val diff = q(m * SubDim + d) - c(d); diff * diff
        }.sum
      }
    }
  }

  /** Registers the codegen'd [[graft.functions.SqDistAt]] loop used for
    * every fixed-order distance in this file (idempotent).
    */
  private def registerFns(spark: SparkSession): Unit =
    graft.functions.FunctionRegistration.tempFunctionOnce(spark,
      "sq_dist_at", exprs => graft.functions.SqDistAt(exprs(0), exprs(1), exprs(2)))

  /** Centroid as a foldable array literal (ONE Literal node post-folding). */
  private def wLit(c: Array[Long]): Column =
    array(c.toIndexedSeq.map(v => lit(v.toDouble)): _*)

  /** Encoding distance ‖e_m − c‖²: the same strict left-to-right double
    * chain the oracle spells out, evaluated as one codegen'd loop
    * ([[graft.functions.SqDistAt]]) instead of an unrolled 8-term tree —
    * see the plan-weight rationale on that class.
    */
  private def encDist(m: Int, c: Array[Long]): Column =
    call_function("sq_dist_at", col("e"), wLit(c), lit(m * SubDim))

  def simPqAdc(spark: SparkSession, sfDir: String): DataFrame = {
    registerFns(spark)
    val cb = codebook
    val table = adcTable
    // per subspace: argmin code (ties → lowest k, first-index-of-min)
    val codeCols = (0 until M).map { m =>
      val dists = array(cb(m).map(c => encDist(m, c)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int").as(s"c$m")
    }
    val withCodes = Tables.embeddingsSpread(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("e"))
      .select(col("vec_id") +: codeCols: _*)
    // ADC: distance = Σ_m table_m[code_m] — exact long arithmetic
    val adc = (0 until M).map { m =>
      val lut = array(table(m).map(v => lit(v)): _*)
      element_at(lut, col(s"c$m") + 1)
    }.reduceLeft(_ + _)
    withCodes
      .withColumn("approx_dist", adc)
      .withColumn("codes",
        concat_ws(",", (0 until M).map(m => col(s"c$m")): _*))
      .select(col("vec_id"), col("codes"), col("approx_dist"))
      .orderBy(col("approx_dist"), col("vec_id"))
      .limit(20)
  }

  val simPqAdcSql: String = {
    val cb = codebook
    val table = adcTable
    def encDistSql(m: Int, c: Array[Long]): String =
      (0 until SubDim).map { d =>
        val i = m * SubDim + d + 1
        s"(e[$i] - ${c(d)}.0) * (e[$i] - ${c(d)}.0)"
      }.mkString(" + ")
    val codeExprs = (0 until M).map { m =>
      val lst = cb(m).map(c => encDistSql(m, c)).mkString("[", ",\n      ", "]")
      s"CAST(list_indexof($lst, list_min($lst)) - 1 AS INTEGER) AS c$m"
    }.mkString(",\n    ")
    val adcExpr = (0 until M).map { m =>
      val lut = table(m).mkString("[", ", ", "]")
      s"$lut[c$m + 1]"
    }.mkString(" + ")
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |coded AS (
       |  SELECT vec_id,
       |    $codeExprs
       |  FROM v)
       |SELECT vec_id,
       |  array_to_string([c0, c1, c2, c3, c4, c5, c6, c7], ',') AS codes,
       |  CAST($adcExpr AS BIGINT) AS approx_dist
       |FROM coded
       |ORDER BY approx_dist, vec_id
       |LIMIT 20""".stripMargin
  }

  // ---- IVF-PQ: coarse routing + in-list ADC, the full FAISS-style shape ----

  private val NLists = 8

  /** Coarse (IVF) centroids: 8 integer 64-dim vectors — literals in both
    * engines, like every codebook in this file.
    */
  private def coarseCentroids: Array[Array[Long]] =
    Similarity.hyperplaneWeights(NLists, M * SubDim)

  /** The query's coarse list: argmin integer L2 against the coarse
    * centroids — pure integer constants (integer query × integer
    * centroids), so the probe id embeds as the same literal in both
    * engines; ties to the lowest list id.
    */
  private def queryCoarseDists: Array[Long] = {
    val q = queryVec
    coarseCentroids.map { c =>
      (0 until M * SubDim).map { d =>
        val diff = q(d) - c(d); diff * diff
      }.sum
    }
  }

  /** ‖e − C_j‖² over the full 64 dims — same fixed-order chain, one
    * [[graft.functions.SqDistAt]] loop per centroid.
    */
  private def coarseDist(c: Array[Long]): Column =
    call_function("sq_dist_at", col("e"), wLit(c), lit(0))

  /** IVF-PQ probe: every corpus vector routes to its nearest coarse
    * centroid (argmin fixed-order L2, ties → lowest list — map-only; at
    * cluster scale the list id IS the partition/bucket key, so a probe
    * touches one partition, not the corpus). The integer query probes
    * ONLY its own list (nprobe=1) and ADC-scores that list's 8-byte PQ
    * codes with the exact integer lookup tables — the end-to-end IVF-PQ
    * read path: coarse prune → code scan → integer ADC → top-10, no
    * float vector touched at query time.
    */
  def simIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    registerFns(spark)
    val cb = codebook
    val table = adcTable
    val qd = queryCoarseDists
    val probeList = qd.indexOf(qd.min) // exact integer argmin, lowest wins
    val cDists = array(coarseCentroids.map(coarseDist): _*)
    val codeCols = (0 until M).map { m =>
      val dists = array(cb(m).map(c => encDist(m, c)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int").as(s"c$m")
    }
    val adc = (0 until M).map { m =>
      val lut = array(table(m).map(v => lit(v)): _*)
      element_at(lut, col(s"c$m") + 1)
    }.reduceLeft(_ + _)
    Tables.embeddingsSpread(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("e"))
      .withColumn("list_id",
        (array_position(cDists, array_min(cDists)) - 1).cast("long"))
      .filter(col("list_id") === probeList)
      .select(col("vec_id") +: col("list_id") +: codeCols: _*)
      .withColumn("approx_dist", adc)
      .select(col("vec_id"), col("list_id"), col("approx_dist"))
      .orderBy(col("approx_dist"), col("vec_id"))
      .limit(10)
  }

  val simIvfPqSql: String = {
    val cb = codebook
    val table = adcTable
    val qd = queryCoarseDists
    val probeList = qd.indexOf(qd.min)
    def coarseDistSql(c: Array[Long]): String =
      (0 until M * SubDim).map { d =>
        s"(e[${d + 1}] - ${c(d)}.0) * (e[${d + 1}] - ${c(d)}.0)"
      }.mkString(" + ")
    val coarseList = coarseCentroids.map(coarseDistSql)
      .mkString("[", ",\n      ", "]")
    def encDistSql(m: Int, c: Array[Long]): String =
      (0 until SubDim).map { d =>
        val i = m * SubDim + d + 1
        s"(e[$i] - ${c(d)}.0) * (e[$i] - ${c(d)}.0)"
      }.mkString(" + ")
    val codeExprs = (0 until M).map { m =>
      val lst = cb(m).map(c => encDistSql(m, c)).mkString("[", ",\n      ", "]")
      s"CAST(list_indexof($lst, list_min($lst)) - 1 AS INTEGER) AS c$m"
    }.mkString(",\n    ")
    val adcExpr = (0 until M).map { m =>
      val lut = table(m).mkString("[", ", ", "]")
      s"$lut[c$m + 1]"
    }.mkString(" + ")
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |routed AS (
       |  SELECT vec_id, e,
       |    CAST(list_indexof($coarseList,
       |      list_min($coarseList)) - 1 AS BIGINT) AS list_id
       |  FROM v),
       |coded AS (
       |  SELECT vec_id, list_id,
       |    $codeExprs
       |  FROM routed WHERE list_id = $probeList)
       |SELECT vec_id, list_id, CAST($adcExpr AS BIGINT) AS approx_dist
       |FROM coded
       |ORDER BY approx_dist, vec_id
       |LIMIT 10""".stripMargin
  }

  // ---- nprobe sweep: the IVF recall/cost tuning curve ----------------

  /** nprobe order: lists ranked by the query's integer coarse distance
    * (ties → lowest list id) — compile-time constants, so the rank of
    * every list embeds as a literal array in both engines.
    */
  private def listRanks: Array[Int] = {
    val qd = queryCoarseDists
    val order = qd.zipWithIndex.sortBy { case (d, i) => (d, i) }.map(_._2)
    val ranks = new Array[Int](NLists)
    order.zipWithIndex.foreach { case (list, r) => ranks(list) = r }
    ranks
  }

  /** The recall@10-vs-cost curve an IVF deployment is tuned with:
    * for nprobe ∈ {1,2,4,8}, scan the nprobe coarse lists nearest the
    * query, ADC-score their PQ codes, and measure top-10 recall against
    * the EXACT full-scan ranking plus the candidate count actually
    * scanned. nprobe = 8 scans everything, so its recall gap is pure PQ
    * quantization error — the sweep separates routing loss from code
    * loss. Shapes: routing + coding is ONE map-only pass over the
    * corpus; the 4-row nprobe config and the 10-row exact top-k ride
    * broadcasts; per-nprobe top-10 is a keyed rank filter
    * (WindowGroupLimit). Every distance is a fixed-order double chain
    * over integer literals (tie-break on vec_id), so both engines rank
    * identically and the curve hash-gates.
    */
  def annNprobeSweep(spark: SparkSession, sfDir: String): DataFrame = {
    registerFns(spark)
    val cb = codebook
    val table = adcTable
    val ranks = listRanks
    val cDists = array(coarseCentroids.map(coarseDist): _*)
    val codeCols = (0 until M).map { m =>
      val dists = array(cb(m).map(c => encDist(m, c)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int").as(s"c$m")
    }
    val adc = (0 until M).map { m =>
      val lut = array(table(m).map(v => lit(v)): _*)
      element_at(lut, col(s"c$m") + 1)
    }.reduceLeft(_ + _)
    val q = queryVec
    val exactDist = call_function("sq_dist_at", col("e"), wLit(q), lit(0))
    val rankLut = array(ranks.map(r => lit(r)): _*)
    val scored = Tables.embeddingsSpread(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("e"))
      .withColumn("list_id",
        (array_position(cDists, array_min(cDists)) - 1).cast("int"))
      .withColumn("list_rank", element_at(rankLut, col("list_id") + 1))
      .withColumn("exact_dist", exactDist)
      .select(col("vec_id") +: col("list_rank") +: col("exact_dist") +:
        codeCols: _*)
      .withColumn("approx_dist", adc)
      .select(col("vec_id"), col("list_rank"), col("exact_dist"),
        col("approx_dist"))
      .stableCheckpoint() // one coding pass feeds exact top-k + all probes
    val exactTop = scored.orderBy(col("exact_dist"), col("vec_id"))
      .limit(10).select(col("vec_id"))
    val nprobes = spark.range(1).select(
      explode(typedLit(Seq(1, 2, 4, 8))).as("nprobe"))
    val cands = scored.crossJoin(broadcast(nprobes))
      .filter(col("list_rank") < col("nprobe"))
    val scanned = cands.groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_scanned"))
    val perProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("nprobe"))
      .orderBy(col("approx_dist"), col("vec_id"))
    val matches = cands
      .withColumn("rn", row_number().over(perProbe))
      .filter(col("rn") <= 10)
      .join(broadcast(exactTop), Seq("vec_id"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_match"))
    scanned.join(matches, Seq("nprobe"), "left")
      .withColumn("n_match", coalesce(col("n_match"), lit(0L)))
      .select(col("nprobe").cast("long").as("nprobe"), col("n_scanned"),
        col("n_match"),
        (col("n_match").cast("double") / expr("cast(10 as double)"))
          .as("recall_at_10"))
      .orderBy(col("nprobe"))
  }

  val annNprobeSweepSql: String = {
    val cb = codebook
    val table = adcTable
    val ranks = listRanks
    val q = queryVec
    def coarseDistSql(c: Array[Long]): String =
      (0 until M * SubDim).map { d =>
        s"(e[${d + 1}] - ${c(d)}.0) * (e[${d + 1}] - ${c(d)}.0)"
      }.mkString(" + ")
    val coarseList = coarseCentroids.map(coarseDistSql)
      .mkString("[", ",\n      ", "]")
    def encDistSql(m: Int, c: Array[Long]): String =
      (0 until SubDim).map { d =>
        val i = m * SubDim + d + 1
        s"(e[$i] - ${c(d)}.0) * (e[$i] - ${c(d)}.0)"
      }.mkString(" + ")
    val codeExprs = (0 until M).map { m =>
      val lst = cb(m).map(c => encDistSql(m, c)).mkString("[", ",\n      ", "]")
      s"CAST(list_indexof($lst, list_min($lst)) - 1 AS INTEGER) AS c$m"
    }.mkString(",\n    ")
    val adcExpr = (0 until M).map { m =>
      val lut = table(m).mkString("[", ", ", "]")
      s"$lut[c$m + 1]"
    }.mkString(" + ")
    val exactExpr = (0 until M * SubDim).map { d =>
      s"(e[${d + 1}] - ${q(d)}.0) * (e[${d + 1}] - ${q(d)}.0)"
    }.mkString(" + ")
    val rankLut = ranks.mkString("[", ", ", "]")
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |scored AS (
       |  SELECT vec_id,
       |    $rankLut[CAST(list_indexof($coarseList,
       |      list_min($coarseList)) AS INTEGER)] AS list_rank,
       |    $exactExpr AS exact_dist,
       |    $codeExprs
       |  FROM v),
       |adc AS (
       |  SELECT vec_id, list_rank, exact_dist,
       |    CAST($adcExpr AS BIGINT) AS approx_dist
       |  FROM scored),
       |exact_top AS (
       |  SELECT vec_id FROM adc ORDER BY exact_dist, vec_id LIMIT 10),
       |np AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
       |cands AS (
       |  SELECT np.nprobe, a.vec_id, a.approx_dist
       |  FROM adc a JOIN np ON a.list_rank < np.nprobe),
       |scanned AS (
       |  SELECT nprobe, CAST(count(*) AS BIGINT) AS n_scanned
       |  FROM cands GROUP BY nprobe),
       |topk AS (
       |  SELECT nprobe, vec_id FROM (
       |    SELECT nprobe, vec_id, row_number() OVER (PARTITION BY nprobe
       |      ORDER BY approx_dist, vec_id) AS rn
       |    FROM cands)
       |  WHERE rn <= 10),
       |m AS (
       |  SELECT nprobe, CAST(count(*) AS BIGINT) AS n_match
       |  FROM topk JOIN exact_top USING (vec_id)
       |  GROUP BY nprobe)
       |SELECT CAST(s.nprobe AS BIGINT) AS nprobe, s.n_scanned,
       |  coalesce(m.n_match, 0) AS n_match,
       |  CAST(coalesce(m.n_match, 0) AS DOUBLE) / CAST(10 AS DOUBLE)
       |    AS recall_at_10
       |FROM scanned s LEFT JOIN m USING (nprobe)
       |ORDER BY nprobe""".stripMargin
  }
}
