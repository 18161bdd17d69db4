package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
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

  /** Encoding distance ‖e_m − c‖² as a fixed-order column chain. */
  private def encDist(m: Int, c: Array[Long]): Column =
    (0 until SubDim).map { d =>
      val x = element_at(col("e"), m * SubDim + d + 1) - lit(c(d).toDouble)
      x * x
    }.reduceLeft(_ + _)

  def simPqAdc(spark: SparkSession, sfDir: String): DataFrame = {
    val cb = codebook
    val table = adcTable
    // per subspace: argmin code (ties → lowest k, first-index-of-min)
    val codeCols = (0 until M).map { m =>
      val dists = array(cb(m).map(c => encDist(m, c)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int").as(s"c$m")
    }
    val withCodes = Tables.embeddings(spark, sfDir)
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

  /** ‖e − C_j‖² as a fixed-order column chain over the full 64 dims. */
  private def coarseDist(c: Array[Long]): Column =
    (0 until M * SubDim).map { d =>
      val x = element_at(col("e"), d + 1) - lit(c(d).toDouble)
      x * x
    }.reduceLeft(_ + _)

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
    Tables.embeddings(spark, sfDir)
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
}
