package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{CosineSimilarity, DotProduct}

/** Similarity search over embedding columns (`array<float>`), SURVEY.md
  * §7.2(6): brute-force cosine top-k as the exact baseline and
  * random-hyperplane LSH bucketing as the scale path.
  *
  * Scale design: brute-force is a broadcast nested loop (queries broadcast,
  * corpus streamed — never corpus×corpus) with per-partition top-k via
  * window rank; LSH assigns each vector a deterministic bucket in one
  * map-only pass, so candidate generation becomes a bucket-equijoin and the
  * pairwise work is confined to buckets (the IVF-style probe path).
  */
object Similarity {

  /** float[] → double[] (widen once; all math is in double). */
  def toDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Registers the fused [[CosineSimilarity]] and [[DotProduct]]
    * expressions for this session (idempotent).
    */
  def registerCosine(spark: SparkSession): Unit = {
    graft.functions.FunctionRegistration.tempFunctionOnce(spark,
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)))
    graft.functions.FunctionRegistration.tempFunctionOnce(spark,
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)))
  }

  /** Fused single-pass cosine (requires [[registerCosine]] on the session). */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Fused single-pass dot product (requires [[registerCosine]]). */
  def dot(a: Column, b: Column): Column = call_function("dot_product", a, b)

  /** Built-in composition fallback (4 array passes; bit-identical result). */
  def cosineBuiltin(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force exact top-k: for every query vector the k nearest corpus
    * vectors by cosine (self-matches excluded). Ranking is on the 6-decimal
    * rounded similarity with id tiebreak so ordering is reproducible across
    * engines.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerCosine(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("corpus_id"),
      toDoubleVec(col(vecCol)).as("corpus_vec"))
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("query_vec"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("query_vec"), col("corpus_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("sim"))
  }

  /** Deterministic hyperplane weight matrix: integer weights in [-500, 500]
    * derived from md5("bit:dim") — reproducible in any engine with md5 (the
    * same values are embedded as literals in the DuckDB oracle SQL).
    */
  def hyperplaneWeights(nBits: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(nBits, dim) { (i, d) =>
      graft.functions.Md5Bits.hash60(s"$i:$d") % 1001 - 500
    }

  /** Random-hyperplane LSH bucket id (nBits-bit signature): bit i is set
    * when the dot product with hyperplane i is positive. Map-only; one
    * fused [[DotProduct]] per bit over literal weights (the interpreted
    * zip_with+fold it replaces cost an allocation + per-element lambda
    * dispatch per hyperplane per row). Callers must [[registerCosine]]
    * first.
    */
  def lshBucket(vec: Column, nBits: Int, dim: Int): Column = {
    val weights = hyperplaneWeights(nBits, dim)
    weights.zipWithIndex.map { case (w, i) =>
      val wCol = array(w.toIndexedSeq.map(v => lit(v.toDouble)): _*)
      val dot = call_function("dot_product", vec, wCol)
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Bucketed (IVF-style) approximate top-k: candidates limited to the
    * query's LSH bucket, then exact cosine rank within the bucket. Same
    * output shape as [[bruteForceTopK]]; recall trades against bucket
    * count.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int,
      dim: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerCosine(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("corpus_id"),
      toDoubleVec(col(vecCol)).as("corpus_vec"))
      .withColumn("bucket", lshBucket(col("corpus_vec"), nBits, dim))
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("query_vec"))
      .withColumn("bucket", lshBucket(col("query_vec"), nBits, dim))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("query_vec"), col("corpus_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("sim"))
  }

  /** Multi-probe LSH top-k: each query probes its own bucket AND every
    * bucket at Hamming distance 1 (one flipped signature bit) — the
    * standard recall lever that avoids building more tables. Only the
    * (small) query side expands, ×(nBits+1); the corpus keeps one bucket
    * per vector, so no (query, corpus) pair can repeat across probes and
    * no dedup is needed. Same output shape as [[lshTopK]].
    */
  def lshTopKMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int, dim: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    registerCosine(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("corpus_id"),
      toDoubleVec(col(vecCol)).as("corpus_vec"))
      .withColumn("bucket", lshBucket(col("corpus_vec"), nBits, dim))
    val probes = (0 until nBits).map(i =>
      col("home_bucket").bitwiseXOR(lit(1L << i))) :+ col("home_bucket")
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("query_vec"))
      .withColumn("home_bucket", lshBucket(col("query_vec"), nBits, dim))
      .withColumn("bucket", explode(array(probes: _*)))
      .drop("home_bucket")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("query_vec"), col("corpus_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("sim"))
  }
}
