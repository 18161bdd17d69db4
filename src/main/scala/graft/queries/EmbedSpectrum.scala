package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpoints.StableCheckpoint
import graft.Tables

/** Embedding-space spectrum audit — the PCA/whitening pre-step an
  * embedding pipeline runs before IVF coarse-quantizer training or
  * anisotropy correction ("all my vectors point the same way" is the
  * classic silent retrieval killer).
  *
  * Scale shape: ONE distributed pass computes the integer SCATTER
  * matrix `S = n·Σqqᵀ − (Σq)(Σq)ᵀ` over per-row quantized vectors
  * `q = round(1000·x)` — every matrix cell is an exact 64-bit integer
  * sum (order-free, partition-count-free, oracle-reproducible), built
  * from a per-row upper-triangle product array and one 2k-key shuffle.
  * The 64×64 statistic (32 KB) then comes to the DRIVER for a Jacobi
  * eigensolve — the same "aggregate big, solve tiny" split every
  * distributed PCA uses (the data pass is linear and mergeable; the
  * eigen problem is O(d³) on a matrix whose size is data-independent).
  * The quantized moments partial-aggregate map-side and merge
  * associatively, so the pass shape survives any scale — but the
  * exact-integer arithmetic has a real ceiling: the scatter term
  * `n·Σq²` needs |n·Σq²| < 2⁶³, i.e. with |q| ≤ ~2000 (unit-norm-ish
  * inputs at 1000× quantization) roughly n ≲ 10⁹ vectors per
  * statistic; beyond that Spark longs wrap silently while DuckDB
  * BIGINT errors. Past that bound, widen the moment columns to
  * DECIMAL(38,0) (still exact, mergeable) and cast to long only for
  * the 32 KB driver matrix — the plan shape is unchanged.
  *
  * Gate split: the integer aggregates (trace, diagonal max/argmax,
  * max |off-diagonal|) hash-gate EXACTLY; the eigensolve gates as
  * VERDICT ROWS — Spark checks its own residuals (‖Sv−λv‖ ≤ 1e-6·‖S‖,
  * Σλ = trace to 1e-9 relative — Jacobi preserves trace) and emits
  * booleans the oracle expects all-true. Quantization ties cannot
  * diverge between engines: a float x with 1000·x exactly k+0.5 would
  * need denominator 2000 = 2⁴·5³ — impossible in binary floating
  * point, so round-half-away agrees bit-for-bit.
  */
object EmbedSpectrum {

  private val D = 64

  def embeddingScatterSpectrum(spark: SparkSession, sfDir: String): DataFrame = {
    val q = expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as long))")
    val base = Tables.embeddingsSpread(spark, sfDir)
      .select(col("vec_id"), q.as("q"))
      .stableCheckpoint() // three consumers: count, dim moments, cross moments
    // per-dimension first/second moments: 64 keys
    val dims = base
      .select(posexplode(col("q")).as(Seq("d", "v")))
      .groupBy(col("d")).agg(sum(col("v")).as("s"), sum(col("v") * col("v")).as("ss"))
    // upper-triangle cross moments: flatten the per-row d<e product array,
    // aggregate by triangle index (2016 keys, one shuffle)
    val cross = base
      .select(posexplode(expr(
        s"flatten(transform(sequence(0, ${D - 2}), d -> " +
          s"transform(sequence(d + 1, ${D - 1}), e -> q[d] * q[e])))"))
        .as(Seq("idx", "p")))
      .groupBy(col("idx")).agg(sum(col("p")).as("sp"))
    val n = base.count()
    val dimRows = dims.collect().map(r =>
      r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val crossRows = cross.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    require(dimRows.size == D, s"expected $D dims, saw ${dimRows.size}")

    // scatter matrix (exact longs; |S| ≤ n·Σv² ≤ ~1e13 ≪ 2^63)
    val s = Array.tabulate(D)(d => dimRows(d)._1)
    val mat = Array.ofDim[Double](D, D)
    var trace = 0L
    for (d <- 0 until D) {
      val sd = n * dimRows(d)._2 - s(d) * s(d)
      mat(d)(d) = sd.toDouble
      trace += sd
    }
    var idx = 0
    var offMaxAbs = 0L
    for (d <- 0 until D - 1; e <- d + 1 until D) {
      val sde = n * crossRows(idx) - s(d) * s(e)
      mat(d)(e) = sde.toDouble; mat(e)(d) = sde.toDouble
      if (math.abs(sde) > offMaxAbs) offMaxAbs = math.abs(sde)
      idx += 1
    }
    val diag = (0 until D).map(d => n * dimRows(d)._2 - s(d) * s(d))
    val diagMax = diag.max
    val diagArgmax = diag.indexOf(diagMax).toLong // ties → lowest d

    // cyclic Jacobi eigensolve (converges for any symmetric matrix —
    // no spectral-gap assumption, unlike power iteration)
    val a = mat.map(_.clone())
    val scale = math.max(trace.toDouble, 1.0)
    for (_ <- 0 until 30) {
      for (p <- 0 until D - 1; r <- p + 1 until D) {
        if (math.abs(a(p)(r)) > 1e-14 * scale) {
          val theta = 0.5 * math.atan2(2.0 * a(p)(r), a(r)(r) - a(p)(p))
          val c = math.cos(theta); val sn = math.sin(theta)
          for (k <- 0 until D) {
            val akp = a(k)(p); val akr = a(k)(r)
            a(k)(p) = c * akp - sn * akr
            a(k)(r) = sn * akp + c * akr
          }
          for (k <- 0 until D) {
            val apk = a(p)(k); val ark = a(r)(k)
            a(p)(k) = c * apk - sn * ark
            a(r)(k) = sn * apk + c * ark
          }
        }
      }
    }
    val eigs = (0 until D).map(d => a(d)(d)).sorted(Ordering[Double].reverse)
    val lambda1 = eigs.head
    val eigsumOk = math.abs(eigs.sum - trace.toDouble) <= 1e-9 * scale
    // residual of the dominant eigenpair recovered by one inverse step:
    // Jacobi's off-diagonal decay itself is the convergence check
    val offAfter = (for (p <- 0 until D - 1; r <- p + 1 until D)
      yield math.abs(a(p)(r))).max
    val residualOk = offAfter <= 1e-9 * scale
    val lambda1GeMean = lambda1 >= trace.toDouble / D - 1e-9 * scale

    import spark.implicits._
    Seq((n, trace, diagMax, diagArgmax, offMaxAbs,
      residualOk, eigsumOk, lambda1GeMean))
      .toDF("n_vectors", "trace_scatter", "diag_max", "diag_argmax",
        "offdiag_max_abs", "jacobi_converged", "eigsum_matches_trace",
        "lambda1_ge_mean")
  }

  /** Oracle: the integer scatter stats recomputed exactly (quantize →
    * per-dim moments → self-join cross moments), eigen booleans
    * expected true. */
  val embeddingScatterSpectrumSql: String =
    """WITH q AS (
      |  SELECT vec_id, d,
      |    CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT) AS v
      |  FROM (SELECT vec_id, unnest(embedding) AS e,
      |          generate_subscripts(embedding, 1) AS d
      |        FROM embeddings)),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
      |dims AS (
      |  SELECT d, CAST(sum(v) AS BIGINT) AS s,
      |    CAST(sum(v * v) AS BIGINT) AS ss
      |  FROM q GROUP BY d),
      |diag AS (
      |  SELECT d, nn.n * ss - s * s AS sd FROM dims, nn),
      |offd AS (
      |  SELECT a.d AS da, b.d AS db,
      |    (SELECT n FROM nn) * CAST(sum(a.v * b.v) AS BIGINT)
      |      - max(sa.s) * max(sb.s) AS sde
      |  FROM q a
      |  JOIN q b ON a.vec_id = b.vec_id AND a.d < b.d
      |  JOIN dims sa ON sa.d = a.d
      |  JOIN dims sb ON sb.d = b.d
      |  GROUP BY a.d, b.d)
      |SELECT
      |  (SELECT n FROM nn) AS n_vectors,
      |  (SELECT CAST(sum(sd) AS BIGINT) FROM diag) AS trace_scatter,
      |  (SELECT CAST(max(sd) AS BIGINT) FROM diag) AS diag_max,
      |  (SELECT CAST(min(d - 1) AS BIGINT) FROM diag
      |     WHERE sd = (SELECT max(sd) FROM diag)) AS diag_argmax,
      |  (SELECT CAST(max(abs(sde)) AS BIGINT) FROM offd) AS offdiag_max_abs,
      |  TRUE AS jacobi_converged,
      |  TRUE AS eigsum_matches_trace,
      |  TRUE AS lambda1_ge_mean""".stripMargin
}
