package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpoints.StableCheckpoint
import graft.Tables

/** Embedding class-separability audit — the "are my labels real"
  * check a labeled-embedding pipeline runs before training a probe or
  * trusting distillation targets: pairwise distances between per-label
  * centroid vectors, next to each label's within-class scatter. A label
  * pair whose centroid distance is small relative to the classes'
  * internal spread is a merge/noise candidate (`label_noise_scan`'s
  * neighborhood vote is the per-POINT view; this is the per-CLASS
  * geometry).
  *
  * Exactness engineering: per-label vector SUMS over quantized
  * components `q = round(1000·x)` are exact integers (order-free,
  * mergeable). Centroids are FIXED-POINT means computed as
  * `(S_d + 1000·n) div n − 1000`. The offset makes the numerator
  * non-negative, which is defensive rather than necessary: Spark's
  * `div` and DuckDB's `//` BOTH truncate toward zero (verified on
  * negatives, e.g. -7 // 2 = -3 in DuckDB), so the un-offset form
  * would agree too — the offset just makes the truncate-vs-floor
  * question moot on sight, at the cost of one add. Pairwise
  * centroid distances over those integer centroids and each label's
  * integer scatter trace `n·Σq² − (Σq)²` then hash-gate exactly; the
  * only double is the final separation ratio. One groupBy(label) pass
  * + a ≤k² centroid self-join: at 100 TB the data pass is a mergeable
  * map-side-combined aggregation and the join is over k rows.
  */
object EmbedSeparation {

  def embeddingClassSeparation(spark: SparkSession, sfDir: String): DataFrame = {
    val q = expr(
      "transform(embedding, x -> cast(round(cast(x as double) * 1000) as long))")
    val byLabel = Tables.embeddingsSpread(spark, sfDir)
      .select(col("label").cast("long").as("label"), q.as("q"))
      .select(col("label"), posexplode(col("q")).as(Seq("d", "v")))
      .groupBy(col("label"), col("d"))
      .agg(sum(col("v")).as("s"), sum(col("v") * col("v")).as("ss"),
        count(lit(1)).as("n"))
      // fixed-point floor centroid, negative-safe (see scaladoc)
      .withColumn("c", expr("(s + 1000 * n) div n - 1000"))
    val cents = byLabel
      .groupBy(col("label"))
      .agg(max(col("n")).as("n"),
        sum(expr("n * ss - s * s")).as("scatter_trace"),
        collect_list(struct(col("d"), col("c"))).as("cs"))
      .select(col("label"), col("n"), col("scatter_trace"),
        expr("transform(array_sort(cs, (a, b) -> case when a.d < b.d then -1 " +
          "when a.d > b.d then 1 else 0 end), p -> p.c)").as("centroid"))
      .stableCheckpoint() // tiny (k rows); both self-join sides
    val pairs = cents.select(col("label").as("label_a"), col("n").as("n_a"),
      col("scatter_trace").as("st_a"), col("centroid").as("ca"))
      .join(cents.select(col("label").as("label_b"), col("n").as("n_b"),
        col("scatter_trace").as("st_b"), col("centroid").as("cb")),
        col("label_a") < col("label_b"))
    pairs
      .withColumn("dist_sq", expr(
        "aggregate(zip_with(ca, cb, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, v) -> acc + v)"))
      // mean within-class variance per dimension, in quantized units²:
      // scatter_trace/(n²) summed over both classes — the yardstick the
      // centroid gap is compared against
      .withColumn("separation_ratio",
        col("dist_sq").cast("double") /
          (col("st_a").cast("double") / (col("n_a") * col("n_a")).cast("double")
            + col("st_b").cast("double") / (col("n_b") * col("n_b")).cast("double")))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("dist_sq"), col("st_a"), col("st_b"), col("separation_ratio"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val embeddingClassSeparationSql: String =
    """WITH q AS (
      |  SELECT label, d, CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT) AS v
      |  FROM (SELECT CAST(label AS BIGINT) AS label, unnest(embedding) AS e,
      |          generate_subscripts(embedding, 1) AS d
      |        FROM embeddings)),
      |bl AS (
      |  SELECT label, d, CAST(sum(v) AS BIGINT) AS s,
      |    CAST(sum(v * v) AS BIGINT) AS ss, CAST(count(*) AS BIGINT) AS n
      |  FROM q GROUP BY label, d),
      |cents AS (
      |  SELECT label, max(n) AS n,
      |    CAST(sum(n * ss - s * s) AS BIGINT) AS scatter_trace,
      |    list((s + 1000 * n) // n - 1000 ORDER BY d) AS centroid
      |  FROM bl GROUP BY label)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  a.n AS n_a, b.n AS n_b,
      |  CAST(list_sum(list_transform(range(1, 65),
      |    i -> (a.centroid[i] - b.centroid[i])
      |       * (a.centroid[i] - b.centroid[i]))) AS BIGINT) AS dist_sq,
      |  a.scatter_trace AS st_a, b.scatter_trace AS st_b,
      |  CAST(dist_sq AS DOUBLE) /
      |    (CAST(a.scatter_trace AS DOUBLE) / CAST(a.n * a.n AS DOUBLE)
      |     + CAST(b.scatter_trace AS DOUBLE) / CAST(b.n * b.n AS DOUBLE))
      |    AS separation_ratio
      |FROM cents a JOIN cents b ON a.label < b.label
      |ORDER BY label_a, label_b""".stripMargin
}
