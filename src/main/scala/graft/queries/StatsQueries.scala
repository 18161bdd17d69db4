package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Descriptive-statistics operators with cross-engine-exact arithmetic:
  * correlation from integer moments and equi-width histograms. Both are
  * single-shuffle aggregations whose per-row work is map-side.
  */
object StatsQueries {

  /** Pearson correlation between purchase value and hour-of-day, computed
    * from exact integer moments: value quantizes to cents, hour is
    * already integral, so n, Σx, Σy, Σxy, Σx², Σy² are order-free exact
    * longs and the final correlation is one arithmetic chain over
    * identical operands (sqrt is IEEE exactly-rounded). The built-in
    * `corr()` aggregates FLOATS in partition order — not replayable
    * cross-engine; this formulation is, and is how a 100 TB correlation
    * should be computed anyway (partial integer moments merge exactly).
    */
  def corrExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(
        round(col("value") * 100).cast("long").as("x"),
        hour(col("ts")).cast("long").as("y"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .selectExpr("n",
        "(cast(n as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double))" +
          " / (sqrt(cast(n as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double))" +
          " * sqrt(cast(n as double) * cast(syy as double)" +
          " - cast(sy as double) * cast(sy as double))) as corr_value_hour")

  val corrExactSql: String =
    """WITH b AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS x,
      |    CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase'),
      |mo AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM b)
      |SELECT n,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_value_hour
      |FROM mo""".stripMargin

  /** Equi-width histogram of purchase values in 20 integer-cent bins over
    * [0, max]: bin = (cents·20) div (max+1) — pure integer arithmetic, so
    * boundary values land identically in both engines (a float-width
    * division would disagree at bin edges). The max is a broadcast scalar;
    * the histogram itself is one combiner-friendly groupBy.
    */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 100).cast("long").as("cents"))
    val mx = cents.agg(max(col("cents")).as("mx"))
    cents.crossJoin(broadcast(mx))
      .select(expr("(cents * 20) div (mx + 1)").as("bin"), col("mx"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        first(col("mx")).as("mx0"))
      .select(col("bin"),
        expr("(bin * (mx0 + 1)) div 20").as("lo_cents"),
        expr("((bin + 1) * (mx0 + 1)) div 20").as("hi_cents"),
        col("n"))
      .orderBy(col("bin"))
  }

  val valueHistogramSql: String =
    """WITH c AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT max(cents) AS mx FROM c),
      |binned AS (
      |  SELECT (cents * 20) // (mx + 1) AS bin, mx FROM c, m)
      |SELECT bin,
      |  (bin * (mx + 1)) // 20 AS lo_cents,
      |  ((bin + 1) * (mx + 1)) // 20 AS hi_cents,
      |  count(*) AS n
      |FROM binned
      |GROUP BY bin, mx
      |ORDER BY bin""".stripMargin
}
