package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Distribution window functions and the bucketed band join — the two
  * remaining analytic shapes: rank-position analytics (percent_rank /
  * cume_dist / nth_value) and a numeric range join that never goes
  * through a nested loop.
  */
object AnalyticsExtra {

  /** Rank-distribution analytics per order priority: percent_rank,
    * cume_dist and the partition's 3rd-smallest total. The window orders
    * by (o_totalprice, o_orderkey) — fully tiebroken, so both engines
    * place every row identically and the (rank−1)/(n−1) style divisions
    * see identical integer operands. The output keeps every 37th order
    * AFTER the windows are computed (a transparent output prune — window
    * values are over the full partition either way).
    */
  def windowDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("third_smallest", nth_value(col("o_totalprice"), 3).over(w))
      .filter(col("o_orderkey") % 37 === 0)
      .orderBy(col("o_orderkey"))
  }

  val windowDistributionSql: String =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_orderpriority, o_totalprice,
      |    percent_rank() OVER w AS pct_rank,
      |    cume_dist() OVER w AS cume,
      |    nth_value(o_totalprice, 3) OVER w AS third_smallest
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority
      |               ORDER BY o_totalprice, o_orderkey))
      |WHERE o_orderkey % 37 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** Banded numeric join via bucketing: cross-brand part pairs priced
    * within 25 cents of each other. Prices quantize to integer cents
    * (round(p·100) — exact, cross-engine), the band becomes bucket
    * arithmetic (bucket = cents div 25), and the probe side explodes its
    * 3 candidate buckets {b−1, b, b+1} while the build side keeps its
    * single bucket — so every qualifying pair meets on EXACTLY one
    * bucket (no post-dedup) and the plan is an equi shuffle join, never
    * a nested loop. This is the scale template for every |a−b| ≤ δ join:
    * work is Σ per-bucket products, not |A|·|B|.
    */
  def rangeJoinBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
      .withColumn("bucket", expr("cents div 25"))
    val probe = parts
      .select(col("p_partkey").as("a_key"), col("p_brand").as("a_brand"),
        col("cents").as("a_cents"),
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1))
          .as("j_bucket"))
    val build = parts
      .select(col("p_partkey").as("b_key"), col("p_brand").as("b_brand"),
        col("cents").as("b_cents"), col("bucket").as("j_bucket"))
    probe.join(build, "j_bucket")
      .filter(col("a_key") < col("b_key") &&
        col("a_brand") =!= col("b_brand") &&
        abs(col("a_cents") - col("b_cents")) <= 25)
      .groupBy(col("a_brand"), col("b_brand"))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("a_cents") - col("b_cents"))).as("min_gap_cents"))
      .orderBy(col("a_brand"), col("b_brand"))
  }

  val rangeJoinBucketsSql: String =
    """WITH p AS (
      |  SELECT p_partkey, p_brand,
      |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
      |    CAST(round(p_retailprice * 100) AS BIGINT) // 25 AS bucket
      |  FROM part),
      |probe AS (
      |  SELECT p_partkey AS a_key, p_brand AS a_brand, cents AS a_cents,
      |    unnest([bucket - 1, bucket, bucket + 1]) AS j_bucket
      |  FROM p),
      |build AS (
      |  SELECT p_partkey AS b_key, p_brand AS b_brand, cents AS b_cents,
      |    bucket AS j_bucket
      |  FROM p)
      |SELECT a_brand, b_brand, count(*) AS n_pairs,
      |  CAST(min(abs(a_cents - b_cents)) AS BIGINT) AS min_gap_cents
      |FROM probe JOIN build USING (j_bucket)
      |WHERE a_key < b_key AND a_brand <> b_brand
      |  AND abs(a_cents - b_cents) <= 25
      |GROUP BY a_brand, b_brand
      |ORDER BY a_brand, b_brand""".stripMargin
}
