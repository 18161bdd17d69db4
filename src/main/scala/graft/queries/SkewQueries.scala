package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Skew
import graft.storage.Bucketing

/** Oracle-gated exercise of the skew machinery ([[graft.operators.Skew]]):
  * the lineitem⋈orders join runs SALTED (lineitem's per-orderkey rows are
  * split across 8 salt buckets by l_linenumber; orders replicated 8×), and
  * the per-priority aggregate runs as the SALTED two-phase combine. The
  * oracle SQL is the plain UNSALTED join+group — the driver's hash compare
  * is therefore a machine-checked proof that salting is semantically
  * transparent (same rows, same exact decimal sums).
  *
  * Scale rationale: this is the planned-ahead alternative to AQE skew
  * handling when a hot order key is known to dwarf a partition — the salt
  * splits one key's rows 8 ways at the cost of replicating the moderate
  * side 8×.
  */
object SkewQueries {

  def skewSaltedJoinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(18,2)").as("qty"))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    // salt the large skewed side by a column that varies WITHIN the key
    val joined = Skew.saltedJoin(li, ord, "l_orderkey",
      discriminator = col("l_linenumber"), buckets = 8)
    // two-phase aggregate: partial on (priority, salt), combine on priority;
    // decimal partials keep the sums exact in any combine order
    Skew.saltedAggregate(joined, Seq("o_orderpriority"),
      discriminator = col("l_orderkey"), buckets = 8,
      partial = Seq(
        "p_qty" -> sum(col("qty")),
        "p_n" -> count(lit(1))),
      combine = Seq(
        "sum_qty" -> sum(col("p_qty")).cast("double"),
        "n_lines" -> sum(col("p_n"))))
      .orderBy(col("o_orderpriority"))
  }

  val skewSaltedJoinAggSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** The DECISION side of the skew machinery: per candidate join key,
    * the distribution stats a planner consults before choosing between a
    * plain shuffle join, a broadcast, or [[Skew.saltedJoin]] — row
    * count, distinct keys, the heaviest key's count, and the
    * max/average ratio that IS the skew factor. `recommend_salt` fires
    * when one key carries > 4× the average (the rule of thumb behind
    * AQE's skewedPartitionFactor). One aggregation per key column, all
    * exact integers until the final ratio — at 100 TB the same stats
    * come from a sampled scan or the Count-Min row already gated by
    * `join_size_estimate`.
    */
  def skewAdvisor(spark: SparkSession, sfDir: String): DataFrame = {
    def stats(df: DataFrame, keyCol: String, name: String): DataFrame =
      df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("c")).as("max_key_rows"))
        .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"),
          col("max_key_rows"))
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    stats(li, "l_partkey", "lineitem.l_partkey")
      .unionByName(stats(li, "l_suppkey", "lineitem.l_suppkey"))
      .unionByName(stats(ord, "o_custkey", "orders.o_custkey"))
      .withColumn("avg_key_rows",
        col("n_rows").cast("double") / col("n_keys").cast("double"))
      .withColumn("skew_ratio",
        (col("max_key_rows") * col("n_keys")).cast("double")
          / col("n_rows").cast("double"))
      .withColumn("recommend_salt", col("skew_ratio") > expr("cast(4 as double)"))
      .select(col("key_name"), col("n_rows"), col("n_keys"),
        col("max_key_rows"), col("avg_key_rows"), col("skew_ratio"),
        col("recommend_salt"))
      .orderBy(col("key_name"))
  }

  /** The BUCKETED twin of [[skewSaltedJoinAgg]]: both sides of the
    * lineitem⋈orders join are first persisted as managed tables bucketed
    * 8 ways on the order key ([[Bucketing.writeBucketed]]), then joined
    * exchange-free (BucketingSpec pins the no-Exchange plan) and
    * aggregated. Same oracle semantics as the salted variant, so the
    * driver's hash compare proves a THIRD physical strategy (plain
    * shuffle = oracle, salted, bucketed) produces identical exact
    * decimal sums — the write-once/join-many layout that amortizes the
    * fact-table shuffle into the ingest path at 100 TB. The write cost
    * is charged to this query by design; tables overwrite idempotently.
    */
  def bucketedJoinParity(spark: SparkSession, sfDir: String): DataFrame = {
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderpriority")),
      "g_orders_bucketed", "o_orderkey", 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select(col("l_orderkey"),
        col("l_quantity").cast("decimal(18,2)").as("qty")),
      "g_lineitem_bucketed", "l_orderkey", 8, Seq("l_orderkey"))
    Bucketing.coLocatedJoin(spark, "g_lineitem_bucketed", "g_orders_bucketed",
        "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("qty")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  val bucketedJoinParitySql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val skewAdvisorSql: String =
    """WITH pk AS (
      |  SELECT 'lineitem.l_partkey' AS key_name, count(*) AS c
      |  FROM lineitem GROUP BY l_partkey),
      |sk AS (
      |  SELECT 'lineitem.l_suppkey' AS key_name, count(*) AS c
      |  FROM lineitem GROUP BY l_suppkey),
      |ck AS (
      |  SELECT 'orders.o_custkey' AS key_name, count(*) AS c
      |  FROM orders GROUP BY o_custkey),
      |u AS (
      |  SELECT * FROM pk UNION ALL SELECT * FROM sk UNION ALL
      |  SELECT * FROM ck),
      |s AS (
      |  SELECT key_name,
      |    CAST(sum(c) AS BIGINT) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_keys,
      |    CAST(max(c) AS BIGINT) AS max_key_rows
      |  FROM u GROUP BY key_name)
      |SELECT key_name, n_rows, n_keys, max_key_rows,
      |  CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE) AS avg_key_rows,
      |  CAST(max_key_rows * n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE)
      |    AS skew_ratio,
      |  CAST(max_key_rows * n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE)
      |    > CAST(4 AS DOUBLE) AS recommend_salt
      |FROM s
      |ORDER BY key_name""".stripMargin
}
