package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Skew

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
}
