package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Additional relational-graph operators over the part co-purchase graph
  * (parts are nodes; an edge joins two parts appearing in the same
  * order). Companion to [[GraphQueries]] (PageRank, triangles, degrees).
  */
object GraphMore {

  private val K = 90
  private val Rounds = 3

  /** k-core decomposition, FIXED 3 peeling rounds (documented semantics,
    * like the fixed-iteration PageRank): repeatedly drop nodes of degree
    * < 90 together with their edges, and report the surviving nodes with
    * their degree in the surviving subgraph. At sf0.01 the cascade is
    * real (2000 → 1745 → 1534 → 1221 nodes), so the gate exercises every
    * round. Scale shape: each round is one degree aggregation plus two
    * semi-joins keyed on the endpoints — no node set, edge list, or
    * degree table ever leaves the cluster, and `localCheckpoint` caps
    * the lineage exactly as the PageRank/CC loops do. Per-order pair
    * expansion is bounded by TPC-H's ≤7 lineitems/order; the
    * market-basket guard pattern (cap items per basket) applies verbatim
    * if a pathological basket appears.
    */
  def kcoreParts(spark: SparkSession, sfDir: String): DataFrame = {
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    var edges = items.toDF("ok", "pa")
      .join(items.toDF("ok", "pb"), "ok")
      .filter(col("pa") < col("pb"))
      .select(col("pa"), col("pb"))
      .distinct()
      .localCheckpoint()
    for (_ <- 1 to Rounds) {
      val deg = edges.select(col("pa").as("u"))
        .unionAll(edges.select(col("pb").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val alive = deg.filter(col("deg") >= K).select(col("u"))
      edges = edges
        .join(alive.toDF("pa"), "pa")
        .join(alive.toDF("pb"), "pb")
        .select(col("pa"), col("pb"))
        .localCheckpoint()
    }
    edges.select(col("pa").as("u"))
      .unionAll(edges.select(col("pb").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .select(col("u").as("part_key"), col("deg"))
      .orderBy(col("part_key"))
  }

  val kcorePartsSql: String = {
    val rounds = (1 to Rounds).map { i =>
      s"""a$i AS (SELECT u FROM d${i - 1} WHERE deg >= $K),
         |e$i AS (
         |  SELECT pa, pb FROM e${i - 1}
         |  WHERE pa IN (SELECT u FROM a$i) AND pb IN (SELECT u FROM a$i)),
         |d$i AS (
         |  SELECT u, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT pa AS u FROM e$i UNION ALL SELECT pb FROM e$i)
         |  GROUP BY u)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |e0 AS (
       |  SELECT DISTINCT a.pk AS pa, b.pk AS pb
       |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
       |d0 AS (
       |  SELECT u, CAST(count(*) AS BIGINT) AS deg
       |  FROM (SELECT pa AS u FROM e0 UNION ALL SELECT pb FROM e0)
       |  GROUP BY u),
       |$rounds
       |SELECT u AS part_key, deg FROM d$Rounds
       |ORDER BY part_key""".stripMargin
  }
}
