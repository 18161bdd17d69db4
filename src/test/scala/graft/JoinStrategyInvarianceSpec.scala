package graft

import org.apache.spark.sql.functions._

/** Join-strategy invariance: the ANSWER of a keyed join must not depend
  * on the physical strategy Catalyst (or a hint) picks. The gate runs
  * whatever AQE chooses at sf0.001; a real cluster at 100 TB will pick
  * differently (broadcast thresholds, skew splits) — this spec pins that
  * broadcast-hash, sort-merge and shuffled-hash all produce identical
  * rows for a representative join + aggregate, so a planner flip can
  * never be a correctness event.
  */
class JoinStrategyInvarianceSpec extends SparkTestBase {

  test("broadcast / merge / shuffle_hash produce identical join results") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderpriority"))
    def agg(hinted: org.apache.spark.sql.DataFrame): Seq[String] =
      li.join(hinted, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
        .orderBy(col("o_orderpriority"))
        .collect().map(_.toString).toSeq
    val broadcastRes = agg(broadcast(o))
    val mergeRes = agg(o.hint("merge"))
    val shuffleHashRes = agg(o.hint("shuffle_hash"))
    assert(broadcastRes.nonEmpty)
    assert(broadcastRes == mergeRes,
      "broadcast vs sort-merge join results differ")
    assert(broadcastRes == shuffleHashRes,
      "broadcast vs shuffled-hash join results differ")
  }

  test("r9 join-bearing queries survive a global planner flip") {
    // Whole-query variant: disable broadcast + prefer SMJ vs defaults —
    // the flip a 100 TB cluster's thresholds would make — and assert
    // identical rows for the round-9 queries built on posting/df joins.
    val reps = Seq("source_minhash_similarity", "ngram_novelty_profile",
      "multimodal_phash_dedup")
    val conf = spark.conf
    val prevThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevPrefer = conf.get("spark.sql.join.preferSortMergeJoin")
    try reps.foreach { name =>
      val fn = SparkEntry.queries(name)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      conf.set("spark.sql.join.preferSortMergeJoin", prevPrefer)
      val default = fn(spark, sf0001).collect().map(_.toString).toSeq
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.join.preferSortMergeJoin", "true")
      val flipped = fn(spark, sf0001).collect().map(_.toString).toSeq
      assert(default.nonEmpty, s"$name returned no rows")
      assert(default == flipped,
        s"$name differs between default and no-broadcast/SMJ planning")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      conf.set("spark.sql.join.preferSortMergeJoin", prevPrefer)
    }
  }

  test("hints actually change the physical join operator") {
    val li = Tables.lineitem(spark, sf0001).select(col("l_orderkey"))
    val o = Tables.orders(spark, sf0001).select(col("o_orderkey"))
    def planOf(hinted: org.apache.spark.sql.DataFrame): String =
      li.join(hinted, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
    assert(planOf(broadcast(o)).contains("BroadcastHashJoin"))
    assert(planOf(o.hint("merge")).contains("SortMergeJoin"))
    assert(planOf(o.hint("shuffle_hash")).contains("ShuffledHashJoin"))
  }
}
