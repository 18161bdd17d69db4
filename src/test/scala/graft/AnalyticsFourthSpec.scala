package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticsFourth

/** Semantic properties of the cohort/RFM/basket/skyline operators that the
  * hash gate can't see: dominance-freeness of the skyline, conservation of
  * customers across cohort and RFM partitions, and lift internal
  * consistency.
  */
class AnalyticsFourthSpec extends SparkTestBase {

  test("skyline output is dominance-free against the full part table") {
    val sky = AnalyticsFourth.skylineParts(spark, sf0001).collect()
    val all = Tables.part(spark, sf0001)
      .select(round(col("p_retailprice") * 100).cast("long"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sky.nonEmpty)
    sky.foreach { s =>
      val (price, size) = (s.getLong(1), s.getLong(2))
      val dominator = all.find { case (p2, s2) =>
        p2 <= price && s2 >= size && (p2 < price || s2 > size)
      }
      assert(dominator.isEmpty,
        s"part ${s.getLong(0)} ($price,$size) dominated by $dominator")
    }
  }

  test("cohort month-0 actives sum to the distinct ordering customers") {
    val ret = AnalyticsFourth.cohortRetention(spark, sf0001)
    val month0 = ret.filter(col("months_since") === 0)
      .agg(sum(col("n_active"))).collect()(0).getLong(0)
    val custs = Tables.orders(spark, sf0001)
      .select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(month0 === custs, "every customer is active in its cohort month")
    assert(ret.filter(col("months_since") < 0).count() === 0)
  }

  test("rfm segments partition all customers; quartiles stay in 1..4") {
    val seg = AnalyticsFourth.rfmSegments(spark, sf0001)
    val total = seg.agg(sum(col("n_customers"))).collect()(0).getLong(0)
    val custs = Tables.orders(spark, sf0001)
      .select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(total === custs)
    val bad = seg.filter(
      col("r_q") < 1 || col("r_q") > 4 || col("f_q") < 1 || col("f_q") > 4 ||
        col("m_q") < 1 || col("m_q") > 4).count()
    assert(bad === 0)
  }

  test("basket lift agrees with independently recomputed counts") {
    val out = AnalyticsFourth.marketBasketLift(spark, sf001).collect()
    assert(out.nonEmpty)
    val items = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = items.select(countDistinct(col("l_orderkey")))
      .collect()(0).getLong(0)
    val byPart = items.groupBy(col("l_partkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.take(5).foreach { r =>
      val (pa, pb, cnt, lift) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(cnt >= 2)
      val expected = cnt.toDouble * nOrders / (byPart(pa).toDouble * byPart(pb))
      assert(math.abs(lift - expected) < 1e-12, s"lift mismatch for ($pa,$pb)")
    }
  }
}
