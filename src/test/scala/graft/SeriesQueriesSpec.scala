package graft

import org.apache.spark.sql.functions._
import graft.queries.SeriesQueries

/** Invariants of the time-series/ops operators: CUSUM telescoping to
  * zero, compaction bins partitioning the corpus contiguously, and TWAP
  * staying inside the per-user value envelope.
  */
class SeriesQueriesSpec extends SparkTestBase {

  test("cusum telescopes to exactly zero on the final day") {
    val rows = SeriesQueries.cusumDailyRevenue(spark, sf001)
      .orderBy(col("day")).collect()
    assert(rows.nonEmpty)
    assert(rows.last.getLong(2) === 0L,
      "sum of n*(x - mean) over all days must cancel")
  }

  test("compaction bins partition the corpus with contiguous doc ranges") {
    val bins = SeriesQueries.compactionBins(spark, sf001)
      .orderBy(col("bin")).collect()
    val (nDocs, total) = (
      bins.map(_.getLong(1)).sum, bins.map(_.getLong(2)).sum)
    val docs = Tables.documents(spark, sf001)
      .agg(count(lit(1)), sum(col("n_chars"))).collect()(0)
    assert(nDocs === docs.getLong(0))
    assert(total === docs.getLong(1))
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(4) < b.getLong(3),
          s"bin ${a.getLong(0)} last_doc must precede bin ${b.getLong(0)} first_doc")
      case _ =>
    }
  }

  test("twap lies within each user's purchase-value envelope") {
    val out = SeriesQueries.timeWeightedAvg(spark, sf001).collect()
    assert(out.nonEmpty)
    val env = Tables.events(spark, sf001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), round(col("value") * 100).cast("long").as("c"))
      .groupBy("user_id").agg(min("c").as("lo"), max("c").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      val (lo, hi) = env(r.getLong(0))
      val twap = r.getDouble(3)
      assert(twap >= lo - 0.5 && twap <= hi + 0.5,
        s"user ${r.getLong(0)}: twap $twap outside [$lo,$hi]")
    }
  }

  test("every flagged anomaly exceeds 3x the recomputed MAD") {
    val cents = Tables.events(spark, sf001)
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 100).cast("long")).collect()
      .map(_.getLong(0)).sorted
    def median(xs: Array[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    val med = median(cents.map(_.toDouble))
    val mad = median(cents.map(c => math.abs(c - med)).sorted)
    val flagged = SeriesQueries.anomalyMad(spark, sf001).collect()
    flagged.foreach { r =>
      assert(r.getDouble(3) > 3 * mad,
        s"event ${r.getLong(0)} dev ${r.getDouble(3)} not beyond 3*MAD=$mad")
    }
  }
}
