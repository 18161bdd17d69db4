package graft.functions

import org.roaringbitmap.longlong.Roaring64NavigableMap

import graft.SparkTestBase
import graft.queries.BitmapQueries

/** Algebraic laws of the Roaring-bitmap aggregator that the hash gate
  * can't see: merge (OR) matches set union regardless of split order,
  * the portable wire format round-trips, and the AND-count expression
  * agrees with exact set intersection — the properties that make
  * shard-parallel aggregation + post-aggregation set algebra exact.
  */
class BitmapAggregatorSpec extends SparkTestBase {

  private def bmOf(ids: Seq[Long]): Roaring64NavigableMap = {
    val agg = new BitmapAggregator
    ids.foldLeft(agg.zero)(agg.reduce)
  }

  test("merge is set union for any split of the input") {
    val agg = new BitmapAggregator
    val ids = (0L until 500L).map(i => (i * 7919L) % 997L)
    val whole = bmOf(ids)
    Seq(1, 3, 250, 499).foreach { cut =>
      val (a, b) = ids.splitAt(cut)
      val merged = agg.merge(bmOf(a), bmOf(b))
      assert(merged.getLongCardinality === whole.getLongCardinality)
      assert(agg.finish(merged).toSeq === agg.finish(whole).toSeq,
        s"split at $cut diverges from single-pass bitmap")
    }
  }

  test("portable bytes round-trip and cardinality helper is exact") {
    val ids = Seq(1L, 2L, 3L, 1000000L, 1L << 40, (1L << 40) + 1)
    val bytes = BitmapAggregator.toPortableBytes(bmOf(ids))
    assert(BitmapAggregator.cardinality(bytes) === ids.distinct.size.toLong)
    val back = BitmapAggregator.fromPortableBytes(bytes)
    assert(ids.forall(back.contains), "round-trip lost members")
  }

  test("and-count matches exact set intersection, incl. disjoint = 0") {
    val a = (0L until 300L).map(_ * 2) // evens
    val b = (0L until 300L).map(_ * 3) // multiples of 3
    val expected = a.toSet.intersect(b.toSet).size.toLong
    val got = BitmapAggregator.andCardinality(
      BitmapAggregator.toPortableBytes(bmOf(a)),
      BitmapAggregator.toPortableBytes(bmOf(b)))
    assert(got === expected)
    val disjoint = BitmapAggregator.andCardinality(
      BitmapAggregator.toPortableBytes(bmOf(Seq(1L, 3L))),
      BitmapAggregator.toPortableBytes(bmOf(Seq(2L, 4L))))
    assert(disjoint === 0L)
  }

  test("bitmap daily distinct matches a driver-side exact recount") {
    val rows = BitmapQueries.bitmapDistinctDaily(spark, sf0001).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val exact = graft.Tables.events(spark, sf0001)
      .select(expr("datediff(cast(ts as date), date'2024-01-01')")
        .cast("long").as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === exact(r.getLong(0)),
        s"day ${r.getLong(0)} bitmap count diverges from countDistinct")
    }
  }
}
