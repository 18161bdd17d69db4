package graft

import graft.functions.TopKAggregator

/** The bounded-buffer and merge guarantees that make heap-top-k safe to
  * partial-aggregate (the gated query proves value equivalence vs the
  * window sort; these pin the mechanics).
  */
class TopKAggregatorSpec extends SparkTestBase {

  private val agg = new TopKAggregator(3)

  test("buffer never exceeds k and keeps the best under (score desc, id asc)") {
    val buf = (1 to 100).map(i => ((i % 10).toDouble, i.toLong))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 3)
    // best scores are 9.0; ties break to the smallest ids: 9, 19, 29
    assert(buf.toSeq == Seq((9.0, 9L), (9.0, 19L), (9.0, 29L)))
  }

  test("merge of shard buffers equals the whole-stream buffer (any split)") {
    val xs = (1 to 200).map(i => ((i * 7 % 50).toDouble, i.toLong))
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(1, 50, 199)) {
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged.sameElements(whole), s"split at $cut diverged")
    }
  }

  test("reduce is insertion-order independent") {
    val xs = (1 to 50).map(i => (math.sin(i).abs, i.toLong))
    val fwd = xs.foldLeft(agg.zero)(agg.reduce)
    val rev = xs.reverse.foldLeft(agg.zero)(agg.reduce)
    assert(fwd.sameElements(rev))
  }
}
