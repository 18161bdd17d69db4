package graft

import graft.functions.CountMinAggregator

/** Count-Min sketch properties: shard-merge ≡ whole-stream build, the
  * only-overestimate guarantee, the ε·N error bound, and bucket-address
  * determinism (the property that lets the sketch be oracle-gated).
  */
class CountMinSpec extends SparkTestBase {

  private def build(elems: Seq[String]): Array[Long] = {
    val agg = new CountMinAggregator
    elems.foldLeft(agg.zero)(agg.reduce)
  }

  test("merge of shard sketches equals the sketch of the concatenation") {
    val agg = new CountMinAggregator
    val a = (1 to 3000).map(i => s"tok-${i % 97}")
    val b = (1 to 2000).map(i => s"tok-${i % 41}")
    val merged = agg.merge(build(a), build(b))
    assert(merged.sameElements(build(a ++ b)),
      "counter-wise addition must equal the single-pass build")
  }

  test("estimates never underestimate and respect the eN bound") {
    val stream = (1 to 20000).map(i => s"w${i % 503}")
    val cms = build(stream).toSeq
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    val eps = math.E / CountMinAggregator.W // ≈ 1.1%
    exact.foreach { case (tok, n) =>
      val est = CountMinAggregator.estimate(cms, tok)
      assert(est >= n, s"$tok: est $est underestimates exact $n")
      assert(est <= n + (eps * stream.size * 3).toLong,
        s"$tok: est $est beyond 3x the eN bound over exact $n")
    }
  }

  test("bucket addresses are deterministic and in [0, W)") {
    for (j <- 0 until CountMinAggregator.D; t <- Seq("the", "of", "αβγ", "")) {
      val b1 = CountMinAggregator.bucket(j, t)
      assert(b1 == CountMinAggregator.bucket(j, t))
      assert(b1 >= 0 && b1 < CountMinAggregator.W)
    }
  }

  test("an unseen element's estimate is bounded by collisions only") {
    val cms = build((1 to 1000).map(i => s"seen$i")).toSeq
    val est = CountMinAggregator.estimate(cms, "never-inserted")
    assert(est <= 1000, "min-of-rows must cap collision mass")
  }
}
