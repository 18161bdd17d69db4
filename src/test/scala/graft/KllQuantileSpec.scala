package graft

import graft.functions.KllQuantileAggregator

/** KLL/MRL quantile-sketch properties: exactness in the n ≤ k regime
  * (the gated regime), merge ≡ build there, weight conservation under
  * compaction, and the empirical rank-error bound with a small k.
  */
class KllQuantileSpec extends SparkTestBase {

  private val pcts = Seq(1, 5, 25, 50, 75, 95, 99)

  private def build(agg: KllQuantileAggregator, xs: Seq[Long]): Array[Array[Long]] =
    xs.foldLeft(agg.zero)(agg.reduce)

  /** Deterministic pseudo-random stream (no Random in tests either). */
  private def stream(n: Int): Seq[Long] =
    (1 to n).map(i => (i.toLong * 2654435761L) % 1000003L)

  test("exact regime (n <= k): quantiles are the exact order statistics") {
    val agg = new KllQuantileAggregator(16384, pcts)
    val xs = stream(10000)
    val got = agg.finish(build(agg, xs))
    val sorted = xs.sorted
    val expect = pcts.map { p =>
      sorted(math.floor((p.toDouble / 100.0d) * (xs.size - 1).toDouble).toInt)
    }
    assert(got == expect)
  }

  test("exact regime: merge of shard sketches equals the whole-stream build") {
    val agg = new KllQuantileAggregator(16384, pcts)
    val xs = stream(9000)
    val (a, b) = xs.splitAt(4000)
    val merged = agg.merge(build(agg, a), build(agg, b))
    assert(agg.finish(merged) == agg.finish(build(agg, xs)))
  }

  test("compaction conserves total weight and bounds level sizes") {
    val k = 256
    val agg = new KllQuantileAggregator(k, pcts)
    val buf = build(agg, stream(100000))
    val weights = buf.toSeq.zipWithIndex.collect {
      case (lv, i) if lv != null => lv(0) * (1L << i)
    }
    assert(weights.sum == 100000L, "sum of item weights must equal n")
    buf.foreach(lv => if (lv != null) assert(lv(0) <= k))
  }

  test("rank error stays within ~2% of n with k=256 at n=100k") {
    val k = 256
    val n = 100000
    val agg = new KllQuantileAggregator(k, pcts)
    val xs = stream(n)
    val got = agg.finish(build(agg, xs))
    val sorted = xs.sorted.toIndexedSeq
    pcts.zip(got).foreach { case (p, v) =>
      val target = (p.toDouble / 100.0d) * (n - 1)
      // rank range of v in the true data (ties make it a range)
      val lo = sorted.indexWhere(_ >= v)
      val hi = sorted.lastIndexWhere(_ <= v)
      val err = if (target < lo) lo - target
                else if (target > hi) target - hi else 0.0d
      assert(err <= 0.02 * n, s"pct $p: value $v rank err $err")
    }
  }

  test("merging many compacted partials keeps every level within capacity") {
    val k = 256
    val agg = new KllQuantileAggregator(k, pcts)
    // 16 partials, each past the compaction point so they carry weight
    // at several levels — the shape reducers see at scale
    val partials = (0 until 16).map(p => build(agg, stream(3000).map(_ + p)))
    val merged = partials.reduce(agg.merge)
    merged.zipWithIndex.foreach { case (lv, i) =>
      if (lv != null)
        assert(lv(0) <= k, s"level $i holds ${lv(0)} items after merges (> k)")
    }
    val weights = merged.toSeq.zipWithIndex.collect {
      case (lv, i) if lv != null => lv(0) * (1L << i)
    }
    assert(weights.sum == 16L * 3000, "merge must conserve total weight")
  }

  test("empty input yields zeros; single value answers every quantile") {
    val agg = new KllQuantileAggregator(64, pcts)
    assert(agg.finish(agg.zero) == pcts.map(_ => 0L))
    assert(agg.finish(build(agg, Seq(42L))) == pcts.map(_ => 42L))
  }
}
