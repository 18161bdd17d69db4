package graft

import graft.functions.HyperLogLogAggregator

/** Sketch properties: shard-merge ≡ whole-stream build, estimate accuracy
  * in the m=64 error regime, and determinism of the register formulas.
  */
class HyperLogLogSpec extends SparkTestBase {

  private def build(elems: Seq[String]): Array[Byte] = {
    val agg = new HyperLogLogAggregator
    elems.foldLeft(agg.zero)(agg.reduce)
  }

  test("merge of shard sketches equals the sketch of the union") {
    val agg = new HyperLogLogAggregator
    val a = (1 to 4000).map(i => s"user-$i")
    val b = (2000 to 6000).map(i => s"user-$i") // overlapping shard
    val merged = agg.merge(build(a), build(b))
    assert(merged.sameElements(build(a ++ b)),
      "register-max merge must equal union build")
  }

  test("estimate lands within the m=64 error regime (~13% std error)") {
    for (n <- Seq(500, 5000, 50000)) {
      val est = HyperLogLogAggregator.estimate(
        build((1 to n).map(i => s"element $i")))
      val rel = math.abs(est - n) / n
      assert(rel < 0.4, s"n=$n est=$est rel=$rel (beyond 3σ of 1.04/√64)")
    }
  }

  test("duplicates never move the estimate (idempotent reduce)") {
    val once = build((1 to 1000).map(i => s"e$i"))
    val thrice = build((1 to 1000).flatMap(i => Seq.fill(3)(s"e$i")))
    assert(once.sameElements(thrice))
  }

  test("rho formula: register scores stay in [1, 55] and j in [0, 64)") {
    (1 to 2000).map(i => HyperLogLogAggregator.jRho(s"probe $i")).foreach {
      case (j, rho) =>
        assert(j >= 0 && j < 64)
        assert(rho >= 1 && rho <= 55)
    }
  }
}
