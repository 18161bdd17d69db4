package graft.functions

import graft.SparkTestBase

/** Misra-Gries guarantees, both regimes:
  *  - exact when distinct ≤ capacity (what the gated query relies on);
  *  - in the approximate regime every estimate is an under-count by at
  *    most n/(capacity+1), and any item with true frequency above that
  *    bound survives.
  */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(items: Seq[String], capacity: Int): Map[String, Long] = {
    val hh = HeavyHittersAggregator.heavyHitters(capacity)
    items.toDF("item").repartition(7) // force multi-partition merges
      .agg(hh($"item").as("m")).collect().head
      .getMap[String, Long](0).toMap
  }

  test("exact regime: distinct <= capacity gives exact counts under any partitioning") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val got = sketch(scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(items), capacity = 4)
    assert(got == Map("a" -> 40L, "b" -> 25L, "c" -> 3L))
  }

  test("approximate regime: under-count bounded by n/(capacity+1), majority survives") {
    val n = 300
    val items = Seq.fill(150)("big") ++
      (1 to 150).map(i => s"noise-${i % 50}")
    val capacity = 9
    val got = sketch(scala.util.Random.javaRandomToRandom(
      new java.util.Random(11)).shuffle(items), capacity)
    val bound = n / (capacity + 1) // 30
    assert(got.contains("big"), s"majority item evicted: $got")
    assert(got("big") <= 150L && got("big") >= 150L - bound,
      s"estimate ${got("big")} outside [${150 - bound}, 150]")
    assert(got.size <= capacity)
    // every estimate is an under-count within the bound
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (k, est) =>
      assert(est <= truth(k) && est >= truth(k) - bound, s"$k: $est vs ${truth(k)}")
    }
  }
}
