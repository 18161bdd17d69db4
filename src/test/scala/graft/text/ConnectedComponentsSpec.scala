package graft.text

import graft.SparkTestBase

/** Min-label propagation must find full transitive closures, not just
  * direct neighbors — a chain a-b, b-c, c-d is ONE component labeled by
  * its minimum id even though a and d share no pair.
  */
class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(pairs: Seq[(String, String)]): Map[String, String] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("a 4-chain collapses to one component under the min id") {
    val got = cc(Seq(("b", "c"), ("a", "b"), ("c", "d")))
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  test("disjoint components keep distinct representatives") {
    val got = cc(Seq(("x", "y"), ("p", "q"), ("q", "r")))
    assert(got == Map("x" -> "x", "y" -> "x", "p" -> "p", "q" -> "p", "r" -> "p"))
  }

  test("a long path converges within the iteration budget (diameter 8)") {
    val chain = (0 until 8).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    val got = cc(chain)
    assert(got.values.toSet == Set("n00"))
    assert(got.size == 9)
  }

  test("a cycle is one component") {
    val got = cc(Seq(("a", "b"), ("b", "c"), ("c", "a")))
    assert(got.values.toSet == Set("a"))
  }
}
