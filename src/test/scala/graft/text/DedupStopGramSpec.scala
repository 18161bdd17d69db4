package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Transparency of the n-gram Jaccard stop-gram cap:
  *  - a cap no gram reaches must be a no-op;
  *  - a binding cap must equal re-running the pipeline over gram sets with
  *    the over-cap grams deleted (jaccard on the informative vocabulary) —
  *    verified against a plain-Scala reference on the collected gram sets.
  */
class DedupStopGramSpec extends SparkTestBase {
  import spark.implicits._

  // Every doc shares the "common common common" boilerplate gram; pairs of
  // docs additionally share content grams.
  private val docs = Seq(
    ("d1", "common common common alpha beta gamma delta"),
    ("d2", "common common common alpha beta gamma epsilon"),
    ("d3", "common common common zeta eta theta iota"),
    ("d4", "common common common zeta eta theta kappa"),
    ("d5", "common common common lone words here only")
  ).toDF("doc_id", "text").withColumn("block", lit(1))

  private def run(cap: Option[Long]): Set[(String, String, Double)] =
    Dedup.ngramJaccardPairs(docs, Seq("block"), n = 3, threshold = 0.05,
      maxGramDocFreq = cap)
      .select($"id_a", $"id_b", $"jaccard_sim")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet

  test("a cap above every gram's doc frequency is a no-op") {
    assert(run(None) == run(Some(1000L)))
  }

  test("a binding cap equals jaccard over the stop-gram-filtered vocabulary") {
    // driver-side reference: collect each doc's (hashed) gram set, delete
    // grams with df > cap, compute pairwise jaccard in plain Scala
    val cap = 4L
    val sets = docs
      .select($"doc_id",
        array_distinct(transform(Dedup.ngramSet($"text", 3), g => xxhash64(g)))
          .as("ngrams"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val df = sets.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val kept = sets.map { case (id, s) => id -> s.filter(g => df(g) <= cap) }
    val ids = kept.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      inter = (kept(a) & kept(b)).size
      union = kept(a).size + kept(b).size - inter
      if union > 0
      j = math.rint(inter.toDouble / union * 1e4) / 1e4 // round(_, 4)
      if j > 0.05
    } yield (a, b, j)).toSet
    assert(run(Some(cap)) == expected)
    // and the binding cap really did change something vs uncapped
    assert(run(Some(cap)) != run(None))
  }
}
