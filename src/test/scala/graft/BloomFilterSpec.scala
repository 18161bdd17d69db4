package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFilterAggregator
import graft.queries.CorpusMore

/** Properties of the mergeable Bloom sketch and the transparency of the
  * bloom-prefiltered decontamination pass (no false negatives ⇒ identical
  * output to the exact run).
  */
class BloomFilterSpec extends SparkTestBase {

  private val numBits = 1 << 14

  test("no false negatives: every inserted element probes true") {
    val agg = new BloomFilterAggregator(numBits)
    val elems = (1 to 500).map(i => s"gram number $i")
    val bloom = elems.foldLeft(agg.zero)(agg.reduce)
    elems.foreach { e =>
      assert(BloomFilterAggregator.mightContain(bloom, e, numBits),
        s"inserted element '$e' must probe true")
    }
  }

  test("false-positive rate stays near (kn/m)^k for the sized filter") {
    val agg = new BloomFilterAggregator(numBits)
    val bloom = (1 to 500).map(i => s"gram number $i").foldLeft(agg.zero)(agg.reduce)
    val probes = (1 to 2000).map(i => s"absent element $i")
    val fp = probes.count(BloomFilterAggregator.mightContain(bloom, _, numBits))
    // n=500, m=16384, k=2 → p ≈ (2·500/16384)² ≈ 0.4%; allow generous slack
    assert(fp.toDouble / probes.size < 0.05, s"fp rate too high: $fp/2000")
  }

  test("merge of shard blooms equals the bloom of the union") {
    val agg = new BloomFilterAggregator(numBits)
    val a = (1 to 300).map(i => s"left $i")
    val b = (1 to 300).map(i => s"right $i")
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    val direct = (a ++ b).foldLeft(agg.zero)(agg.reduce)
    assert(merged.sameElements(direct), "OR-merge must equal union build")
  }

  test("SQL probe formula matches the aggregator's bit positions") {
    // the map-side probe is pure SQL (md5→conv→shift) — it must compute
    // exactly the positions the Scala-side builder set
    val m = 1 << 20
    val rows = spark.range(1, 50)
      .select(concat(lit("probe gram "), col("id")).as("g"))
      .selectExpr("g",
        s"cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint) % $m as h1",
        s"cast(conv(substring(md5(g), 17, 15), 16, 10) as bigint) % $m as h2")
      .collect()
    rows.foreach { r =>
      val Array(e1, e2) =
        BloomFilterAggregator.positions(r.getAs[String]("g"), m)
      assert(r.getAs[Long]("h1") == e1 && r.getAs[Long]("h2") == e2,
        s"SQL/Scala hash divergence for '${r.getAs[String]("g")}'")
    }
  }

  test("bloom prefilter is transparent: decontaminate_bloom ≡ exact join on the same slice") {
    val withBloom = CorpusMore.decontaminateBloom(spark, sf0001).collect()
    // the exact pass: identical pipeline minus the bloom probe
    import graft.text.{Dedup, TextFunctions}
    val grams = Tables.documents(spark, sf0001)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(Dedup.ngramSetOfTokens(col("toks"), 5)).as("g"))
    val ev = grams.filter(col("doc_id") % 89 === 0).select(col("g")).distinct()
    val exact = grams.filter(col("doc_id") % 89 =!= 0)
      .join(broadcast(ev), "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared_grams"))
      .orderBy(col("doc_id"))
      .collect()
    assert(withBloom.map(_.toString).sameElements(exact.map(_.toString)),
      "bloom prefilter changed the result")
  }
}
