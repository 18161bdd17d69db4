package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries
import graft.text.TextFunctions

/** Properties of the training-pipeline operators that the oracle gate
  * cannot express: layout-independence of the deterministic split/sample
  * (the point of hashing instead of RNG) and the subword counter's piece
  * semantics.
  */
class PipelineSpec extends SparkTestBase {

  test("split assignment is a pure function of the id (stable under repartition)") {
    val a = PipelineQueries.splitTrainTest(spark, sf001).collect()
    val b = PipelineQueries.splitTrainTest(
      spark.newSession(), sf001).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    // 8/1/1 in expectation: train strictly dominates val and test
    val bySplit = a.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit("train") > 5 * bySplit("val"))
    assert(bySplit("train") > 5 * bySplit("test"))
    assert(bySplit.values.sum == 500)
  }

  test("stratified sample is reproducible and near the 10% target rate") {
    val s1 = PipelineQueries.stratifiedSample(spark, sf001).collect()
    val s2 = PipelineQueries.stratifiedSample(spark, sf001).collect()
    assert(s1.map(_.getLong(1)).sameElements(s2.map(_.getLong(1))))
    assert(s1.length > 20 && s1.length < 90, s"got ${s1.length} of 500 docs")
  }

  test("vocabulary df: every kept token appears in >= 1% of documents") {
    val rows = PipelineQueries.vocabDocFreq(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) * 100 >= 500))
    // sorted by df desc
    val dfs = rows.map(_.getLong(1))
    assert(dfs.zip(dfs.tail).forall { case (x, y) => x >= y })
  }

  test("subword counter: alpha runs, digit runs, punctuation pieces") {
    val df = spark.range(1).select(
      TextFunctions.subwordCount(lit("Hello, world42! a-b")).as("n"))
    // pieces: hello , world 42 ! a - b  => 8
    assert(df.head().getLong(0) == 8L)
  }

  test("corpus stats cover every language present exactly once") {
    val rows = PipelineQueries.corpusStats(spark, sf001).collect()
    val langs = rows.map(_.getString(0))
    assert(langs.distinct.sameElements(langs))
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)),
      "token mass >= doc count")
  }
}
