package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The codegen'd MinHash expression must be value-identical to the
  * reference higher-order-function composition (the definition the DuckDB
  * oracle replays): for seed s, min over tokens of md5(s + ":" + token) as
  * a lowercase hex string.
  */
class MinHashSignatureSpec extends SparkTestBase {

  private def hofSignature(toks: org.apache.spark.sql.Column, k: Int) =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(toks,
        t => md5(concat(s.cast("string"), lit(":"), t)))))

  test("expression matches the HOF composition on real corpus tokens") {
    MinHashSignature.register(spark)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val toks = docs.select(graft.text.TextFunctions.tokens(col("text")).as("toks"))
    val both = toks.select(
      call_function("minhash_sig", col("toks"), lit(16)).as("fast"),
      hofSignature(col("toks"), 16).as("ref"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("empty token array yields k nulls (array_min-over-empty parity)") {
    MinHashSignature.register(spark)
    val out = spark.sql(
      "SELECT minhash_sig(array(), 4) AS sig")
      .collect().head.getSeq[String](0)
    assert(out == Seq(null, null, null, null))
  }

  test("unicode tokens hash over UTF-8 bytes like md5()") {
    MinHashSignature.register(spark)
    val row = spark.sql(
      "SELECT minhash_sig(array('héllo', '日本語'), 2) AS fast, " +
        "transform(sequence(0, 1), s -> " +
        "  array_min(transform(array('héllo', '日本語'), " +
        "    t -> md5(concat(cast(s AS string), ':', t))))) AS ref")
      .collect().head
    assert(row.getSeq[String](0) == row.getSeq[String](1))
  }
}
