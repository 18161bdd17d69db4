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

  test("r19 single-block MD5 fast path is byte-identical to MessageDigest, " +
      "incl. the 55-byte boundary and the multi-block fallback") {
    // the hand-rolled one-compression MD5 serves every prefix+token ≤ 55
    // bytes; 56+ falls back to java.security. Sweep token lengths across
    // the boundary (prefix "0:"/"15:" = 2 and 3 bytes with k=16) plus
    // random binary-ish unicode so both paths and the seam between them
    // are pinned against the library digest.
    MinHashSignature.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lens = (0 to 70) ++ Seq(100, 500)
    val toks = lens.map { L =>
      new String(Array.fill(L)(('a' + rnd.nextInt(26)).toChar))
    } ++ Seq("", "é" * 30, "日" * 20, "x" * 52, "y" * 53, "z" * 54)
    val df = Seq(toks).toDF("toks")
    val row = df.select(
      call_function("minhash_sig", col("toks"), lit(16)).as("fast"),
      transform(sequence(lit(0), lit(15)),
        s => array_min(transform(col("toks"),
          t => md5(concat(s.cast("string"), lit(":"), t))))).as("ref"))
      .collect().head
    assert(row.getSeq[String](0) == row.getSeq[String](1))
    // and per-token digests agree (not only the k minima): singleton arrays
    for (t <- Seq("a" * 53, "b" * 54, "c" * 52, "日" * 18)) {
      val r = df.sparkSession.sql(
        s"SELECT minhash_sig(array('$t'), 16) AS fast, " +
          s"transform(sequence(0, 15), s -> " +
          s"  array_min(transform(array('$t'), " +
          s"    x -> md5(concat(cast(s AS string), ':', x))))) AS ref")
        .collect().head
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"len=${t.length}")
    }
  }
}
