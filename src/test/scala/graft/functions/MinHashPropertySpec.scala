package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.SparkTestBase

/** Property check: the codegen'd MinHash expression is value-identical to
  * the higher-order-function composition over RANDOM token arrays —
  * unicode, empty strings, empty arrays, huge ks of tokens (fixed seed so
  * the suite is deterministic).
  */
class MinHashPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""),
    Gen.oneOf("héllo", "日本語", "ñandú", "emoji🙂", "tab\tchar", "a:b"),
    Gen.listOfN(3, Gen.choose('!', '~')).map(_.mkString))

  private val docGen: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, tokenGen))

  test("minhash_sig == HOF composition on 200 random token arrays") {
    MinHashSignature.register(spark)
    val params = Gen.Parameters.default
    val docs = (0 until 200).flatMap(i =>
      docGen.apply(params, rng.Seed(42L + i))).toList
    val df = docs.toDF("toks").select(
      call_function("minhash_sig", $"toks", lit(8)).as("fast"),
      transform(sequence(lit(0), lit(7)),
        s => array_min(transform($"toks",
          t => md5(concat(s.cast("string"), lit(":"), t))))).as("ref"))
    df.collect().zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"doc $i diverged")
    }
  }
}
