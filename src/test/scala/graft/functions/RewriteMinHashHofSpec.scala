package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The optimizer rule must rewrite EXACTLY the canonical HOF MinHash
  * composition to [[MinHashSignature]], leave near-misses untouched, and
  * preserve values. (Inputs are parquet-backed — a LocalRelation source
  * would be constant-folded before the rewrite is observable.)
  */
class RewriteMinHashHofSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")
    .limit(20)
    .select(graft.text.TextFunctions.tokens(col("text")).as("toks"))

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteMinHashHof
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq RewriteMinHashHof)
  }

  private def hof(k: Int, sep: String = ":", start: Int = 0) =
    transform(sequence(lit(start), lit(start + k - 1)),
      s => array_min(transform(col("toks"),
        t => md5(concat(s.cast("string"), lit(sep), t)))))

  private def usesNative(df: org.apache.spark.sql.DataFrame): Boolean = {
    var found = false
    df.queryExecution.optimizedPlan.foreach { node =>
      node.expressions.foreach(root =>
        root.foreach(e => found ||= e.isInstanceOf[MinHashSignature]))
    }
    found
  }

  test("canonical composition rewrites to the native expression, same values") {
    val plain = docs.select(hof(8).as("sig")).collect()
    withRule {
      val df = docs.select(hof(8).as("sig"))
      assert(usesNative(df), df.queryExecution.optimizedPlan.toString)
      df.collect().zip(plain).foreach { case (a, b) =>
        assert(a.getSeq[String](0) == b.getSeq[String](0))
      }
    }
  }

  test("near-misses do not rewrite (different seed start / separator)") {
    withRule {
      assert(!usesNative(docs.select(hof(4, start = 1).as("sig"))))
      assert(!usesNative(docs.select(hof(4, sep = "|").as("sig"))))
    }
  }

  test("seed-dependent token arrays do not rewrite") {
    withRule {
      // the inner array depends on the seed binder — not a minhash
      val df = docs.select(
        transform(sequence(lit(0), lit(3)),
          s => array_min(transform(
            array(s.cast("string"), lit("fixed")),
            t => md5(concat(s.cast("string"), lit(":"), t))))).as("sig"))
      assert(!usesNative(df), df.queryExecution.optimizedPlan.toString)
    }
  }

  test("SQL-authored composition rewrites too") {
    withRule {
      docs.createOrReplaceTempView("hof_docs")
      val df = spark.sql(
        """SELECT transform(sequence(0, 3),
          |  s -> array_min(transform(toks,
          |    t -> md5(concat(cast(s AS string), ':', t))))) AS sig
          |FROM hof_docs""".stripMargin)
      assert(usesNative(df), df.queryExecution.optimizedPlan.toString)
      val sig = df.collect().head.getSeq[String](0)
      assert(sig.length == 4 && sig.forall(s => s == null || s.length == 32))
    }
  }
}
