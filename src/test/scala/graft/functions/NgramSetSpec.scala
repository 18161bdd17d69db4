package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class NgramSetSpec extends SparkTestBase {

  /** The HOF composition this expression replaced — the reference. */
  private def hofRef(toks: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))

  test("identical to the HOF composition, incl. short/empty inputs") {
    NgramSet.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("the", "cat", "sat", "on", "a", "mat", "x", "")
    val rows = (1 to 300).map { _ =>
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
    } ++ Seq(Seq.empty[String], Seq("one"), Seq("one", "two"))
    for (n <- Seq(2, 3, 5)) {
      val df = rows.toDF("toks").select(
        call_function("ngram_set", col("toks"), lit(n)).as("fast"),
        hofRef(col("toks"), n).as("ref"))
      assert(df.filter(col("fast") =!= col("ref")).count() == 0,
        s"mismatch at n=$n")
    }
  }

  test("null elements are skipped like concat_ws") {
    NgramSet.register(spark)
    val r = spark.sql(
      "SELECT ngram_set(array('a', CAST(NULL AS STRING), 'b'), 2) AS g," +
        " array_distinct(transform(sequence(1, greatest(3 - 1, 1))," +
        "   i -> concat_ws(' ', slice(array('a', CAST(NULL AS STRING), 'b'), i, 2)))) AS ref")
      .collect().head
    assert(r.getSeq[String](0) == r.getSeq[String](1))
  }

  test("null token array yields null") {
    NgramSet.register(spark)
    val r = spark.sql(
      "SELECT ngram_set(CAST(NULL AS ARRAY<STRING>), 3) AS g")
      .collect().head
    assert(r.isNullAt(0))
  }
}
