package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class IntersectCountSortedStrSpec extends SparkTestBase {

  test("matches size(array_intersect) on sorted distinct string arrays") {
    IntersectCountSortedStr.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // vocabulary with shared prefixes + multi-byte chars to exercise the
    // binary compare (array_sort's default StringType order)
    val vocab = Vector("a", "ab", "abc", "b", "ba", "zz", "α", "αβ", "é",
      "tok1", "tok12", "tok2", "", " ", "  x")
    val rows = (1 to 300).map { _ =>
      val a = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).distinct
      val b = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).distinct
      (a, b)
    }
    val df = rows.toDF("a0", "b0")
      .select(array_sort(col("a0")).as("a"), array_sort(col("b0")).as("b"))
      .select(
        call_function("intersect_count_sorted_str", col("a"), col("b"))
          .as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("interpreted path agrees with set intersection") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val rnd = new scala.util.Random(19)
    val vocab = Vector("x", "xy", "y", "yz", "z", "w1", "w2")
    val mismatches = (1 to 200).count { _ =>
      val a = Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .distinct.sorted
      val got = IntersectCountSortedStr(
        Literal.create(a, ArrayType(StringType)),
        Literal.create(b, ArrayType(StringType)))
        .eval(null).asInstanceOf[Long]
      got != a.toSet.intersect(b.toSet).size.toLong
    }
    assert(mismatches == 0)
  }

  test("null inputs yield null") {
    IntersectCountSortedStr.register(spark)
    val r = spark.sql(
      "SELECT intersect_count_sorted_str(CAST(NULL AS ARRAY<STRING>)," +
        " array('a')) AS n").collect().head
    assert(r.isNullAt(0))
  }
}
