package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class IntersectCountSortedSpec extends SparkTestBase {

  private def count2(a: Seq[Long], b: Seq[Long]): Long = {
    IntersectCountSorted.register(spark)
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(call_function("intersect_count_sorted", col("a"), col("b"))
        .as("n"))
      .collect().head.getLong(0)
  }

  test("matches size(array_intersect) on sorted distinct arrays") {
    assert(count2(Seq(1L, 3L, 5L, 9L), Seq(3L, 4L, 5L, 10L)) == 2L)
    assert(count2(Seq(), Seq(1L, 2L)) == 0L)
    assert(count2(Seq(1L, 2L), Seq()) == 0L)
    assert(count2(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3L)
    assert(count2(Seq(-5L, 0L, 7L), Seq(-5L, 7L, 8L)) == 2L)
    assert(count2(Seq(1L, 2L), Seq(3L, 4L)) == 0L)
  }

  test("agrees with the built-in on random sorted sets, codegen and interpreted") {
    IntersectCountSorted.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(100).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(100).toLong)
        .distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b").select(
      call_function("intersect_count_sorted", col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
    // interpreted path (no codegen) must agree too
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val mismatches = rows.count { case (a, b) =>
      val got = IntersectCountSorted(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType)))
        .eval(null).asInstanceOf[Long]
      got != a.toSet.intersect(b.toSet).size.toLong
    }
    assert(mismatches == 0)
  }

  test("null inputs yield null") {
    IntersectCountSorted.register(spark)
    val r = spark.sql(
      "SELECT intersect_count_sorted(CAST(NULL AS ARRAY<BIGINT>)," +
        " array(1L, 2L)) AS n").collect().head
    assert(r.isNullAt(0))
  }
}
