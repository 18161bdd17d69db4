package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SqDistAtSpec extends SparkTestBase {

  private def register(): Unit =
    FunctionRegistration.tempFunctionOnce(spark,
      "sq_dist_at", exprs => SqDistAt(exprs(0), exprs(1), exprs(2)))

  /** The unrolled chain the expression replaced — bit-compat reference. */
  private def chainRef(vec: org.apache.spark.sql.Column,
      w: Array[Double], offset: Int): org.apache.spark.sql.Column =
    w.indices.map { d =>
      val x = element_at(vec, offset + d + 1) - lit(w(d))
      x * x
    }.reduceLeft(_ + _)

  test("bit-identical to the unrolled (element_at - lit)^2 chain") {
    register()
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      Seq.fill(64)(rnd.nextInt(1001).toDouble - 500.0)
    }
    val w = Array.fill(8)(rnd.nextInt(1001).toDouble - 500.0)
    val wCol = array(w.toIndexedSeq.map(lit): _*)
    for (offset <- Seq(0, 8, 56)) {
      val df = rows.toDF("e").select(
        call_function("sq_dist_at", col("e"), wCol, lit(offset)).as("fast"),
        chainRef(col("e"), w, offset).as("ref"))
      // exact bit compare, not tolerance: the whole point is hash-gating
      assert(df.filter(col("fast") =!= col("ref")).count() == 0)
    }
  }

  test("interpreted path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val rnd = new scala.util.Random(13)
    val mismatches = (1 to 100).count { _ =>
      val e = Seq.fill(16)(rnd.nextDouble() * 100 - 50)
      val w = Seq.fill(4)(rnd.nextDouble() * 100 - 50)
      val off = rnd.nextInt(13)
      val got = SqDistAt(
        Literal.create(e, ArrayType(DoubleType)),
        Literal.create(w, ArrayType(DoubleType)),
        Literal.create(off, IntegerType)).eval(null).asInstanceOf[Double]
      var acc = 0.0
      for (d <- w.indices) { val x = e(off + d) - w(d); acc += x * x }
      java.lang.Double.doubleToRawLongBits(got) !=
        java.lang.Double.doubleToRawLongBits(acc)
    }
    assert(mismatches == 0)
  }

  test("null inputs yield null") {
    register()
    val r = spark.sql(
      "SELECT sq_dist_at(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d), 0) AS d")
      .collect().head
    assert(r.isNullAt(0))
  }
}
