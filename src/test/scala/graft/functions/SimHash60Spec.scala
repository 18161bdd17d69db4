package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SimHash60Spec extends SparkTestBase {

  /** The HOF composition the expression replaced — the reference. */
  private def hofRef(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hashes = transform(toks,
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val counters = aggregate(
      hashes,
      array_repeat(lit(0L), 60),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(59)),
        (c, b) => c + when(call_function("shiftright", h, b)
          .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)))
    aggregate(
      counters,
      struct(lit(0).as("b"), lit(0L).as("acc")),
      (st, c) => struct(
        (st.getField("b") + 1).as("b"),
        (st.getField("acc") + when(c > 0,
          call_function("shiftleft", lit(1L), st.getField("b")))
          .otherwise(lit(0L))).as("acc")),
      st => st.getField("acc"))
  }

  test("identical to the aggregate/zip_with composition") {
    SimHash60.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "x2", "", "θ")
    val rows = (1 to 150).map { _ =>
      Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
    } ++ Seq(Seq.empty[String], Seq("solo"))
    val df = rows.toDF("toks").select(
      call_function("simhash60", col("toks")).as("fast"),
      hofRef(col("toks")).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("null token element decrements every counter like the lambda") {
    SimHash60.register(spark)
    val r = spark.sql(
      "SELECT simhash60(array('tok', CAST(NULL AS STRING))) AS fast")
      .collect().head.getLong(0)
    // reference: single 'tok' contributes ±1 per bit; the null token
    // contributes −1 per bit; positive counters need strict > 0 → 0
    assert(r == 0L)
  }

  test("null array is null (callers coalesce)") {
    SimHash60.register(spark)
    val r = spark.sql(
      "SELECT simhash60(CAST(NULL AS ARRAY<STRING>)) AS s").collect().head
    assert(r.isNullAt(0))
  }
}
