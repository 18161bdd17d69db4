package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("cosine_sim is callable from SQL via SparkSessionExtensions") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val sim = spark.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s")
        .collect().head.getDouble(0)
      assert(sim == 1.0)
      val orth = spark.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 2.0d)) AS s")
        .collect().head.getDouble(0)
      assert(orth == 0.0)
    } finally {
      // shared-JVM: don't stop the session (other suites reuse the context)
    }
  }

  test("sketch aggregators are callable from SQL after registerAggregates") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.registerAggregates(spark)
    import spark.implicits._
    (1 to 100).map(i => ("g", s"u${i % 7}", i.toLong)).toDF("g", "u", "v")
      .createOrReplaceTempView("ext_t")
    // HLL registers: 64 longs, estimate near 7
    val regs = spark.sql("SELECT hll_sketch(u) FROM ext_t GROUP BY g")
      .collect().head.getSeq[Long](0)
    assert(regs.length == 64)
    // KLL quartiles over 1..100: exact regime (n < 4096) → 25, 50, 75
    val q = spark.sql("SELECT kll_quartiles_k4096(v) FROM ext_t")
      .collect().head.getSeq[Long](0)
    assert(q == Seq(25L, 50L, 75L))
    // Count-Min: a single repeated token estimates >= its exact count
    val cms = spark.sql("SELECT cm_sketch(u) FROM ext_t").collect()
      .head.getSeq[Long](0)
    assert(cms.length == 4 * 256 && cms.sum == 4L * 100)
  }
}
