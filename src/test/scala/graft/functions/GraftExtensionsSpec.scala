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
}
