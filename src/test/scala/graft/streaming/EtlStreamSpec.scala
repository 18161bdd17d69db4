package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase

/** Golden end-to-end (SURVEY.md §5(2)): canonical record + variants through
  * the full streaming pipeline (MemoryStream → transform → partitioned JSON
  * file sink + dead-letter), asserting reference output semantics.
  */
class EtlStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val canonical =
    """{"session_id": "a1", "customer_number": 100, "city": "Washington",
      | "country": "USA", "credit_limit": 1000, "browse_history": [
      | {"product_code": "Product1", "quantity": 2, "in_shopping_cart": true},
      | {"product_code": "Product2", "quantity": 1, "in_shopping_cart": false}]}"""
      .stripMargin.replace("\n", "")

  test("golden E2E: routed files + errors dir + derived fields in output JSON") {
    val dir = Files.createTempDirectory("graft-etl-e2e").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(
      canonical,
      canonical.replace("\"session_id\": \"a1\"", "\"session_id\": \"b2\"")
        .replace("\"country\": \"USA\"", "\"country\": \"Colombia\""),
      "corrupt {{{")

    val q = EtlStream.start(mem.toDF(), s"$dir/out", s"$dir/ckpt",
      dataCol = "value", trigger = Trigger.ProcessingTime(0))
    try q.processAllAvailable() finally q.stop()

    val usa = spark.read.json(s"$dir/out/data/route=usa")
    val intl = spark.read.json(s"$dir/out/data/route=international")
    val errs = spark.read.json(s"$dir/out/errors")

    assert(usa.count() == 1 && intl.count() == 1 && errs.count() == 1)
    // the sink holds the serialized wire record in `data`
    val wire = usa.select("data").as[String].collect().head
    assert(wire.contains(""""overall_product_quantity": 3"""))
    assert(wire.contains(""""overall_in_shopping_cart": 2"""))
    assert(wire.contains(""""total_different_products": 2"""))
    assert(wire.contains(""""session_id": "a1""""))
    assert(errs.select("error").as[String].collect().head == "corrupt_json")
  }

  test("restart from checkpoint does not reprocess (exactly-once upgrade)") {
    val dir = Files.createTempDirectory("graft-etl-restart").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(canonical)
    val q1 = EtlStream.start(mem.toDF(), s"$dir/out", s"$dir/ckpt",
      dataCol = "value", trigger = Trigger.ProcessingTime(0))
    try q1.processAllAvailable() finally q1.stop()

    // second run over the same checkpoint with new data only
    mem.addData(canonical.replace("\"a1\"", "\"z9\""))
    val q2 = EtlStream.start(mem.toDF(), s"$dir/out", s"$dir/ckpt",
      dataCol = "value", trigger = Trigger.ProcessingTime(0))
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.json(s"$dir/out/data")
    assert(out.count() == 2) // a1 once, z9 once — no duplicates
  }
}
