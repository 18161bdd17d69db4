package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the simhash NULL contract (round-12 advice): NULL text yields the
  * zero signature — same as the pre-r11 when/otherwise form — so
  * downstream xor/hamming comparisons never see a NULL signature.
  */
class SimhashNullSpec extends SparkTestBase {
  import spark.implicits._

  test("null text → signature 0L, and hamming vs 0L never NULL-poisons") {
    val df = Seq((1L, "alpha beta gamma"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.simhash($"text").as("sig"))
    val rows = df.orderBy("doc_id").collect()
    assert(!rows(1).isNullAt(1), "null text must not produce a NULL signature")
    assert(rows(1).getLong(1) === 0L)
    val hams = df.select(Dedup.hammingDistance($"sig", lit(0L)).as("h"))
      .collect().map(r => Option(r.get(0)))
    assert(hams.forall(_.isDefined)) // no NULL poisoning through hamming
  }

  test("empty text hashes its single empty token (only NULL maps to 0)") {
    // split("") yields [""], so the empty document carries md5("")'s bit
    // pattern — unchanged pre/post the r12 coalesce, which touches NULL only.
    val sig = Seq((1L, "")).toDF("doc_id", "text")
      .select(Dedup.simhash($"text")).head.getLong(0)
    assert(sig !== 0L)
  }
}
