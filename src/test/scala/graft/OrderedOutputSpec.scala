package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the total-order contract of the r12 `QueryShapes.orderedBelow`
  * reshape: range partitions are emitted in key order, rows are sorted
  * within each partition, and the projections above preserve row order —
  * so `collect()` yields globally key-ordered output WITHOUT a global
  * Sort above the heavy projection. If a future Spark version or plan
  * change broke any link in that chain, these assertions — not a silent
  * reordering in production — catch it.
  */
class OrderedOutputSpec extends SparkTestBase {

  private def assertOrdered(name: String, keyCols: Seq[String]): Unit = {
    val df = SparkEntry.queries(name)(spark, sf001)
    val keys = df.select(keyCols.head, keyCols.tail: _*).collect().map { r =>
      keyCols.indices.map(i => r.get(i) match {
        case l: java.lang.Long => f"$l%020d"
        case other => String.valueOf(other)
      }).mkString("\u0000")
    }
    assert(keys.nonEmpty, s"$name returned no rows")
    assert(keys.sameElements(keys.sorted),
      s"$name: collect() not ordered by ${keyCols.mkString(",")}")
  }

  test("reshaped queries emit totally ordered output without a global sort") {
    assertOrdered("text_stats", Seq("doc_id"))
    assertOrdered("dedup_simhash", Seq("doc_id"))
    assertOrdered("pii_scrub", Seq("doc_id"))
    assertOrdered("embed_quantize", Seq("vec_id"))
    assertOrdered("embed_random_projection", Seq("vec_id"))
    assertOrdered("scalar_functions_array", Seq("o_orderkey"))
    assertOrdered("quality_filter_pipeline", Seq("doc_id"))
    // etl_enrich_sessions left this list in r13: its range input was a
    // heavy AGGREGATE (not a scan), so the bounds sample re-ran the 750M-
    // row join+collect_list — 43% of the ×1000 query — for an ordering
    // the ETL semantics never required. It now emits hash-partitioned,
    // unordered output and does the heavy work once.
    assertOrdered("multimodal_decode", Seq("media_id"))
    assertOrdered("multimodal_frame_sample", Seq("media_id", "sample_idx"))
    assertOrdered("multimodal_imageio_decode", Seq("media_id"))
  }
}
