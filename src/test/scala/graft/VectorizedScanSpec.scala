package graft

/** Vectorized-reader audit (VERDICT r4 item 8): every parquet scan in
  * every gated query must go through the columnar batch reader
  * (`ColumnarToRow` above the scan). A schema change that silently
  * knocks out vectorization (e.g. a type the vectorized reader refuses,
  * forcing parquet-mr row-by-row reads) is a multi-× scan regression at
  * 100 TB that no correctness gate would ever notice — this sweep makes
  * it a test failure with the offending query named.
  */
class VectorizedScanSpec extends SparkTestBase {

  test("all gated queries read parquet through the vectorized reader") {
    // each FileScan node prints `Batched: true` iff the columnar batch
    // reader serves it; queries with no parquet scan (pure stream/log
    // sources) are skipped by construction. No query is currently
    // allowed a row-by-row parquet scan.
    val scanLine = "Scan parquet[^\\n]*".r
    var audited = 0
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
          val scans = scanLine.findAllIn(plan).toSeq
          if (scans.nonEmpty) audited += 1
          val slow = scans.filterNot(_.contains("Batched: true"))
          if (slow.nonEmpty)
            Some(name -> s"${slow.size}/${scans.size} scans not batched")
          else None
        } catch {
          // plan-construction side effects (stream dirs, warehouse
          // tables) can throw on a second build in the same JVM; that is
          // Verify's concern, not this audit's
          case _: Throwable => None
        }
    }
    assert(audited > 100, s"audit must cover the surface (covered $audited)")
    assert(offenders.isEmpty,
      "non-vectorized parquet scans:\n" +
        offenders.map { case (n, d) => s"  $n: $d" }.mkString("\n"))
  }
}
