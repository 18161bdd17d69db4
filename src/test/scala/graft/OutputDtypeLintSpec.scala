package graft

/** Schema-only sweep of every gated query through `DtypeLint` (VERDICT
  * r6 item 3): no query may EMIT a decimal wider than 18 digits — the
  * driver's hasher normalizes parquet decimal128 differently from the
  * oracle's int64, so such a column hash-fails the gate even when every
  * value matches (the round-6 `ams_f2_moment` / `embedding_norm_audit`
  * / `hits_power_iteration` failure class). Wide decimals remain fine
  * as INTERMEDIATES; only the output schema is linted. Analysis-only
  * (`df.schema`), so sweeping the full surface is cheap.
  */
class OutputDtypeLintSpec extends SparkTestBase {

  test("no gated query emits a decimal(p>18) output column") {
    var audited = 0
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val wide = DtypeLint.wideDecimalColumns(fn(spark, sf0001))
          audited += 1
          if (wide.nonEmpty) Some(s"$name: ${wide.mkString(", ")}") else None
        } catch {
          // builder side effects (stream dirs, warehouse tables) can
          // throw on a repeat build in the same JVM; Verify owns those
          case _: Throwable => None
        }
    }
    assert(audited > 100, s"lint must cover the surface (covered $audited)")
    assert(offenders.isEmpty,
      "decimal(p>18) output columns (cast finals to BIGINT):\n  " +
        offenders.mkString("\n  "))
  }
}
