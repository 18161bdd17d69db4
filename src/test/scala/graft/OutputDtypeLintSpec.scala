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

  // Builder side effects (stream dirs, warehouse tables) can throw on a
  // repeat build in the same JVM; Verify owns those queries' audit. The
  // skip budget is deliberately TIGHT and the skipped names are printed:
  // the pre-r9 form swallowed every Throwable and only asserted
  // audited > 100, which on a 276-query surface could silently exempt
  // ~175 queries from the sweep (ADVICE r8).
  private val maxSkipped = 8

  private def sweep(check: (String,
      org.apache.spark.sql.DataFrame) => Option[String]): Seq[String] = {
    val skipped = Seq.newBuilder[String]
    val findings = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try check(name, fn(spark, sf0001))
        catch { case e: Throwable =>
          skipped += s"$name (${e.getClass.getSimpleName})"
          None
        }
    }
    val sk = skipped.result()
    assert(sk.size <= maxSkipped,
      s"${sk.size} queries escaped the schema sweep (budget $maxSkipped):\n  " +
        sk.mkString("\n  "))
    if (sk.nonEmpty) info(s"sweep skipped ${sk.size}: ${sk.mkString(", ")}")
    findings
  }

  test("no gated query emits a decimal(p>18) output column") {
    val offenders = sweep { (name, df) =>
      val wide = DtypeLint.wideDecimalColumns(df)
      if (wide.nonEmpty) Some(s"$name: ${wide.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      "decimal(p>18) output columns (cast finals to BIGINT):\n  " +
        offenders.mkString("\n  "))
  }

  test("every gated query's emitted schema matches the checked-in pin") {
    val pinned = DtypeLint.loadPinned()
    assert(pinned.size > 100, s"pin snapshot missing/short (${pinned.size}) — " +
      "run `sbt 'runMain graft.tools.PinSchemas'`")
    val drifted = sweep { (name, df) =>
      DtypeLint.schemaViolation(name, df, pinned)
    }
    assert(drifted.isEmpty,
      "output-schema drift vs expected_schemas.tsv (if intentional, " +
        "regenerate via graft.tools.PinSchemas):\n  " + drifted.mkString("\n  "))
  }

  test("pin lint catches an injected int-width violation") {
    // a query pinned with a BIGINT column that starts emitting INT must
    // be flagged — int32 parquet hashes differently from the oracle's
    // int64 even when every value fits
    import org.apache.spark.sql.functions._
    val df = spark.range(3).select(col("id").cast("int").as("n_users"))
    val v = DtypeLint.schemaViolation(
      "injected", df, Map("injected" -> "n_users:BIGINT"))
    assert(v.exists(_.contains("schema drift")), s"int-width drift missed: $v")
  }

  test("pin lint catches an injected timestamp-unit/zone violation") {
    // TIMESTAMP (LTZ) vs the pinned TIMESTAMP_NTZ serializes tz-aware
    // parquet — the r4 lesson; the pin must flag the zone flip
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      to_timestamp(lit("2026-01-01 00:00:00")).as("ts"))
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val v = DtypeLint.schemaViolation(
      "injected", df, Map("injected" -> "ts:TIMESTAMP_NTZ"))
    assert(v.exists(_.contains("schema drift")), s"timestamp drift missed: $v")
  }

  test("pin lint refuses an unpinned query") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(lit(1L).as("x"))
    val v = DtypeLint.schemaViolation("brand_new_query", df, Map.empty)
    assert(v.exists(_.contains("UNPINNED")), s"unpinned query missed: $v")
  }
}
