package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, DecimalType, StructType, ArrayType, MapType}

/** Gate-output dtype lint (VERDICT r6 item 3). The driver's hasher
  * normalizes parquet `decimal128(p>18)` differently from int64, so a
  * query whose FINAL column is a wide decimal hash-mismatches a DuckDB
  * oracle that emits BIGINT even when every cell is bit-identical —
  * exactly what happened to `ams_f2_moment`, `embedding_norm_audit` and
  * `hits_power_iteration` in round 6. Repo convention: widen
  * intermediates to DECIMAL(38,0)/HUGEINT as needed, but narrow every
  * emitted column back to BIGINT (values are kept in int64 range at
  * gate scale by construction). This lint makes a violation of that
  * convention structurally impossible to ship: `Verify.main` refuses to
  * finish green with one, and `OutputDtypeLintSpec` fails `sbt test`
  * the moment a query is added.
  */
object DtypeLint {

  /** Names of output columns whose type (at any nesting depth) is a
    * decimal wider than 18 digits — i.e. one that parquet must encode
    * as a 128-bit decimal, which the driver-side hasher does not
    * normalize to the oracle's int64. */
  def wideDecimalColumns(df: DataFrame): Seq[String] = {
    def wide(t: DataType): Boolean = t match {
      case d: DecimalType => d.precision > 18
      case a: ArrayType => wide(a.elementType)
      case m: MapType => wide(m.keyType) || wide(m.valueType)
      case s: StructType => s.fields.exists(f => wide(f.dataType))
      case _ => false
    }
    df.schema.fields.filter(f => wide(f.dataType)).map(_.name).toSeq
  }

  // -------------------------------------------------- schema pinning
  //
  // r7 generalization: the decimal128 failure class (identical values,
  // hash mismatch from the EMITTED dtype alone) also covers
  // int32-vs-int64 drift and timestamp-unit/zone drift
  // (TIMESTAMP_NTZ vs LTZ). Every gated query's output schema is
  // therefore PINNED in a checked-in snapshot
  // (`src/main/resources/graft/expected_schemas.tsv`, regenerated via
  // `graft.tools.PinSchemas` when the surface legitimately changes);
  // `Verify.main` and `OutputDtypeLintSpec` both refuse a drifted or
  // unpinned output schema.

  /** Canonical, hasher-relevant schema string: column name + Spark SQL
    * dtype, sorted by column name (the driver's compare sorts columns
    * by name), nullability-insensitive (plan changes legitimately move
    * nullability inference; the hasher doesn't care). */
  def canonicalSchema(df: DataFrame): String =
    df.schema.fields
      .map(f => s"${f.name}:${f.dataType.sql}")
      .sorted
      .mkString(", ")

  /** Mismatch report for one query against the pinned snapshot: None if
    * the emitted schema matches its pin; Some(description) when the
    * query is unpinned or any column's name/dtype drifted. */
  def schemaViolation(
      name: String,
      df: DataFrame,
      pinned: Map[String, String]): Option[String] = {
    val actual = canonicalSchema(df)
    pinned.get(name) match {
      case None => Some(s"$name: UNPINNED (add to expected_schemas.tsv " +
        s"via graft.tools.PinSchemas) — emits [$actual]")
      case Some(exp) if exp != actual =>
        Some(s"$name: schema drift\n    pinned:  [$exp]\n    emitted: [$actual]")
      case _ => None
    }
  }

  /** Load the checked-in pin snapshot (name\tschema per line) from the
    * classpath. */
  def loadPinned(): Map[String, String] = {
    val in = getClass.getResourceAsStream("/graft/expected_schemas.tsv")
    if (in == null) Map.empty
    else try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty)
        .map { l => val i = l.indexOf('\t'); l.substring(0, i) -> l.substring(i + 1) }
        .toMap
    } finally in.close()
  }
}
