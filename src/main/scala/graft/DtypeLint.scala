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
}
