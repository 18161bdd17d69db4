package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, LongType}
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** EXACT distinct-id set as a compressed Roaring bitmap, built as a typed
  * mergeable [[Aggregator]] — the ClickHouse-`groupBitmap` /
  * Druid-`DataSketches` shape for exact audience math at scale. Where
  * [[HyperLogLogAggregator]] trades 64 bytes for a ±13% estimate, this
  * keeps the EXACT member set in run-length-compressed form (clustered id
  * ranges cost ~2 bits/id), so downstream set algebra — retention AND,
  * audience OR — is exact, not inclusion-exclusion noise.
  *
  * 100 TB posture: bitmap OR is associative/commutative/idempotent, so
  * map-side combine applies and per-shard bitmaps re-merge exactly; a
  * day×audience GROUP BY ships one compressed bitmap per group instead of
  * the raw id stream (the shuffle is the point — `COUNT(DISTINCT)` over a
  * re-grouped key otherwise re-shuffles every row). The buffer rides
  * between rows as a live heap object (TypedImperativeAggregate keeps the
  * object; the encoder only pays at the shuffle boundary, where
  * Externalizable serialization is Roaring's own compressed wire format).
  *
  * The `finish` emits the PORTABLE serialized form (spec-pinned stable
  * across JVMs) so the bitmap can be stored, re-read and intersected by
  * [[BitmapAndCount]] / counted by [[BitmapCardinality]].
  */
class BitmapAggregator extends Aggregator[Long, Roaring64NavigableMap, Array[Byte]] {

  override def zero: Roaring64NavigableMap = new Roaring64NavigableMap()

  override def reduce(b: Roaring64NavigableMap, id: Long): Roaring64NavigableMap = {
    b.addLong(id); b
  }

  override def merge(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap = {
    a.or(b); a
  }

  override def finish(b: Roaring64NavigableMap): Array[Byte] =
    BitmapAggregator.toPortableBytes(b)

  override def bufferEncoder: Encoder[Roaring64NavigableMap] =
    Encoders.javaSerialization[Roaring64NavigableMap]
  override def outputEncoder: Encoder[Array[Byte]] =
    ExpressionEncoder[Array[Byte]]()
}

object BitmapAggregator {

  /** Column-API handle: `df.groupBy(k).agg(bitmap_agg(col("id")))`. */
  def bitmapAgg: org.apache.spark.sql.expressions.UserDefinedFunction = {
    import org.apache.spark.sql.functions.udaf
    udaf(new BitmapAggregator, ExpressionEncoder[Long]())
  }

  def toPortableBytes(b: Roaring64NavigableMap): Array[Byte] = {
    b.runOptimize()
    val bos = new ByteArrayOutputStream()
    b.serializePortable(new DataOutputStream(bos))
    bos.toByteArray
  }

  def fromPortableBytes(bytes: Array[Byte]): Roaring64NavigableMap = {
    val b = new Roaring64NavigableMap()
    b.deserializePortable(new DataInputStream(new ByteArrayInputStream(bytes)))
    b
  }

  // Static entry points referenced from generated code (codegen calls a
  // static-shaped method; Scala object methods compile to exactly that).
  def cardinality(bytes: Array[Byte]): Long =
    fromPortableBytes(bytes).getLongCardinality

  def andCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val x = fromPortableBytes(a)
    x.and(fromPortableBytes(b))
    x.getLongCardinality
  }

  /** Registers `bitmap_cardinality` / `bitmap_and_count` for the session
    * (idempotent), mirroring [[IntersectCountSorted.register]].
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    FunctionRegistration.tempFunctionOnce(spark,
      "bitmap_cardinality", exprs => BitmapCardinality(exprs(0)))
    FunctionRegistration.tempFunctionOnce(spark,
      "bitmap_and_count", exprs => BitmapAndCount(exprs(0), exprs(1)))
  }
}

/** `bitmap_cardinality(bin)` — exact member count of a portable-serialized
  * Roaring bitmap. Codegen'd via a static helper call; the deserialization
  * cost is per-GROUP (bitmaps only exist post-aggregation), never per raw
  * row, so this sits outside the scan hot path by construction.
  */
case class BitmapCardinality(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BitmapAggregator.cardinality(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BitmapAggregator.cardinality($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bitmap_and_count(bin, bin)` — exact |A ∩ B| of two portable-serialized
  * Roaring bitmaps. Runs on the POST-AGGREGATION table (one row per group
  * pair — e.g. 52×4 week-pair rows for a retention matrix), so the
  * deserialize-per-row cost is bounded by the group domain, not the data.
  */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapAggregator.andCardinality(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitmapAggregator.andCardinality($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
