package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 60-bit SimHash of a token array as a native Catalyst expression — the
  * codegen twin of the aggregate/zip_with HOF composition
  * [[graft.text.Dedup.simhash]] shipped through r17:
  *
  *   h(t)        = conv(substring(md5(t), 1, 15), 16, 10)  (top 60 bits)
  *   counters[b] = Σ_t (bit b of h(t) ? +1 : −1)
  *   sig         = Σ_b (counters[b] > 0 ? 1<<b : 0)
  *
  * Why custom (the [[MinHashSignature]] argument): the HOF form runs
  * interpreted and allocates a fresh 60-element counter array PLUS a
  * 60-element sequence per TOKEN (zip_with inside the fold) — ~200
  * tokens/doc × 60 × two allocations on the corpus's hottest map stage.
  * This is one compiled loop: md5 once per token
  * ([[Md5Bits.top60]], spec-pinned ≡ the conv/substring round-trip),
  * sixty primitive adds per token, zero allocation beyond one counter
  * array per document.
  *
  * Bit-compat contract: a null token element decrements every counter —
  * exactly what the old lambda did (`when(null = 1, +1).otherwise(-1)`);
  * an empty array yields 0 (no counter positive); a null ARRAY yields
  * null (callers wrap in `coalesce(_, 0L)` as before).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(toks: Any): Any =
    SimHash60Impl.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, toks =>
      s"graft.functions.SimHash60Impl.compute($toks)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SimHash60 {
  /** Registers `simhash60` on the session's function registry
    * (idempotent).
    */
  def register(spark: SparkSession): Unit =
    FunctionRegistration.tempFunctionOnce(spark,
      "simhash60", exprs => SimHash60(exprs(0)))
}

/** Compiled SimHash loop, called from interpreted eval and generated code. */
object SimHash60Impl {

  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counters = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        // old lambda semantics: a null hash fails the bit test → −1
        var b = 0
        while (b < 60) { counters(b) -= 1; b += 1 }
      } else {
        val h = Md5Bits.top60(Md5Bits.md5(toks.getUTF8String(i).getBytes))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (counters(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}
