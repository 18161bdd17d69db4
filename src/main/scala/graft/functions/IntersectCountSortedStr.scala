package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `|A ∩ B|` over two SORTED `array<string>` columns — the string twin of
  * [[IntersectCountSorted]], for the per-candidate-pair verify loops whose
  * set elements are tokens or character grams rather than hashes
  * (`minhash_accuracy`, `ppjoin_exact_pairs` score millions of LSH/prefix
  * candidates against distinct-token arrays).
  *
  * Why custom (same argument): `size(array_intersect(a, b))` builds a
  * hash set of one side AND materializes the intersection array per pair
  * only to read its length; on sorted inputs the count is an
  * allocation-free two-pointer walk of binary `UTF8String.compareTo`s
  * inside the codegen span.
  *
  * Caller contract: inputs must be duplicate-free (both call sites build
  * them with `array_distinct`) and ascending-sorted with `array_sort`,
  * whose default StringType ordering is the same binary compare this walk
  * uses — unsorted inputs undercount silently. Null ELEMENTS are not
  * supported (the token/gram builders never produce them).
  */
case class IntersectCountSortedStr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { n += 1L; i += 1; j += 1 }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val cnt = ctx.freshName("cnt")
      val c = ctx.freshName("c")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c < 0) { $i++; }
         |  else if ($c > 0) { $j++; }
         |  else { $cnt++; $i++; $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCountSortedStr {
  /** Registers `intersect_count_sorted_str` for the session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionRegistration.tempFunctionOnce(spark,
      "intersect_count_sorted_str",
      exprs => IntersectCountSortedStr(exprs(0), exprs(1)))
}
