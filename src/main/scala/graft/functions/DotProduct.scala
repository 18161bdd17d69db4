package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product over two `array<double>` columns as a native Catalyst
  * expression with whole-stage codegen — the hyperplane-projection hot
  * loop of LSH bucketing ([[graft.sim.Similarity.lshBucket]] evaluates
  * one projection per signature bit per row).
  *
  * Why custom (same argument as [[CosineSimilarity]]): the built-in
  * `aggregate(zip_with(a, b, *), 0, +)` composition runs as an
  * INTERPRETED lambda per element and materializes the product array;
  * this is one allocation-free fused loop inside the codegen span.
  *
  * Accumulation is strict left-to-right double addition starting at 0.0
  * — identical to the built-in fold it replaces and to DuckDB's
  * `list_dot_product` (bit-for-bit, verified by the gated LSH queries).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
