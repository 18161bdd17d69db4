package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Squared L2 distance between a slice of an `array<double>` column and a
  * (typically literal) weight vector: Σ_d (vec[offset+d] − w[d])², summed
  * strictly left-to-right over d = 0 … len(w)−1.
  *
  * Why custom (the [[DotProduct]] argument, applied to plan WEIGHT rather
  * than row work): the PQ/IVF queries used to spell each of these
  * distances as an unrolled `(element_at(e,i) − lit)·(element_at(e,i) −
  * lit)` chain — 8 sub-codebooks × 8 codes × 8 dims plus 8 coarse
  * centroids × 64 dims ≈ 2 000 non-foldable Catalyst nodes per query.
  * The tree itself became the cost: ~0.5 MB of formatted plan, and every
  * task deserialized it (ProfileStages measured 35 s of task-deser +
  * 17 s GC against 1.5 s of actual compute on the 32-task coding stage).
  * Here the weights arrive as ONE folded array Literal and the chain is a
  * codegen'd loop — same arithmetic, constant-size plan.
  *
  * Bit-compat contract: the loop accumulates `acc += x·x` from 0.0 in
  * ascending d — identical bits to the `reduceLeft(_ + _)` chain it
  * replaces (0.0 + t₀ ≡ t₀ since squares are never −0.0) and to the
  * oracle's `(e[i] − c)·(e[i] − c) + …` SQL chains.
  *
  * `offset` is 0-based into `vec`; callers pass `m · SubDim` to score
  * subspace m. Out-of-range access is the caller's bug and surfaces as an
  * exception (the gated inputs are fixed 64-dim vectors).
  */
case class SqDistAt(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any, w: Any, o: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val wts = w.asInstanceOf[ArrayData]
    val off = o.asInstanceOf[Int]
    val n = wts.numElements()
    var acc = 0.0
    var d = 0
    while (d < n) {
      val x = vec.getDouble(off + d) - wts.getDouble(d)
      acc += x * x
      d += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, w, o) => {
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $w.numElements();
         |double $acc = 0.0;
         |for (int $d = 0; $d < $n; $d++) {
         |  double $x = $v.getDouble($o + $d) - $w.getDouble($d);
         |  $acc += $x * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
