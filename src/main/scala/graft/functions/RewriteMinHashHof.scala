package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the PORTABLE higher-order-function MinHash
  * composition
  *
  * {{{
  * transform(sequence(0, k-1),
  *   s -> array_min(transform(toks, t -> md5(concat(cast(s AS string), ':', t)))))
  * }}}
  *
  * into the codegen'd [[MinHashSignature]] expression. The composition is
  * the cross-engine definition (it is what the DuckDB oracle runs and what
  * a SQL user ports in); HOF lambdas evaluate interpreted in Spark, so the
  * rewrite buys the compiled loop (~6× on real corpora) without the user
  * knowing the native expression exists — the same contract as Catalyst's
  * own expression-canonicalization rewrites.
  *
  * Matching is strictly structural: only the exact canonical tree (seed
  * sequence starting at 0, the `seed:token` concat under md5, both lambda
  * variables bound to the right binders) rewrites; anything else is left
  * untouched, so the rule is semantics-preserving by construction and
  * idempotent (the result contains no `transform`).
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`) or at
  * runtime with `spark.experimental.extraOptimizations`.
  */
object RewriteMinHashHof extends Rule[LogicalPlan] {

  private object ColonLiteral {
    def unapply(e: Expression): Boolean = e match {
      case Literal(s: UTF8String, StringType) => s.toString == ":"
      case _ => false
    }
  }

  /** `sequence(0, k-1)` — pre- OR post-constant-folding (ConstantFolding
    * collapses the foldable Sequence into a literal int array before
    * extension rules run).
    */
  private object SeedSequence {
    def unapply(e: Expression): Option[Int] = e match {
      case Sequence(IntegerLiteral(0), IntegerLiteral(kMinus1), None, _)
          if kMinus1 >= 0 => Some(kMinus1 + 1)
      case Literal(arr: ArrayData, ArrayType(IntegerType, _)) =>
        val vals = arr.toIntArray()
        if (vals.nonEmpty && vals.indices.forall(i => vals(i) == i))
          Some(vals.length)
        else None
      case _ => None
    }
  }

  private object CanonicalMinHash {
    def unapply(e: Expression): Option[(Expression, Int)] = e match {
      case ArrayTransform(
          SeedSequence(k),
          LambdaFunction(
            ArrayMin(ArrayTransform(toks,
              LambdaFunction(
                Md5(Cast(Concat(Seq(
                  Cast(sv: NamedLambdaVariable, StringType, _, _),
                  c @ _,
                  tv: NamedLambdaVariable)), BinaryType, _, _)),
                Seq(tv2: NamedLambdaVariable), _))),
            Seq(sv2: NamedLambdaVariable), _))
          if ColonLiteral.unapply(c) &&
            sv.exprId == sv2.exprId && tv.exprId == tv2.exprId &&
            // the token expression must not itself depend on either lambda
            // binder (a seed-dependent token array is NOT a minhash)
            !toks.exists {
              case v: NamedLambdaVariable =>
                v.exprId == sv2.exprId || v.exprId == tv2.exprId
              case _ => false
            } =>
        Some((toks, k))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CanonicalMinHash(toks, k) => MinHashSignature(toks, Literal(k))
    }
}
