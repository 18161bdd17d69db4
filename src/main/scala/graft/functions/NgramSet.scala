package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a token array as a native Catalyst
  * expression — the codegen twin of the HOF composition
  * `array_distinct(transform(sequence(1, greatest(size(toks)-n+1, 1)),
  * i -> concat_ws(' ', slice(toks, i, n))))` that
  * [[graft.text.Dedup.ngramSetOfTokens]] shipped through r17.
  *
  * Why custom (the [[MinHashSignature]] argument): lambda expression
  * trees evaluate INTERPRETED — per document the old composition paid a
  * sequence materialization, an interpreter dispatch per position, a
  * slice allocation per gram and a full array copy in array_distinct;
  * eleven gated queries explode this shape over the whole corpus. This
  * is one compiled loop with a first-occurrence-ordered hash set.
  *
  * Bit-compat contract (each clause mirrors the HOF it replaces):
  *  - fewer than n tokens → ONE gram over all tokens (sequence's
  *    `greatest(…, 1)` lower clamp), so an empty token array yields
  *    `[""]`, not `[]`;
  *  - null ELEMENTS are skipped by the join exactly like `concat_ws`
  *    (no doubled separator);
  *  - dedup preserves first-occurrence order (`array_distinct`);
  *  - null token array → null (the transform chain is null-intolerant).
  *
  * `n` (the right operand) must be a foldable positive integer.
  */
case class NgramSet(left: Expression, right: Expression)
    extends BinaryExpression {

  require(right.foldable, "ngram_set(tokens, n): n must be a literal")

  private lazy val n: Int = right.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"ngram_set n must be an integer literal, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(toks: Any, nAny: Any): Any =
    NgramSetImpl.compute(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _) =>
      s"${ev.value} = graft.functions.NgramSetImpl.compute($toks, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NgramSet {
  /** Registers `ngram_set` on the session's function registry
    * (idempotent).
    */
  def register(spark: SparkSession): Unit =
    FunctionRegistration.tempFunctionOnce(spark,
      "ngram_set", exprs => NgramSet(exprs(0), exprs(1)))
}

/** Compiled n-gram loop, called from interpreted eval and generated code
  * (static forwarders let Janino resolve `NgramSetImpl.compute`).
  */
object NgramSetImpl {

  private val Sep = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    val count = math.max(sz - n + 1, 1)
    // first-occurrence order ≡ array_distinct
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, sz)
      var j = i
      var m = 0
      while (j < end) {
        // concat_ws semantics: null elements are skipped entirely
        if (!toks.isNullAt(j)) { parts(m) = toks.getUTF8String(j); m += 1 }
        j += 1
      }
      val gram =
        if (m == 0) UTF8String.EMPTY_UTF8
        else if (m == 1) parts(0)
        else UTF8String.concatWs(Sep, java.util.Arrays.copyOf(parts, m): _*)
      seen.add(gram)
      i += 1
    }
    new GenericArrayData(seen.toArray(
      new Array[AnyRef](seen.size())).asInstanceOf[Array[Any]])
  }
}
