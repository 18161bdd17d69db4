package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-value MinHash signature over a token array as a native Catalyst
  * expression: for seed s in [0, k), the minimum over tokens of
  * md5(s + ":" + token), emitted as the lowercase hex digest — exactly the
  * definition the DuckDB oracle replays in SQL, and exactly what the
  * higher-order-function composition
  * `transform(sequence(0,k-1), s -> array_min(transform(toks, t -> md5(...))))`
  * computes.
  *
  * Why custom (SURVEY.md §7.3): the HOF composition evaluates interpreted
  * (lambda expression trees are not codegen'd) and allocates a k-element
  * array of token-length hash arrays per document; this expression runs one
  * compiled loop per document with a thread-cached MessageDigest, compares
  * digests as raw bytes (hex encoding is monotonic in the digest bytes, so
  * byte-order min ≡ hex-string min), and hex-encodes only the k winners.
  * Measured ~6× on the sf0.1 documents corpus — the dominant cost of the
  * MinHash-LSH dedup path.
  *
  * `k` (the right operand) must be a foldable positive integer.
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  require(right.foldable, "minhash_sig(tokens, k): k must be a literal")

  private lazy val k: Int = right.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"minhash_sig k must be an integer literal, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(toks: Any, kAny: Any): Any =
    MinHashImpl.compute(toks.asInstanceOf[ArrayData], k)

  /** Stays inside whole-stage codegen: the generated code is one static
    * call into the compiled loop (same pattern as Spark's own
    * `StaticInvoke`-backed expressions).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _) =>
      s"${ev.value} = graft.functions.MinHashImpl.compute($toks, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinHashSignature {
  /** Registers `minhash_sig` on the session's function registry
    * (idempotent), mirroring [[graft.sim.Similarity.registerCosine]].
    */
  def register(spark: SparkSession): Unit =
    FunctionRegistration.tempFunctionOnce(spark,
      "minhash_sig",
      exprs => MinHashSignature(exprs(0), exprs(1)))
}

/** Compiled MinHash loop, called from both interpreted eval and generated
  * code (the class gets static forwarders, so Janino resolves
  * `MinHashImpl.compute`).
  */
object MinHashImpl {

  private val mdLocal: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  /** "0:", "1:", … seed prefixes, cached per k (k is a per-query constant). */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      kk => Array.tabulate(kk)(s => (s.toString + ":").getBytes("UTF-8")))

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned byte-wise less-than over two 16-byte digests — identical
    * ordering to comparing their lowercase hex renderings as strings.
    */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val mins = new Array[Array[Byte]](k)
    val pre = prefixes(k)
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val tok = toks.getUTF8String(i).getBytes
        var s = 0
        while (s < k) {
          md.reset()
          md.update(pre(s))
          md.update(tok)
          val d = md.digest()
          if (mins(s) == null || less(d, mins(s))) mins(s) = d
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var s = 0
    while (s < k) {
      out(s) = if (mins(s) == null) null else hex(mins(s))
      s += 1
    }
    new GenericArrayData(out)
  }
}
