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

  // ------------------------------------------------- single-block MD5
  // r19: the signature pass hashes k digests per TOKEN through
  // MessageDigest — engine dispatch, internal buffering and a fresh
  // 16-byte digest allocation per (token, seed). But `seed + ":" +
  // token` is ≤ 55 bytes for every real token, i.e. ONE padded MD5
  // block, so the full algorithm collapses to a single compression
  // (RFC 1321) over a thread-reused 64-byte buffer: no allocation, no
  // engine overhead, and the token+padding bytes are laid out once per
  // prefix-length group instead of re-copied for each of the k seeds.
  // Longer inputs fall back to MessageDigest (same digest by
  // definition); [[MinHashSignatureSpec]] pins byte equality of both
  // paths against the java.security result.

  private val K = Array(
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)

  private val S = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  /** Scratch for the single-block path: the 64-byte padded block, its
    * 16 little-endian words and the 16-byte digest — reused per thread.
    */
  private final class Scratch {
    val block = new Array[Byte](64)
    val m = new Array[Int](16)
    val dig = new Array[Byte](16)
  }

  private val scratchLocal: ThreadLocal[Scratch] =
    new ThreadLocal[Scratch] { override def initialValue(): Scratch = new Scratch }

  /** One MD5 compression of the (already padded) 64-byte block in
    * `sc.block`; digest into `sc.dig`. RFC 1321 verbatim.
    */
  private def md5SingleBlock(sc: Scratch): Unit = {
    val block = sc.block
    val m = sc.m
    var w = 0
    while (w < 16) {
      val o = w * 4
      m(w) = (block(o) & 0xff) | ((block(o + 1) & 0xff) << 8) |
        ((block(o + 2) & 0xff) << 16) | ((block(o + 3) & 0xff) << 24)
      w += 1
    }
    var a = 0x67452301; var b = 0xefcdab89
    var c = 0x98badcfe; var d = 0x10325476
    var i = 0
    while (i < 64) {
      var f = 0; var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      b = b + Integer.rotateLeft(a + f + K(i) + m(g), S(i))
      a = tmp
      i += 1
    }
    val h0 = a + 0x67452301; val h1 = b + 0xefcdab89
    val h2 = c + 0x98badcfe; val h3 = d + 0x10325476
    val dig = sc.dig
    dig(0) = h0.toByte; dig(1) = (h0 >>> 8).toByte
    dig(2) = (h0 >>> 16).toByte; dig(3) = (h0 >>> 24).toByte
    dig(4) = h1.toByte; dig(5) = (h1 >>> 8).toByte
    dig(6) = (h1 >>> 16).toByte; dig(7) = (h1 >>> 24).toByte
    dig(8) = h2.toByte; dig(9) = (h2 >>> 8).toByte
    dig(10) = (h2 >>> 16).toByte; dig(11) = (h2 >>> 24).toByte
    dig(12) = h3.toByte; dig(13) = (h3 >>> 8).toByte
    dig(14) = (h3 >>> 16).toByte; dig(15) = (h3 >>> 24).toByte
  }

  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val mins = new Array[Array[Byte]](k)
    val pre = prefixes(k)
    val sc = scratchLocal.get()
    val block = sc.block
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val tok = toks.getUTF8String(i).getBytes
        var builtPreLen = -1
        var s = 0
        while (s < k) {
          val p = pre(s)
          val total = p.length + tok.length
          if (total <= 55) {
            if (p.length != builtPreLen) {
              // token + 0x80 terminator + zero pad + bit length, laid
              // out once per prefix LENGTH (seed digits then just
              // overwrite the first bytes per seed)
              System.arraycopy(tok, 0, block, p.length, tok.length)
              block(total) = 0x80.toByte
              var z = total + 1
              while (z < 56) { block(z) = 0; z += 1 }
              val bits = total.toLong * 8
              block(56) = bits.toByte; block(57) = (bits >>> 8).toByte
              block(58) = (bits >>> 16).toByte; block(59) = (bits >>> 24).toByte
              block(60) = (bits >>> 32).toByte; block(61) = (bits >>> 40).toByte
              block(62) = (bits >>> 48).toByte; block(63) = (bits >>> 56).toByte
              builtPreLen = p.length
            }
            System.arraycopy(p, 0, block, 0, p.length)
            md5SingleBlock(sc)
            if (mins(s) == null) mins(s) = sc.dig.clone()
            else if (less(sc.dig, mins(s)))
              System.arraycopy(sc.dig, 0, mins(s), 0, 16)
          } else {
            // oversize token: the generic multi-block path (identical
            // digest by definition)
            val md = mdLocal.get()
            md.reset()
            md.update(p)
            md.update(tok)
            val d = md.digest()
            if (mins(s) == null || less(d, mins(s))) mins(s) = d
          }
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
