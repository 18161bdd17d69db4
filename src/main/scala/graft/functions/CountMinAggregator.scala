package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min frequency sketch as a typed mergeable [[Aggregator]]: d=4
  * hash rows × w=256 counters estimate any element's frequency in O(d·w)
  * memory with only-overestimate error ≤ εN (ε = e/w) — the streaming
  * answer to "how often does this token occur?" when the exact per-token
  * groupBy would shuffle the whole 100 TB corpus. Counter addition is
  * associative/commutative, so map-side combine applies and shard
  * sketches merge exactly (spec-pinned).
  *
  * Deterministic + cross-engine replayable BY CONSTRUCTION (the property
  * that lets an approximate sketch be oracle-gated, same recipe as
  * [[HyperLogLogAggregator]]): row j's bucket is the 60-bit md5 integer
  * of `"j:" || token` mod w — in SQL,
  * `conv(substring(md5(concat(j, ':', t)), 1, 15), 16, 10) % 256` — and
  * the estimate is the MIN over the four addressed counters, all integer
  * ops end-to-end.
  */
class CountMinAggregator extends Aggregator[String, Array[Long], Seq[Long]] {
  import CountMinAggregator.{D, W}

  override def zero: Array[Long] = new Array[Long](D * W)

  override def reduce(buf: Array[Long], elem: String): Array[Long] = {
    // Encode once, stream "j:" prefix + bytes per row — UTF-8 of
    // s"$j:$elem" is the concatenation of the parts' UTF-8 encodings.
    val eb = elem.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var j = 0
    while (j < D) {
      val h = Md5Bits.top60(Md5Bits.md5(CountMinAggregator.Prefixes(j), eb))
      buf(j * W + (h % W).toInt) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  /** Counters as ARRAY<BIGINT> so the probe step is plain SQL
    * `element_at` (BINARY would need opaque decoding).
    */
  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object CountMinAggregator {
  /** Hash rows and counters per row; ε = e/256 ≈ 1.1%, δ = e^-4 ≈ 1.8%. */
  val D = 4
  val W = 256

  /** Pre-encoded "j:" salts for the D hash rows (reduce hot path). */
  private[functions] val Prefixes: Array[Array[Byte]] =
    Array.tabulate(D)(j => s"$j:".getBytes("UTF-8"))

  /** Row-j bucket of an element — the exact integer twin of the oracle's
    * `conv(substring(md5(j || ':' || t), 1, 15), 16, 10) % W`
    * ([[Md5Bits.top60]] is bit-identical to the hex round-trip).
    */
  def bucket(j: Int, elem: String): Int =
    (Md5Bits.top60(Md5Bits.md5(s"$j:$elem")) % W).toInt

  /** Test-side estimate from a finished counter array. */
  def estimate(cms: Seq[Long], elem: String): Long =
    (0 until D).map(j => cms(j * W + bucket(j, elem))).min

  /** Column-API handle: `df.agg(cmSketch(col("token")))`. */
  def cmSketch: org.apache.spark.sql.expressions.UserDefinedFunction = {
    import org.apache.spark.sql.functions.udaf
    udaf(new CountMinAggregator, ExpressionEncoder[String]())
  }
}
