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
    var j = 0
    while (j < D) {
      buf(j * W + CountMinAggregator.bucket(j, elem)) += 1L
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

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row-j bucket of an element — the exact integer twin of the oracle's
    * `conv(substring(md5(j || ':' || t), 1, 15), 16, 10) % W`.
    */
  def bucket(j: Int, elem: String): Int = {
    val hex = digest.get().digest(s"$j:$elem".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % W).toInt
  }

  /** Test-side estimate from a finished counter array. */
  def estimate(cms: Seq[Long], elem: String): Long =
    (0 until D).map(j => cms(j * W + bucket(j, elem))).min

  /** Column-API handle: `df.agg(cmSketch(col("token")))`. */
  def cmSketch: org.apache.spark.sql.expressions.UserDefinedFunction = {
    import org.apache.spark.sql.functions.udaf
    udaf(new CountMinAggregator, ExpressionEncoder[String]())
  }
}
