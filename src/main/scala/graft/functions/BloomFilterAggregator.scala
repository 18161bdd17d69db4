package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Bloom filter over strings as a typed [[Aggregator]] — the
  * set-membership sketch a 100 TB decontamination / blocklist pass needs:
  * build once over the (comparatively small) reference set, broadcast the
  * fixed-size bitset, and prefilter the petabyte side map-only before the
  * exact verification join.
  *
  * Layout: `numBits` bits in an `Array[Long]` (word i holds bits
  * [64·i, 64·i+64)). Two bit positions per element, derived from the two
  * 60-bit halves of the md5 hex digest — the SAME formula is expressible
  * in pure Spark SQL (`conv(substring(md5(g),·,15),16,10)`) so membership
  * probing stays in codegen'd built-ins; no UDF on the big side. Bitwise
  * OR is associative/commutative/idempotent, so partial aggregation
  * (map-side combine) applies and re-merge of overlapping shards is safe.
  *
  * A Bloom filter has NO false negatives: every inserted element probes
  * true. False positives (rate ≈ (2n/m)² for n elements, k=2) only let
  * extra candidates through to the exact join — downstream results that
  * re-verify exactly are therefore byte-identical to the unfiltered run
  * ([[graft.queries.CorpusMore.decontaminateBloom]] relies on this).
  */
class BloomFilterAggregator(numBits: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(numBits % 64 == 0, "numBits must be a multiple of 64")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], elem: String): Array[Long] = {
    val d = Md5Bits.md5(elem)
    val h1 = Md5Bits.top60(d) % numBits
    val h2 = Md5Bits.mid60(d) % numBits
    buf((h1 / 64).toInt) |= (1L << (h1 % 64))
    buf((h2 / 64).toInt) |= (1L << (h2 % 64))
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object BloomFilterAggregator {
  import org.apache.spark.sql.functions.udaf

  /** The two bit positions of `elem`: the 60-bit ints from hex digits
    * [1,15] and [17,31] of the md5 digest, mod numBits. Identical to the
    * SQL probe `conv(substring(md5(g), {1|17}, 15), 16, 10) % numBits`
    * ([[Md5Bits.top60]]/[[Md5Bits.mid60]] are bit-identical to the hex
    * round-trip they replaced).
    */
  def positions(elem: String, numBits: Int): Array[Long] = {
    val d = Md5Bits.md5(elem)
    Array(Md5Bits.top60(d) % numBits, Md5Bits.mid60(d) % numBits)
  }

  /** Membership probe mirroring [[positions]] on the driver/test side. */
  def mightContain(bloom: Array[Long], elem: String, numBits: Int): Boolean = {
    val Array(h1, h2) = positions(elem, numBits)
    ((bloom((h1 / 64).toInt) >> (h1 % 64)) & 1L) == 1L &&
      ((bloom((h2 / 64).toInt) >> (h2 % 64)) & 1L) == 1L
  }

  /** Column-API handle: `ev.agg(bloom_build(col("g")))`. */
  def bloomBuild(numBits: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BloomFilterAggregator(numBits), ExpressionEncoder[String]())
}
