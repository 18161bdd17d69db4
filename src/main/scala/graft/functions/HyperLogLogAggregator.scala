package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch as a typed mergeable [[Aggregator]] —
  * the constant-memory cardinality estimator every 100 TB GROUP BY
  * eventually needs (64 one-byte registers per group here vs an exact
  * distinct's unbounded set). Register max is associative / commutative /
  * idempotent, so map-side combine applies and shard sketches re-merge
  * exactly (spec-pinned).
  *
  * Deterministic + cross-engine replayable BY CONSTRUCTION, which is what
  * makes an *approximate* sketch oracle-gateable (see
  * `queries/SketchQueries.sketchHllDistinct`):
  *  - the hash is the 60-bit int from md5 hex digits [1,15] — the same
  *    value SQL computes as `conv(substring(md5(x),1,15),16,10)`;
  *  - register index j = h mod 64; the remaining 54-bit word w = h div 64
  *    scores rho = 55 − bitlen(w)  (bitlen(0) = 0), i.e. leading zeros
  *    in the 54-bit window plus one — all integer ops, no floats;
  *  - the harmonic denominator Σ 2^−M[j] is kept DYADIC: scaled by 2^55
  *    it is the exact integer Σ 2^(55−M[j]) ≤ 64·2^55 < 2^62, summable
  *    in int64 in any order by any engine. Only the final
  *    α·m²·2^55 / S division is floating point, on identical operands —
  *    bit-identical IEEE everywhere.
  */
class HyperLogLogAggregator
    extends Aggregator[String, Array[Byte], Seq[Int]] {
  import HyperLogLogAggregator.M

  override def zero: Array[Byte] = new Array[Byte](M)

  override def reduce(regs: Array[Byte], elem: String): Array[Byte] = {
    val (j, rho) = HyperLogLogAggregator.jRho(elem)
    if (rho > regs(j)) regs(j) = rho.toByte
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Registers as ARRAY<INT> so SQL higher-order functions fold them
    * (Array[Byte] would encode as an opaque BINARY).
    */
  override def finish(regs: Array[Byte]): Seq[Int] = regs.toSeq.map(_.toInt)

  override def bufferEncoder: Encoder[Array[Byte]] =
    ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Seq[Int]] =
    ExpressionEncoder[Seq[Int]]()
}

object HyperLogLogAggregator {
  /** Register count (2^6). alpha_64 = 0.709 per Flajolet et al. */
  val M = 64

  /** (register index, rho score) of an element — the exact integer twins
    * of the SQL formulas in the gated query's oracle ([[Md5Bits.top60]]
    * is bit-identical to the conv(substr(md5,1,15),16,10) it replaced).
    */
  def jRho(elem: String): (Int, Int) = {
    val h = Md5Bits.hash60(elem)
    val w = h / M
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(w) // bitlen(0)=0
    ((h % M).toInt, 55 - bitlen)
  }

  /** Driver/test-side estimate from a register array (same arithmetic as
    * the gated query: exact dyadic sum, one final double division).
    */
  def estimate(regs: Array[Byte]): Double = {
    var s = 0L
    regs.foreach(r => s += (1L << (55 - r)))
    0.709 * 4096.0 * 36028797018963968.0 / s.toDouble // alpha·m²·2^55 / S
  }

  /** Column-API handle: `df.groupBy(k).agg(hll_sketch(col("x")))`. */
  def hllSketch: org.apache.spark.sql.expressions.UserDefinedFunction = {
    import org.apache.spark.sql.functions.udaf
    udaf(new HyperLogLogAggregator, ExpressionEncoder[String]())
  }
}
