package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed mergeable [[Aggregator]]: keeps the k best
  * (score, id) pairs under (score desc, id asc). The scale argument vs
  * the window row_number() formulation: a window must SORT every group's
  * full row set (shuffle carries all rows, then per-partition sort);
  * this aggregator's partial buffers cap at k entries per map task, the
  * shuffle carries ≤ k·partitions rows, and merge is an O(k) merge —
  * top-k per group at 100 TB without a full sort anywhere. The gated
  * query proves output equivalence against the window-sort oracle.
  *
  * Determinism: total order (score desc, id asc) — equal scores break by
  * id, so partial-aggregation order can never change the kept set.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(sorted: Array[(Double, Long)]): Array[(Double, Long)] =
    if (sorted.length <= k) sorted else sorted.take(k)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)],
      x: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length == k && !better(x, buf.last)) buf
    else trim((buf :+ x).sortWith(better))
  }

  override def merge(a: Array[(Double, Long)],
      b: Array[(Double, Long)]): Array[(Double, Long)] =
    trim((a ++ b).sortWith(better))

  override def finish(buf: Array[(Double, Long)]): Seq[(Double, Long)] =
    buf.toSeq

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  import org.apache.spark.sql.functions.udaf
  /** Column-API handle: `df.groupBy(g).agg(topK(3)(struct(score, id)))`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAggregator(k), ExpressionEncoder[(Double, Long)]())
}
