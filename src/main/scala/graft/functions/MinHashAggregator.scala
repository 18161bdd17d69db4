package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Corpus-level MinHash sketch as a typed [[Aggregator]] (SURVEY.md §7.3:
  * the sketch-aggregate extension point): folds per-document MinHash
  * signatures into ONE k-wide signature for a whole group by element-wise
  * minimum.
  *
  * The merged sketch answers "how similar are two CORPORA" (e.g. two
  * sources or two dedup shards) in O(k) — signature agreement estimates
  * the Jaccard similarity of the unions, without ever joining the
  * underlying documents. Element-wise min is associative and commutative,
  * so partial aggregation (map-side combine) applies and the shuffle
  * carries k strings per group, not the documents.
  */
class MinHashAggregator(k: Int)
    extends Aggregator[Seq[String], Array[String], Seq[String]] {

  /** Identity: lexicographically-maximal sentinel ("~" > any hex digit). */
  override def zero: Array[String] = Array.fill(k)("~")

  override def reduce(buf: Array[String], sig: Seq[String]): Array[String] = {
    var i = 0
    while (i < k && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object MinHashAggregator {
  import org.apache.spark.sql.functions.udaf
  /** Column-API handle: `df.groupBy("lang").agg(minhash_merge(col("sig")))`. */
  def minhashMerge(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinHashAggregator(k), ExpressionEncoder[Seq[String]]())
}
