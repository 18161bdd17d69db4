package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch (KLL/MRL-style compactor hierarchy) as a
  * typed [[Aggregator]]: level i holds items of weight 2^i; when a level
  * exceeds `k` items it sorts, promotes every other item to level i+1,
  * and (odd counts) leaves the largest item behind — so total weight is
  * conserved exactly and buffers never exceed k·log₂(n/k) items. This is
  * the 100 TB replacement for exact `percentile`, whose aggregation
  * buffer holds EVERY value: the sketch's shuffle payload is bounded
  * (≤ k items per level per partial), map-side combine applies, and the
  * rank error is ≤ ε·n with ε ≈ O(log²(n/k)/k) (spec-pinned
  * empirically).
  *
  * Gate recipe (same as [[HyperLogLogAggregator]] / the Bloom probe):
  * the sketch is gated in a regime where it is PROVABLY EXACT — while
  * total count n ≤ k nothing ever compacts, every item survives at
  * weight 1 regardless of the merge tree, and `finish` returns the exact
  * order statistic value at 0-indexed rank ⌊(pct/100)·(n−1)⌋, which the
  * DuckDB oracle reproduces with a row_number window. Above k (the
  * sf0.1 bench, the 100 TB target) the same code degrades gracefully to
  * the approximate weighted-rank answer.
  *
  * Compaction keeps alternating parities across compactions of a level
  * (a per-level flip counter) so the systematic keep-even bias cancels;
  * under compaction the result can depend on the merge order — inherent
  * to compactor sketches, and irrelevant in the gated exact regime.
  *
  * Level layout: `Array[Long]` of `[count, flips, item0, item1, ...]`
  * with amortized-doubling capacity, so per-row reduce is O(1) append —
  * an immutable `:+` would be O(n²) per fill cycle.
  */
class KllQuantileAggregator(k: Int, qPcts: Seq[Int])
    extends Aggregator[Long, Array[Array[Long]], Seq[Long]] {

  private def cnt(lv: Array[Long]): Int = lv(0).toInt

  // no hard cap: merge bulk-appends before compacting, so a level can
  // transiently hold ~2k items
  private def ensure(lv: Array[Long], need: Int): Array[Long] =
    if (lv.length >= 2 + need) lv
    else java.util.Arrays.copyOf(lv, 2 + math.max(need, (lv.length - 2) * 2))

  private def ensureLevel(buf: Array[Array[Long]], i: Int): Array[Array[Long]] = {
    val b = if (buf.length > i) buf else java.util.Arrays.copyOf(buf, i + 1)
    if (b(i) == null) b(i) = new Array[Long](2 + 16)
    b
  }

  private def push(buf0: Array[Array[Long]], i: Int, v: Long): Array[Array[Long]] = {
    val buf = ensureLevel(buf0, i)
    val lv = ensure(buf(i), cnt(buf(i)) + 1)
    lv(2 + cnt(lv)) = v
    lv(0) += 1
    buf(i) = lv
    buf
  }

  /** Compact over-capacity levels from `from` upward. `scanAll = false`
    * (the per-row reduce path) may stop at the first level within
    * capacity — valid there because a single push to level 0 can only
    * have overfilled a contiguous prefix of levels. After `merge`, which
    * bulk-appends into EVERY level, that early exit would leave higher
    * levels over capacity forever (buffers growing with the number of
    * merged partials, breaking the k·log₂(n/k) bound) — merge passes
    * `scanAll = true` so every level is visited once, ascending
    * (promotions land on the level checked next).
    */
  private def compactFrom(buf0: Array[Array[Long]], from: Int,
      scanAll: Boolean): Array[Array[Long]] = {
    var buf = buf0
    var i = from
    while (i < buf.length && buf(i) != null &&
        (cnt(buf(i)) > k || scanAll)) {
      if (cnt(buf(i)) <= k) { i += 1 }
      else {
      val lv = buf(i)
      val c = cnt(lv)
      val items = java.util.Arrays.copyOfRange(lv, 2, 2 + c)
      java.util.Arrays.sort(items)
      val even = (c / 2) * 2
      val offset = (lv(1) % 2).toInt // alternate kept parity per compaction
      // survivor (odd count): the largest item stays at this level
      lv(0) = c - even
      if (c > even) lv(2) = items(c - 1)
      lv(1) += 1
      buf(i) = lv
      var j = offset
      while (j < even) { buf = push(buf, i + 1, items(j)); j += 2 }
      i += 1
      }
    }
    buf
  }

  override def zero: Array[Array[Long]] = Array(new Array[Long](2 + 16))

  override def reduce(buf: Array[Array[Long]], v: Long): Array[Array[Long]] =
    compactFrom(push(buf, 0, v), 0, scanAll = false)

  override def merge(a: Array[Array[Long]], b: Array[Array[Long]]): Array[Array[Long]] = {
    var out = a
    var i = 0
    while (i < b.length) {
      val lv = b(i)
      if (lv != null) {
        var j = 0
        while (j < cnt(lv)) { out = push(out, i, lv(2 + j)); j += 1 }
      }
      i += 1
    }
    compactFrom(out, 0, scanAll = true)
  }

  /** Weighted order statistics at the requested percents: the value whose
    * cumulative weight first exceeds ⌊(pct/100)·(W−1)⌋. Exact while no
    * compaction has occurred (all weights 1, W = n).
    */
  override def finish(buf: Array[Array[Long]]): Seq[Long] = {
    var pairs = List.empty[(Long, Long)] // (value, weight)
    var i = 0
    var total = 0L
    while (i < buf.length) {
      val lv = buf(i)
      if (lv != null) {
        val w = 1L << i
        var j = 0
        while (j < cnt(lv)) { pairs ::= (lv(2 + j), w); total += w; j += 1 }
      }
      i += 1
    }
    if (total == 0L) return qPcts.map(_ => 0L)
    val sorted = pairs.sortBy(_._1)
    qPcts.map { pct =>
      // same double expression (and association) as the oracle SQL
      val t = math.floor((pct.toDouble / 100.0d) * (total - 1).toDouble).toLong
      var cum = 0L
      var ans = sorted.last._1
      var rest = sorted
      var found = false
      while (!found && rest.nonEmpty) {
        cum += rest.head._2
        if (cum > t) { ans = rest.head._1; found = true }
        rest = rest.tail
      }
      ans
    }
  }

  override def bufferEncoder: Encoder[Array[Array[Long]]] =
    ExpressionEncoder[Array[Array[Long]]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object KllQuantileAggregator {
  import org.apache.spark.sql.functions.udaf

  /** Column-API handle: `df.agg(kllQuantiles(65536, Seq(50))(col("v")))`. */
  def kllQuantiles(k: Int, qPcts: Seq[Int]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KllQuantileAggregator(k, qPcts), ExpressionEncoder[Long]())
}
