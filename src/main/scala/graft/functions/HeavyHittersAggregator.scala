package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * frequency-sketch sibling of [[MinHashAggregator]] (SURVEY.md §7.3).
  * Tracks at most `capacity` candidate items with under-estimated counts;
  * any item with true frequency > n/(capacity+1) is guaranteed to survive,
  * and every estimate obeys `true - n/(capacity+1) <= est <= true`.
  *
  * Mergeable-summaries semantics (the property that makes it a Spark
  * aggregate): two summaries combine by adding counts and then subtracting
  * the (capacity+1)-th largest combined count from everything (dropping
  * non-positives), which preserves the MG error bound — so map-side
  * partial aggregation applies and the shuffle carries ≤ capacity
  * (item, count) pairs per group, never the raw rows.
  *
  * EXACT REGIME: when a group's distinct-item count never exceeds
  * `capacity`, no decrement ever fires and the sketch IS the exact
  * per-item count, independent of partitioning — which is what the
  * DuckDB-oracled query gates; the approximate regime is spec-bounded.
  */
class HeavyHittersAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  require(capacity > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < capacity => buf.updated(item, 1L)
      case None =>
        // decrement every counter; drop the ones that hit zero
        buf.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest count, keep positives
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      combined.flatMap { case (k, c) =>
        if (c > cut) Some(k -> (c - cut)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object HeavyHittersAggregator {
  import org.apache.spark.sql.functions.udaf
  /** Column-API handle:
    * `df.groupBy("day").agg(heavy_hitters(col("event_type")))`.
    */
  def heavyHitters(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new HeavyHittersAggregator(capacity), ExpressionEncoder[String]())
}
