package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers (SURVEY.md §7.2(7)): deterministic salting for
  * hot keys. AQE's skew-join handling covers sort-merge joins at runtime;
  * these helpers cover the planned-ahead cases — a shuffle join whose hot
  * key is known to dwarf a partition, or a high-cardinality-per-key
  * aggregation whose partial-combine doesn't reduce enough.
  *
  * Salts are DERIVED (hash of a discriminator column), never `rand()`:
  * deterministic output under retries and replays is non-negotiable in a
  * pipeline with an exactly-once sink.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a discriminator column. */
  def saltCol(discriminator: Column, buckets: Int): Column =
    pmod(xxhash64(discriminator), lit(buckets.toLong))

  /** Skew-safe equi-join: the left (large, skewed) side is salted by a
    * discriminator; the right side is replicated `buckets` times so every
    * (key, salt) bucket finds its match. Key skew is split `buckets` ways
    * at the cost of a `buckets`× replication of the right side — use for
    * moderate right sides that are still too big to broadcast.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      discriminator: Column, buckets: Int): DataFrame = {
    // Keep the join a SHUFFLE join at full width — that is the whole
    // operator. Left unhinted, AQE broadcast-converts at small scale
    // (a ~0.7 s driver-side hash-table build of the bucket-replicated
    // right, measured on the r18 StageGapProbe) and byte-based
    // coalescing then serialized the probe+partial-agg onto 2-3 tasks.
    // SHUFFLE_HASH builds per-bucket hash maps off the (key, salt)
    // exchange (no sort, no driver build), and the NUMBERED left
    // repartition — which already satisfies the join's distribution —
    // pins the salt's parallelism so AQE cannot fold the split
    // buckets back together.
    val nPart = left.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val saltedLeft = left.withColumn("__salt", saltCol(discriminator, buckets))
      .repartition(nPart, col(key), col("__salt"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedLeft.join(replicatedRight.hint("shuffle_hash"),
      Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (keys, salt),
    * then final combine on keys. `partials` maps each output column to its
    * (partial, combine) expression pair — e.g. count → (count, sum).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], discriminator: Column,
      buckets: Int, partial: Seq[(String, Column)],
      combine: Seq[(String, Column)]): DataFrame = {
    val p = df.withColumn("__salt", saltCol(discriminator, buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    p.groupBy(keys.map(col): _*)
      .agg(combine.head._2.as(combine.head._1),
        combine.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
