package graft.connector.shardedlog

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Keyed batch writes into a sharded-log stream (≙ the consumer's
  * `PutRecord(..., PartitionKey=session_id)`, consumer.py:160-171, and the
  * reference's per-key ordering contract, README.md:244-256).
  *
  * Scale design: rows are repartitioned by DESTINATION shard (so exactly
  * one task appends to each shard file — single-writer discipline, no
  * cross-task interleaving) and sorted within the partition by the caller's
  * order columns (source shard + sequence number), which preserves per-key
  * arrival order end-to-end. One shuffle, append-only IO.
  */
object ShardedLogWriter {

  /** Catalyst twin of [[ShardedLog.shardFor]] — same md5 hash-range split,
    * so Spark-side writes and driver-side `putRecord` agree on placement.
    * The 60-bit × numShards product must stay in a signed long: numShards
    * ≤ 8 (the reference uses 2).
    */
  def shardIndexCol(key: Column, numShards: Int): Column = {
    require(numShards > 0 && numShards <= 8,
      s"numShards must be in [1,8], got $numShards")
    shiftright(
      conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
        * numShards, 60)
  }

  /** Write `batch` into the stream at `streamDir`. `orderWithinKey` should
    * be the upstream ordering columns (e.g. source shard, sequence_number);
    * rows for the same partition key are appended in that order.
    */
  def write(batch: DataFrame, streamDir: String, keyCol: Column,
      dataCol: Column, orderWithinKey: Seq[Column] = Nil): Unit = {
    val n = ShardedLog.shardCount(streamDir)
    require(n > 0, s"stream $streamDir does not exist")
    val prepared = batch.select(
      (Seq(keyCol.cast("string").as("__key"),
        dataCol.cast("binary").as("__data"),
        shardIndexCol(keyCol, n).as("__shard")) ++ orderWithinKey): _*)
    val sorted = prepared
      .repartition(n, col("__shard"))
      .sortWithinPartitions((col("__shard") +: orderWithinKey): _*)
    sorted.foreachPartition { rows: Iterator[Row] =>
      val buffers = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[(String, Array[Byte], Long)]]
      val now = System.currentTimeMillis()
      rows.foreach { r =>
        val shard = r.getAs[Long]("__shard").toInt
        buffers.getOrElseUpdate(shard, mutable.ArrayBuffer.empty) +=
          ((r.getAs[String]("__key"), r.getAs[Array[Byte]]("__data"), now))
      }
      buffers.foreach { case (shard, recs) =>
        ShardedLog.appendLines(streamDir, ShardedLog.shardName(shard), recs.toSeq)
      }
    }
  }
}
