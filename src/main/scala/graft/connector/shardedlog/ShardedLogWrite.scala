package graft.connector.shardedlog

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}

/** Native DataSource V2 WRITE path for the sharded log — the PutRecords
  * sink face of the connector (≙ the reference's boto3
  * `put_record(StreamName, Data, PartitionKey)`, consumer.py:160-171),
  * so `df.write.format(...)`/`df.writeStream.format(...)` work without
  * the `foreachBatch` + [[ShardedLogWriter]] detour.
  *
  * Input contract: a `key` (string) and a `data` (binary) column.
  *
  * Ordering/distribution: the write declares
  * [[RequiresDistributionAndOrdering]] — clustered by `key`, sorted by
  * `key` — so Spark shuffles all rows of one partition key into ONE task
  * (single-writer per key, the Kinesis per-key ordering contract) and the
  * task appends contiguous per-key runs in its input order. Each task
  * buffers per destination shard and appends once per shard under the
  * shard file lock at commit time, so a failed task retry never leaves
  * half a batch.
  *
  * Delivery semantics are at-least-once across epoch retries (a replayed
  * epoch re-appends), exactly like PutRecords retries on the reference
  * path; the exactly-once upgrade is the `foreachBatch` topology sink,
  * which dedupes by (shard, sequence) checkpoint.
  */
class ShardedLogWriteBuilder(streamDir: String, info: LogicalWriteInfo)
    extends WriteBuilder {

  override def build(): Write = new Write with RequiresDistributionAndOrdering {
    ShardedLogWriteBuilder.validateSchema(info.schema())

    override def requiredDistribution(): Distribution =
      Distributions.clustered(Array(Expressions.column("key")))
    override def requiredOrdering(): Array[SortOrder] =
      Array(Expressions.sort(Expressions.column("key"), SortDirection.ASCENDING))
    // partitioning hint: one task per shard is the natural parallelism
    override def requiredNumPartitions(): Int =
      math.max(1, ShardedLog.shardCount(streamDir))

    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory =
        new ShardedLogWriterFactory(streamDir, info.schema())
      override def commit(messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }

    override def toStreaming: StreamingWrite = {
      val schema = info.schema()
      val dir = streamDir
      new StreamingWrite {
        override def createStreamingWriterFactory(
            i: PhysicalWriteInfo): StreamingDataWriterFactory =
          new ShardedLogStreamingWriterFactory(dir, schema)
        override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
        override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
      }
    }
  }
}

object ShardedLogWriteBuilder {
  private[shardedlog] def validateSchema(schema: StructType): Unit = {
    require(schema.fieldNames.contains("key") &&
      schema("key").dataType == StringType,
      s"sharded-log write needs a STRING `key` column, got ${schema.simpleString}")
    require(schema.fieldNames.contains("data") &&
      schema("data").dataType == BinaryType,
      s"sharded-log write needs a BINARY `data` column, got ${schema.simpleString}")
  }
}

class ShardedLogStreamingWriterFactory(streamDir: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new ShardedLogWriterFactory(streamDir, schema)
      .createWriter(partitionId, taskId)
}

class ShardedLogWriterFactory(streamDir: String, schema: StructType)
    extends DataWriterFactory {
  private val keyIdx = schema.fieldIndex("key")
  private val dataIdx = schema.fieldIndex("data")

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // route against the lineage metadata exactly like putRecord
      private val meta = ShardedLog.shardMeta(streamDir).filter(_.open)
      private val buffers =
        mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[(String, Array[Byte], Long)]]

      private def shardOf(key: String): String = {
        val h = ShardedLog.hash60(key)
        meta.find(si => h >= si.start && h < si.endEx).get.name
      }

      override def write(row: InternalRow): Unit = {
        val key = row.getUTF8String(keyIdx).toString
        val data = row.getBinary(dataIdx)
        buffers.getOrElseUpdate(shardOf(key), mutable.ArrayBuffer.empty) +=
          ((key, data, System.currentTimeMillis()))
      }

      override def commit(): WriterCommitMessage = {
        buffers.foreach { case (shard, recs) =>
          ShardedLog.appendLines(streamDir, shard, recs.toSeq)
        }
        new WriterCommitMessage {}
      }

      override def abort(): Unit = buffers.clear()
      override def close(): Unit = ()
    }
}
