package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import graft.functions.HyperLogLogAggregator

/** Mergeable sketches inside Structured Streaming state: a typed
  * Aggregator used in a streaming groupBy must keep merging correctly
  * as micro-batches arrive (partial buffers persist in the state store
  * between triggers). The streaming HLL registers after N batches must
  * equal the batch build over the concatenated input — the same
  * merge ≡ build law the batch spec pins, now across the state store
  * boundary.
  */
class StreamingSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming windowed HLL registers equal the batch build after two batches") {
    val dir = Files.createTempDirectory("graft-stream-hll").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val hll = HyperLogLogAggregator.hllSketch
    val out = mem.toDF().toDF("ts", "uid")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"))
      .agg(hll(col("uid")).as("regs"))
      .select(col("window.start").as("bucket"), col("regs"))
    val q = out.writeStream
      .format("memory").queryName("stream_hll")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val t0 = Timestamp.valueOf("2024-06-01 10:00:00")
      val batch1 = (1 to 400).map(i => (t0, s"user-$i"))
      val batch2 = (200 to 700).map(i => (t0, s"user-$i")) // overlapping ids
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_hll")
        .orderBy(col("bucket")).collect().last.getSeq[Long](1)

      val agg = new HyperLogLogAggregator
      val expected = (batch1 ++ batch2).map(_._2)
        .foldLeft(agg.zero)(agg.reduce)
      assert(streamed == expected.map(_.toLong).toSeq,
        "state-store merged registers must equal the batch build")
    } finally q.stop()
  }
}
