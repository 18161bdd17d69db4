package graft.app

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.connector.shardedlog.ShardedLog

/** `BufferingHints` parity for the firehose stage (reference
  * Solution.ipynb cell 28: `SizeInMBs: 1` OR `IntervalInSeconds: 60`,
  * whichever first). Three deliveries are proven independently:
  * size-triggered (interval effectively infinite), time-triggered
  * (size effectively infinite), and the best-effort shutdown flush.
  */
class FirehoseBufferSpec extends SparkTestBase {

  private def mkStream(base: String, n: Int = 64): String = {
    val dir = s"$base/dest"
    ShardedLog.createStream(dir, 2)
    (0 until n).foreach { i =>
      ShardedLog.putRecord(dir, s"k$i",
        (s"""{"v": $i, "pad": """" + "x" * 100 + "\"}").getBytes("UTF-8"))
    }
    dir
  }

  private def deliveredCount(outDir: String): Long = {
    val d = new java.io.File(outDir)
    if (!d.exists()) 0L
    else try spark.read.json(outDir).count()
    catch { case _: Throwable => 0L }
  }

  private def awaitCount(outDir: String, want: Long, timeoutMs: Long): Long = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var got = deliveredCount(outDir)
    while (got != want && System.currentTimeMillis() < deadline) {
      Thread.sleep(100); got = deliveredCount(outDir)
    }
    got
  }

  test("size bound triggers delivery before the interval elapses") {
    val base = Files.createTempDirectory("graft-fh-size").toString
    val dest = mkStream(base) // 64 records x ~110 B payload ≈ 7 KB
    val q = Topology.startFirehoseBuffered(spark, dest, s"$base/out",
      s"$base/ckpt", sizeBytes = 4 * 1024, intervalMs = 10 * 60 * 1000L,
      pollTrigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      // one micro-batch carried ~7 KB >= the 4 KB bound -> flushed without
      // waiting for the 10-minute interval
      assert(awaitCount(s"$base/out", 64, 10000) == 64,
        "size-triggered delivery did not happen")
    } finally q.stop()
  }

  test("interval bound delivers a buffer smaller than the size bound") {
    val base = Files.createTempDirectory("graft-fh-time").toString
    val dest = mkStream(base, n = 3) // far below the size bound
    val q = Topology.startFirehoseBuffered(spark, dest, s"$base/out",
      s"$base/ckpt", sizeBytes = 1L << 30, intervalMs = 1500,
      pollTrigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      // records are ingested (offsets committed) but only buffered; the
      // 1.5 s interval timer then delivers them
      assert(awaitCount(s"$base/out", 3, 15000) == 3,
        "interval-triggered delivery did not happen")
    } finally q.stop()
  }

  test("query stop flushes the residual buffer (best-effort, like Firehose)") {
    val base = Files.createTempDirectory("graft-fh-stop").toString
    val dest = mkStream(base, n = 5)
    val q = Topology.startFirehoseBuffered(spark, dest, s"$base/out",
      s"$base/ckpt", sizeBytes = 1L << 30, intervalMs = 10 * 60 * 1000L,
      pollTrigger = Trigger.ProcessingTime(0))
    q.processAllAvailable()
    assert(deliveredCount(s"$base/out") == 0L,
      "nothing should deliver while both bounds are unmet")
    q.stop()
    assert(awaitCount(s"$base/out", 5, 15000) == 5,
      "shutdown flush did not deliver the residual buffer")
  }
}
