package graft.app

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.connector.shardedlog.ShardedLog

/** Streaming throughput + latency bench for the full reference topology
  * (producer → sharded-log source → ETL P1–P5 → keyed dest-stream writes
  * → firehose file delivery).
  *
  * The reference's one quantitative operating fact is its implied
  * throughput ceiling: `GetRecords(Limit=200)` polled about once per
  * second per shard (consumer.py:115,194-195) ≈ **100–200 rec/s/shard**,
  * with BASELINE.md recording ~100 rec/s/shard as the practical number.
  * This main measures the Spark-native pipeline on the same wire path
  * and reports sustained rec/s so the comparison is a measured multiple,
  * not "trivially faster":
  *
  *  - `produce`: driver-side batched keyed appends (the producer side).
  *  - `etl_capped`: ETL drain under the REFERENCE admission cap
  *    (maxRecordsPerPoll=200 per shard per micro-batch,
  *    Trigger.AvailableNow) — same Limit=200 batch shape, no think-time.
  *  - `etl`: ETL drain wide-open (cap high enough that admission control
  *    never binds) — engine capacity for decode→validate→enrich→route→
  *    keyed ordered writes.
  *  - `firehose`: buffered file delivery drain of both dest streams.
  *  - `e2e_latency_ms`: median of 5 single-record ingest→file-visible
  *    probes through continuously-running 1 s-trigger ETL + firehose
  *    (the reference observes 5–7 MINUTES, dominated by the 60 s
  *    Firehose buffer + S3 delivery).
  *
  * Appends one JSON line to `bench_history.jsonl` (keyed
  * `"stream_bench"`) and prints it; the README streaming row quotes it.
  * Env knobs: SPARK_GRAFT_STREAM_SHARDS (default 8 — the writer's
  * Catalyst shard router supports ≤8), SPARK_GRAFT_STREAM_RECORDS
  * (default 200000).
  */
object StreamBench {

  private def countLines(f: File): Long = {
    if (!f.exists()) return 0L
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
    try {
      var n = 0L
      val buf = new Array[Byte](1 << 16)
      var r = in.read(buf)
      while (r > 0) {
        var i = 0
        while (i < r) { if (buf(i) == '\n') n += 1; i += 1 }
        r = in.read(buf)
      }
      n
    } finally in.close()
  }

  private def streamRecords(dir: String): Long =
    ShardedLog.listShards(dir).map(s => countLines(new File(dir, s))).sum

  private def jsonOutRecords(dir: String): Long = {
    val d = new File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".json")).map(countLines).sum
  }

  def main(args: Array[String]): Unit = {
    val shards = sys.env.getOrElse("SPARK_GRAFT_STREAM_SHARDS", "8").toInt
    val nRec = sys.env.getOrElse("SPARK_GRAFT_STREAM_RECORDS", "200000").toInt
    val nCapped = math.min(nRec, 20000)
    val base = Files.createTempDirectory("graft-streambench")
    def dir(n: String) = base.resolve(n).toString
    Seq("src", "srcCap", "usa", "intl", "usaCap", "intlCap")
      .foreach(s => ShardedLog.createStream(dir(s), shards))

    val countries = Array("USA", "France", "Japan", "USA", "Brazil",
      "USA", "Germany", "USA", "India", "USA")
    def payload(i: Int): String = {
      val items = (0 until 1 + i % 3).map { j =>
        s"""{"product_code": "P${i % 997}-$j", "quantity": ${1 + (i + j) % 5},
           | "in_shopping_cart": ${(i + j) % 2 == 0}}""".stripMargin
          .replace("\n", "")
      }.mkString("[", ", ", "]")
      s"""{"session_id": "sess-$i", "country": "${countries(i % 10)}",
         | "browse_history": $items}""".stripMargin.replace("\n", "")
    }

    // -------- produce (batched keyed appends, grouped by owning shard)
    def produce(streamDir: String, n: Int): Double = {
      val t0 = System.nanoTime()
      val now = System.currentTimeMillis()
      (0 until n).map { i =>
        val key = s"sess-$i"
        (ShardedLog.shardName(ShardedLog.shardFor(key, shards)),
          (key, payload(i).getBytes("UTF-8"), now))
      }.groupBy(_._1).foreach { case (shard, recs) =>
        ShardedLog.appendLines(streamDir, shard, recs.map(_._2))
      }
      (System.nanoTime() - t0) / 1e9
    }
    val tProduce = produce(dir("src"), nRec)
    val tProduceCap = produce(dir("srcCap"), nCapped)

    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // -------- ETL drain under the reference's Limit=200 admission cap
    def etlDrain(src: String, usa: String, intl: String, cap: Int,
        expect: Long): Double = {
      val t0 = System.nanoTime()
      val q = Topology.startEtlConsumer(spark, dir(src),
        Map("usa" -> dir(usa), "international" -> dir(intl)),
        dir("errors"), dir(s"ckpt-$usa"), Trigger.AvailableNow(),
        maxRecordsPerPoll = cap)
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val got = streamRecords(dir(usa)) + streamRecords(dir(intl))
      require(got == expect, s"ETL drain lost records: $got != $expect")
      sec
    }
    val tCapped = etlDrain("srcCap", "usaCap", "intlCap", 200, nCapped)
    val tEtl = etlDrain("src", "usa", "intl", 10 * 1000 * 1000, nRec)

    // -------- firehose file delivery drain (both dest streams)
    val tFh0 = System.nanoTime()
    val fhU = Topology.startFirehose(spark, dir("usa"), dir("outUsa"),
      dir("ckpt-fhU"), Trigger.AvailableNow())
    val fhI = Topology.startFirehose(spark, dir("intl"), dir("outIntl"),
      dir("ckpt-fhI"), Trigger.AvailableNow())
    fhU.awaitTermination(); fhI.awaitTermination()
    val tFirehose = (System.nanoTime() - tFh0) / 1e9
    val fhGot = jsonOutRecords(dir("outUsa")) + jsonOutRecords(dir("outIntl"))
    require(fhGot == nRec, s"firehose drain lost records: $fhGot != $nRec")

    // -------- end-to-end latency: continuous 1 s triggers, 5 probes
    val etl = Topology.startEtlConsumer(spark, dir("src"),
      Map("usa" -> dir("usa"), "international" -> dir("intl")),
      dir("errors"), dir("ckpt-usa"), Trigger.ProcessingTime("1 second"),
      maxRecordsPerPoll = 100000)
    val fh = Topology.startFirehose(spark, dir("usa"), dir("outUsa"),
      dir("ckpt-fhU"), Trigger.ProcessingTime("1 second"))
    val latencies = (0 until 5).map { k =>
      val probe =
        s"""{"session_id": "probe-$k", "country": "USA", "browse_history": [
           |{"product_code": "PL", "quantity": 1, "in_shopping_cart": true}]}"""
          .stripMargin.replace("\n", "")
      val t0 = System.nanoTime()
      ShardedLog.putRecord(dir("src"), s"probe-$k", probe.getBytes("UTF-8"))
      val deadline = t0 + 60L * 1000 * 1000 * 1000
      var seen = false
      while (!seen && System.nanoTime() < deadline) {
        seen = Option(new File(dir("outUsa")).listFiles())
          .getOrElse(Array.empty)
          .filter(_.getName.endsWith(".json"))
          .exists(f => new String(Files.readAllBytes(f.toPath), "UTF-8")
            .contains(s"probe-$k"))
        if (!seen) Thread.sleep(20)
      }
      require(seen, s"latency probe $k timed out")
      (System.nanoTime() - t0) / 1e6
    }
    etl.stop(); fh.stop()
    val latMedian = latencies.sorted.apply(latencies.size / 2)

    def f(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val line =
      s"""{"epoch_ms":${System.currentTimeMillis()},"stream_bench":{""" +
        s""""shards":$shards,"records":$nRec,""" +
        s""""produce_rps":${f(nRec / tProduce)},""" +
        s""""etl_capped_records":$nCapped,""" +
        s""""etl_capped_rps":${f(nCapped / tCapped)},""" +
        s""""etl_capped_rps_per_shard":${f(nCapped / tCapped / shards)},""" +
        s""""etl_rps":${f(nRec / tEtl)},""" +
        s""""etl_rps_per_shard":${f(nRec / tEtl / shards)},""" +
        s""""firehose_rps":${f(nRec / tFirehose)},""" +
        s""""e2e_latency_ms":[${latencies.map(f).mkString(",")}],""" +
        s""""e2e_latency_ms_median":${f(latMedian)},""" +
        s""""reference_ceiling_rps_per_shard":100,""" +
        s""""reference_e2e_latency_s":"300-420"}}"""
    try Files.writeString(java.nio.file.Paths.get("bench_history.jsonl"),
      line + "\n", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
    // throwaway topology: clean up
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(base)
    try walk.iterator().asScala.toSeq.reverse
      .foreach(p => Files.deleteIfExists(p))
    finally walk.close()
  }
}
