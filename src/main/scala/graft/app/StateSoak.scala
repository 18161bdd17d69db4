package graft.app

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger, TTLConfig}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.connector.shardedlog.{ShardedLog, ShardedLogSource}
import graft.streaming.StatefulOps

/** Stateful-streaming depth soak (r13 VERDICT item 5): `transformWithState`
  * is spec-verified at toy scale; this tool runs it under sustained load
  * (default ≥10 min at ≥10k rec/s) with BOTH heavy state behaviors live —
  * event-time TIMER firings (gap sessionization, one digest per closed
  * session) and processing-time TTL expiry (running-spend accumulator) —
  * on the RocksDB provider, with mid-soak executor SIGKILLs under
  * `local-cluster`, and adjudicates:
  *
  *  - EXACTLY-ONCE accounting on the timer path: every produced key's
  *    session digest arrives exactly once (zero loss, zero dup) with the
  *    exact event count and cents total, through the kills. Keys arrive
  *    as contiguous bursts (key = i / eventsPerKey), so each key's
  *    digest closes when the watermark passes its last event + gap; a
  *    far-future sentinel key flushes the tail after the producers stop.
  *  - BOUNDED STATE GROWTH on both operators: per-progress
  *    `stateOperators` samples (rows + state bytes) must PLATEAU — the
  *    digest operator clears state at timer fire, the TTL operator
  *    evicts idle keys — instead of growing with total keys seen
  *    (~keyRate × TTL live keys vs ~keyRate × soakSec without expiry).
  *
  * Writes `stream_soak_state_r14.json` (curve + accounting + kill log)
  * and appends a one-line row to bench_history.jsonl.
  *
  * Env: SPARK_GRAFT_STATE_SOAK_SEC (default 600),
  *      SPARK_GRAFT_STATE_SOAK_RATE (default 10000 rec/s),
  *      SPARK_GRAFT_STATE_KILL_AT_SEC (default "150,380"; "" = no kills),
  *      SPARK_GRAFT_STATE_MASTER (default local-cluster[3,8,6144]),
  *      SPARK_GRAFT_STATE_OUT (default stream_soak_state_r14.json).
  */
object StateSoak {

  private val EventsPerKey = 20L
  private val GapSeconds = 5L
  private val WatermarkDelay = "10 seconds"
  private val TtlSeconds = 45L

  def main(args: Array[String]): Unit = {
    val soakSec = sys.env.getOrElse("SPARK_GRAFT_STATE_SOAK_SEC", "600").toInt
    val offeredRps = sys.env.getOrElse("SPARK_GRAFT_STATE_SOAK_RATE", "10000").toInt
    val master =
      sys.env.getOrElse("SPARK_GRAFT_STATE_MASTER", "local-cluster[3,8,6144]")
    val killAtSec = sys.env.getOrElse("SPARK_GRAFT_STATE_KILL_AT_SEC", "150,380")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val outJson =
      sys.env.getOrElse("SPARK_GRAFT_STATE_OUT", "stream_soak_state_r14.json")

    val base = Files.createTempDirectory("graft-state-soak")
    def dir(n: String) = base.resolve(n).toString
    ShardedLog.createStream(dir("src"), 8)

    val builder = SparkSession.builder()
      .master(master)
      .appName("graft-state-soak")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    if (master.startsWith("local-cluster[")) {
      builder
        .config("spark.executor.extraClassPath",
          System.getProperty("java.class.path"))
        .config("spark.executor.extraJavaOptions", graft.GraftCluster.moduleOpens)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "5g"))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- state-size curve sampler: one sample per finished micro-batch ----
    case class StateSample(epochMs: Long, query: String, batchId: Long,
      inputRows: Long, stateRows: Long, stateBytes: Long)
    val samples = mutable.ArrayBuffer.empty[StateSample]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.stateOperators.nonEmpty) {
          val rows = p.stateOperators.map(_.numRowsTotal).sum
          val bytes = p.stateOperators.map(_.memoryUsedBytes).sum
          samples.synchronized {
            samples += StateSample(System.currentTimeMillis(), p.name,
              p.batchId, p.numInputRows, rows, bytes)
          }
        }
      }
    })

    // ---- the two stateful queries over one source stream ----
    val eventSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("cents", LongType)))
    def parsed = spark.readStream.format(ShardedLogSource.ShortName)
      .option("path", dir("src"))
      .option("maxRecordsPerPoll", "1000000")
      .load()
      .select(from_json(col("data").cast("string"), eventSchema).as("e"))
      .select(col("e.user_id"), col("e.ts"), col("e.event_type"),
        col("e.cents"), col("e.cents").as("amount_cents"))

    val digests = StatefulOps.sessionDigest(parsed, GapSeconds, WatermarkDelay)
      .writeStream.queryName("session_digest_timers")
      .format("json").option("path", dir("digests"))
      .option("checkpointLocation", dir("ckptA"))
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    val spend = StatefulOps
      .runningSpend(parsed, TTLConfig(java.time.Duration.ofSeconds(TtlSeconds)))
      .writeStream.queryName("running_spend_ttl")
      .format("noop")
      .option("checkpointLocation", dir("ckptB"))
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    // ---- throttled producer: key i/EventsPerKey, deterministic cents ----
    val baseMs = System.currentTimeMillis()
    def eventJson(i: Long, tsMs: Long): String = {
      val types = Array("view", "cart", "buy", "view", "view")
      s"""{"user_id": ${i / EventsPerKey}, "ts": "${
        java.time.Instant.ofEpochMilli(tsMs)}", "event_type": "${
        types((i % 5).toInt)}", "cents": ${i % 997}}"""
    }
    val produced = new AtomicLong(0L)
    val stop = new AtomicBoolean(false)
    val producer = new Thread(() => {
      val t0 = System.nanoTime()
      while (!stop.get()) {
        val meta = ShardedLog.shardMeta(dir("src")).filter(_.open)
        val start = produced.get()
        // event time = intended production time: strictly increasing with
        // i, so the watermark tracks the stream and closes past sessions
        (start until start + 1000).map { i =>
          val tsMs = baseMs + i * 1000L / offeredRps
          val key = s"u-${i / EventsPerKey}"
          val h = ShardedLog.hash60(key)
          val shard = meta.find(s => s.start <= h && h < s.endEx).get.name
          (shard, (key, eventJson(i, tsMs).getBytes("UTF-8"), tsMs))
        }.groupBy(_._1).foreach { case (shard, recs) =>
          ShardedLog.appendLines(dir("src"), shard, recs.map(_._2))
        }
        val n = produced.addAndGet(1000L)
        val aheadMs = n * 1000L / offeredRps - (System.nanoTime() - t0) / 1000000
        if (aheadMs > 0) Thread.sleep(aheadMs)
      }
    }, "state-soak-producer")

    val kills = mutable.ArrayBuffer.empty[(Int, Long)]
    val killer = new Thread(() => {
      val t0 = System.currentTimeMillis()
      for (at <- killAtSec.sorted if !stop.get()) {
        val wait = t0 + at * 1000L - System.currentTimeMillis()
        if (wait > 0) Thread.sleep(wait)
        graft.tools.ExecutorChaos.executorPids().headOption.foreach { pid =>
          ProcessHandle.of(pid).ifPresent { h =>
            if (h.destroyForcibly()) {
              kills.synchronized(kills += ((at, pid)))
              println(s"[state-soak] killed executor pid=$pid at t=${at}s")
            }
          }
        }
      }
    }, "state-soak-killer")
    killer.setDaemon(true)

    producer.start(); killer.start()
    Thread.sleep(soakSec * 1000L)
    stop.set(true); producer.join()
    val total = produced.get()
    val totalKeys = total / EventsPerKey // producer emits multiples of 1000

    // ---- sentinel flush: far-future events push the watermark past every
    // real session's (last event + gap); several waves so each micro-batch
    // first ADVANCES the watermark, then FIRES the now-expired timers ----
    val flushKey = -1L
    val lastTs = baseMs + total * 1000L / offeredRps
    for (w <- 0 until 30) {
      val tsMs = lastTs + (GapSeconds + 15 + w) * 1000L
      val meta = ShardedLog.shardMeta(dir("src")).filter(_.open)
      val key = "u-flush"
      val h = ShardedLog.hash60(key)
      val shard = meta.find(s => s.start <= h && h < s.endEx).get.name
      ShardedLog.appendLines(dir("src"), shard, Seq(
        (key, s"""{"user_id": $flushKey, "ts": "${
          java.time.Instant.ofEpochMilli(tsMs)}", "event_type": "view", "cents": 0}"""
          .getBytes("UTF-8"), tsMs)))
      Thread.sleep(1000)
      val done = try {
        spark.read.json(dir("digests"))
          .filter(col("user_id") >= 0).count() >= totalKeys
      } catch { case _: Exception => false }
      if (done && w >= 3) {
        println(s"[state-soak] all $totalKeys digests flushed after ${w + 1} waves")
        // keep a few extra waves so the TTL operator also sees quiet
        // batches, then fall through to the quiesce loop
      }
    }
    // final drain: wait until the digest count quiesces at >= totalKeys
    val deadline = System.currentTimeMillis() + 180000
    var lastCount = -1L; var stable = 0
    while (stable < 3 && System.currentTimeMillis() < deadline) {
      val got = try {
        spark.read.json(dir("digests")).filter(col("user_id") >= 0).count()
      } catch { case _: Exception => 0L }
      if (got >= totalKeys && got == lastCount) stable += 1 else stable = 0
      lastCount = got
      Thread.sleep(2000)
    }
    digests.stop(); spend.stop()

    // ---- exactly-once accounting against the closed-form expectation ----
    // key k's events are i in [k*E, (k+1)*E): n_events = E and
    // total_cents = sum(i % 997) — recomputed exactly via spark.range
    val got = spark.read.json(dir("digests"))
      .filter(col("user_id") >= 0)
      .select(col("user_id").cast("long").as("user_id"),
        col("n_events").cast("long").as("n_events"),
        col("total_cents").cast("long").as("total_cents"))
    val expected = spark.range(0, total)
      .select((col("id") / EventsPerKey).cast("long").as("user_id"),
        (col("id") % 997).as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("exp_n"), sum(col("cents")).as("exp_cents"))
    val perKey = got.groupBy("user_id")
      .agg(count(lit(1)).as("n_digests"),
        sum(col("n_events")).as("n_events"),
        sum(col("total_cents")).as("total_cents"))
    val joined = expected.join(perKey, Seq("user_id"), "full_outer")
      .agg(
        count(lit(1)).as("keys"),
        sum(when(col("n_digests").isNull, 1L).otherwise(0L)).as("lost"),
        sum(when(col("n_digests") > 1L, 1L).otherwise(0L)).as("dup"),
        sum(when(col("n_digests") === 1L &&
          (col("n_events") =!= col("exp_n") ||
            col("total_cents") =!= col("exp_cents")), 1L)
          .otherwise(0L)).as("wrong"))
      .collect()(0)
    val (keys, lost, dup, wrong) =
      (joined.getLong(0), joined.getLong(1), joined.getLong(2), joined.getLong(3))
    println(s"[state-soak] produced=$total keys=$totalKeys digest_keys=$keys " +
      s"lost=$lost dup=$dup wrong=$wrong kills=${kills.size}")

    // ---- bounded-growth adjudication per operator: the peak of the last
    // third must not exceed ~the peak of the middle third (plateau), and
    // the TTL operator must hold far fewer rows than total keys seen ----
    val snap = samples.synchronized(samples.toVector)
    def curve(q: String) = snap.filter(_.query == q)
    def peakRows(xs: Vector[StateSample]) =
      if (xs.isEmpty) 0L else xs.map(_.stateRows).max
    val spendCurve = curve("running_spend_ttl")
    val digestCurve = curve("session_digest_timers")
    def third(xs: Vector[StateSample], k: Int) = xs.filter(s =>
      s.epochMs >= baseMs + k * soakSec * 1000L / 3 &&
        s.epochMs < baseMs + (k + 1) * soakSec * 1000L / 3)
    val spendMid = peakRows(third(spendCurve, 1))
    val spendLate = peakRows(third(spendCurve, 2))
    val digestMid = peakRows(third(digestCurve, 1))
    val digestLate = peakRows(third(digestCurve, 2))

    def js(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    // downsample the curve to ~120 points per query for the artifact
    def curveJson(xs: Vector[StateSample]): String = {
      val step = math.max(1, xs.size / 120)
      xs.zipWithIndex.collect { case (s, i) if i % step == 0 =>
        s"""    {"t_sec":${(s.epochMs - baseMs) / 1000},"batch":${s.batchId},""" +
          s""""rows":${s.stateRows},"bytes":${s.stateBytes}}"""
      }.mkString(",\n")
    }
    val json =
      s"""{${graft.Provenance.stamp("stateful-state-soak")},
         | "master": ${js(master)}, "offered_rps": $offeredRps,
         | "soak_sec": $soakSec, "events_per_key": $EventsPerKey,
         | "gap_sec": $GapSeconds, "watermark": ${js(WatermarkDelay)},
         | "ttl_sec": $TtlSeconds,
         | "produced": $total, "keys": $totalKeys,
         | "kills": [${kills.map(k => s"""{"t_sec":${k._1},"pid":${k._2}}""")
        .mkString(",")}],
         | "accounting": {"digest_keys": $keys, "lost": $lost,
         |  "duplicate_digest_keys": $dup, "wrong_values": $wrong},
         | "state_plateau": {
         |  "running_spend_ttl": {"mid_third_peak_rows": $spendMid,
         |   "late_third_peak_rows": $spendLate,
         |   "total_keys_seen": $totalKeys},
         |  "session_digest_timers": {"mid_third_peak_rows": $digestMid,
         |   "late_third_peak_rows": $digestLate}},
         | "curves": {
         |  "running_spend_ttl": [
         |${curveJson(spendCurve)}
         |  ],
         |  "session_digest_timers": [
         |${curveJson(digestCurve)}
         |  ]}}
         |""".stripMargin
    Files.writeString(Paths.get(outJson), json)
    val histLine =
      s"""{${graft.Provenance.stamp("stateful-state-soak")},""" +
        s""""state_soak":{"soak_sec":$soakSec,"offered_rps":$offeredRps,""" +
        s""""produced":$total,"keys":$totalKeys,"lost":$lost,"dup":$dup,""" +
        s""""wrong":$wrong,"kills":${kills.size},""" +
        s""""ttl_late_peak_rows":$spendLate,""" +
        s""""digest_late_peak_rows":$digestLate}}"""
    try Files.writeString(Paths.get("bench_history.jsonl"),
      histLine + "\n", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Throwable => () }
    println(histLine)
    println(s"[state-soak] wrote $outJson")
    spark.stop()
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(base)
    try walk.iterator().asScala.toSeq.reverse
      .foreach(p => Files.deleteIfExists(p))
    finally walk.close()

    // hard contracts: exactly-once digests; TTL state must not scale with
    // total keys seen (45 s of ~500 keys/s live vs 300k total at defaults)
    require(lost == 0L && dup == 0L && wrong == 0L,
      s"state soak accounting violated: lost=$lost dup=$dup wrong=$wrong")
    // the plateau bound is only meaningful once the soak outlives the TTL
    // by a few expiry cycles (a 45 s smoke cannot expire 45 s state)
    if (soakSec >= 3 * TtlSeconds)
      require(spendLate <= totalKeys / 2,
        s"TTL state grew with total keys: late-third peak $spendLate rows " +
          s"vs $totalKeys keys seen — expiry is not bounding the store")
  }
}
