package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import StatefulOps.SpendEvent

/** transformWithState (Spark 4 arbitrary-state API): running per-user
  * totals must accumulate across micro-batches, keep exact integer
  * cents, and emit only keys that saw input. Requires the RocksDB state
  * store provider — set per-query via the checkpoint'd session conf.
  */
class StatefulOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("running spend accumulates across micro-batches with O(1) state per key") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("graft-tws").toString
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[SpendEvent]
      val out = StatefulOps.runningSpend(mem.toDF())
      val q = out.writeStream
        .format("memory").queryName("tws_spend")
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        mem.addData(SpendEvent(1L, 100L), SpendEvent(1L, 250L), SpendEvent(2L, 40L))
        q.processAllAvailable()
        val b1 = spark.table("tws_spend")
          .as[StatefulOps.SpendTotal].collect().map(t => t.user_id -> t).toMap
        assert(b1(1L).n_events == 2 && b1(1L).total_cents == 350L)
        assert(b1(2L).n_events == 1 && b1(2L).total_cents == 40L)

        // second batch: user 1 continues from stored state; user 3 is new;
        // user 2 is silent (no re-emission in update mode)
        mem.addData(SpendEvent(1L, 1L), SpendEvent(3L, 7L))
        q.processAllAvailable()
        val rows = spark.table("tws_spend").as[StatefulOps.SpendTotal].collect()
        val latest1 = rows.filter(_.user_id == 1L).maxBy(_.n_events)
        assert(latest1.n_events == 3 && latest1.total_cents == 351L)
        assert(rows.count(_.user_id == 3L) == 1)
        assert(rows.count(_.user_id == 2L) == 1, "silent key must not re-emit")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("kill-and-resume keeps transformWithState state, with and without " +
      "RocksDB changelog checkpointing") {
    // Spark 4 state-store feature the suite didn't exercise (r7 verdict
    // item 7): with changelog checkpointing the provider uploads per-batch
    // CHANGELOGS instead of full SST snapshots — restart must replay them
    // onto the last snapshot and land in the identical state. Run the same
    // kill-and-resume scenario under both modes and assert the final
    // per-user totals are equal (and correct) in each.
    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> null)
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      val finals = Seq(false, true).map { changelog =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        spark.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          changelog.toString)
        val dir = Files.createTempDirectory(s"graft-tws-cl-$changelog").toString
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[SpendEvent]
        // memory sink can't recover from a checkpoint; foreachBatch can —
        // collect update-mode rows into a driver-side buffer
        val seen = new java.util.concurrent.ConcurrentLinkedQueue[StatefulOps.SpendTotal]
        def start() = StatefulOps.runningSpend(mem.toDF())
          .writeStream
          .outputMode("update")
          .option("checkpointLocation", s"$dir/ckpt")
          .trigger(Trigger.ProcessingTime(0))
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[StatefulOps.SpendTotal], _: Long) =>
              batch.collect().foreach(seen.add)
          }
          .start()
        // life 1: two micro-batches of state buildup, then KILL
        val q1 = start()
        try {
          mem.addData(SpendEvent(1L, 100L), SpendEvent(2L, 40L))
          q1.processAllAvailable()
          mem.addData(SpendEvent(1L, 250L), SpendEvent(3L, 7L))
          q1.processAllAvailable()
        } finally q1.stop()
        // life 2: NEW query object, same checkpoint — state must resume,
        // not restart from zero
        val q2 = start()
        try {
          mem.addData(SpendEvent(1L, 1L), SpendEvent(2L, 2L), SpendEvent(3L, 3L))
          q2.processAllAvailable()
          import scala.jdk.CollectionConverters._
          seen.asScala.toSeq
            .groupBy(_.user_id)
            .map { case (u, ts) => u -> {
              val last = ts.maxBy(_.n_events); (last.n_events, last.total_cents)
            } }
        } finally q2.stop()
      }
      finals.zip(Seq("snapshot", "changelog")).foreach { case (got, mode) =>
        assert(got(1L) == ((3L, 351L)), s"$mode: user 1 state lost: $got")
        assert(got(2L) == ((2L, 42L)), s"$mode: user 2 state lost: $got")
        assert(got(3L) == ((2L, 10L)), s"$mode: user 3 state lost: $got")
      }
      assert(finals.head == finals.last,
        "changelog-checkpointed resume must equal snapshot-checkpointed resume")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("list state keeps a bounded last-N trail per key across batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("graft-tws-trail").toString
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[SpendEvent]
      val q = StatefulOps.spendTrail(mem.toDF()).writeStream
        .format("memory").queryName("tws_trail")
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        mem.addData((1L to 4L).map(i => SpendEvent(1L, i)): _*)
        q.processAllAvailable()
        val b1 = spark.table("tws_trail").as[StatefulOps.TrailStat]
          .collect().filter(_.user_id == 1L).maxBy(_.n_in_trail)
        assert(b1.n_in_trail == 4 && b1.trail_cents == 10L &&
          b1.trail_max_cents == 4L)
        // 3 more arrivals: trail trims to the LAST 5 (3,4,5,6,7)
        mem.addData(SpendEvent(1L, 5L), SpendEvent(1L, 6L), SpendEvent(1L, 7L))
        q.processAllAvailable()
        val b2 = spark.table("tws_trail").as[StatefulOps.TrailStat]
          .collect().filter(_.user_id == 1L).maxBy(_.trail_max_cents)
        assert(b2.n_in_trail == 5, "trail must trim to TrailLen")
        assert(b2.trail_cents == 3L + 4 + 5 + 6 + 7 && b2.trail_max_cents == 7L)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("event-time timers close gap sessions and emit the MapState digest") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("graft-tws-timer").toString
      implicit val sqlCtx = spark.sqlContext
      def ts(min: Int): java.sql.Timestamp =
        java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
      val mem = MemoryStream[StatefulOps.DigestEvent]
      val q = StatefulOps.sessionDigest(mem.toDF(), gapSeconds = 300,
          watermark = "0 seconds")
        .writeStream.format("memory").queryName("tws_digest")
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        // user 1: three events within one session (2 clicks, 1 purchase)
        mem.addData(
          StatefulOps.DigestEvent(1L, ts(0), "click", 10L),
          StatefulOps.DigestEvent(1L, ts(2), "purchase", 500L),
          StatefulOps.DigestEvent(1L, ts(3), "click", 7L))
        q.processAllAvailable()
        assert(spark.table("tws_digest").isEmpty,
          "session must stay open until the watermark passes end + gap")
        // far-future event advances the watermark past end (10:03) + 5 min
        mem.addData(StatefulOps.DigestEvent(2L, ts(120), "view", 1L))
        q.processAllAvailable()
        // one more batch so the new watermark fires the timer
        mem.addData(StatefulOps.DigestEvent(2L, ts(121), "view", 1L))
        q.processAllAvailable()
        val rows = spark.table("tws_digest")
          .as[StatefulOps.SessionDigest].collect()
        assert(rows.length == 1, s"expected one closed session, got ${rows.toSeq}")
        val d = rows.head
        assert(d.user_id == 1L && d.n_events == 3L && d.total_cents == 517L)
        assert(d.session_start == ts(0) && d.session_end == ts(3))
        assert(d.type_counts == "click:2,purchase:1")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("statestore reader audits transformWithState state offline") {
    // Spark 4 state data source: after the streaming query stops, the
    // checkpoint is directly queryable — the ops path for "what does the
    // store hold for key X" without replaying the stream.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("graft-tws-read").toString
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[SpendEvent]
      val q = StatefulOps.runningSpend(mem.toDF()).writeStream
        .format("memory").queryName("tws_audit")
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        mem.addData(SpendEvent(1L, 100L), SpendEvent(2L, 40L))
        q.processAllAvailable()
        mem.addData(SpendEvent(1L, 11L))
        q.processAllAvailable()
      } finally q.stop()
      val state = spark.read.format("statestore")
        .option("path", s"$dir/ckpt")
        .option("stateVarName", "spend")
        .load()
      val totals = state.selectExpr("value.user_id", "value.n_events",
          "value.total_cents")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(totals == Set((1L, 2L, 111L), (2L, 1L, 40L)),
        s"unexpected state contents: $totals")
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("a TTL'd state variable runs under ProcessingTime mode and accumulates within the TTL") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("graft-tws-ttl").toString
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[SpendEvent]
      // long TTL: expiry never fires inside the test, but the TTL path
      // (ProcessingTime mode + TTL'd ValueState) must initialize and run
      val out = StatefulOps.runningSpend(mem.toDF(),
        org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofHours(1)))
      val q = out.writeStream
        .format("memory").queryName("tws_spend_ttl")
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        // no processAllAvailable here: a ProcessingTime-mode query with
        // TTL'd state never quiesces (TTL upkeep counts as pending
        // work), so poll the sink instead
        mem.addData(SpendEvent(7L, 10L), SpendEvent(7L, 5L))
        val deadline = System.currentTimeMillis() + 120000L
        def rows() = spark.table("tws_spend_ttl")
          .as[StatefulOps.SpendTotal].collect().filter(_.user_id == 7L)
        while (System.currentTimeMillis() < deadline &&
          !rows().exists(_.n_events == 2)) Thread.sleep(250)
        assert(rows().nonEmpty,
          s"no output within the deadline; query exception: ${q.exception}")
        val latest = rows().maxBy(_.n_events)
        assert(latest.n_events == 2 && latest.total_cents == 15L,
          "state inside the TTL window must keep accumulating")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
