package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.connector.shardedlog.{ShardedLog, ShardedLogSource, ShardedLogWriter}

/** Gate coverage for the sharded-log connector (SURVEY.md §2.1): a real
  * write→read roundtrip through the DataSource V2 source whose OUTPUT is
  * nevertheless oracle-checkable — shard placement is the deterministic
  * md5 hash-range function, so DuckDB can recompute the expected per-shard
  * statistics straight from the events table without touching any files.
  */
object StreamQueries {

  private val NumShards = 4

  /** Write events through the keyed writer into a fresh sharded-log
    * stream, read it back through the DSv2 batch scan, and aggregate
    * per-shard record counts, distinct keys and payload bytes.
    *
    * The stream lives in ONE stable per-JVM temp location that is wiped and
    * recreated on each invocation — repeated Bench/Verify runs must not
    * accumulate temp directories.
    */
  def shardedLogRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-roundtrip")
    if (Files.exists(base)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(base)
      try walk.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
    val streamDir = base.resolve("stream").toString
    ShardedLog.createStream(streamDir, NumShards)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id").cast("string").as("key"),
        col("props").as("payload"), col("event_id"))
    ShardedLogWriter.write(ev, streamDir, col("key"),
      col("payload").cast("binary"), orderWithinKey = Seq(col("event_id")))

    spark.read.format(ShardedLogSource.ShortName)
      .option("path", streamDir).load()
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("partition_key")).as("n_keys"),
        sum(length(col("data"))).as("payload_bytes"),
        max(col("sequence_number")).as("max_seq"))
      .orderBy(col("shard"))
  }

  /** DuckDB recomputes shard placement with the identical md5 range-split:
    * shard = (first-60-bits-of-md5(key) * N) >> 60. `strlen` is DuckDB's
    * BYTE length (≡ Spark `length` on BINARY after the UTF-8 cast) — plain
    * `length(VARCHAR)` counts characters and would diverge on non-ASCII
    * payloads.
    */
  val shardedLogRoundtripSql: String =
    s"""WITH placed AS (
       |  SELECT printf('shard-%05d',
       |           CAST((('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
       |                 * $NumShards) >> 60 AS INTEGER)) AS shard,
       |         CAST(user_id AS VARCHAR) AS key,
       |         props
       |  FROM events)
       |SELECT shard, count(*) AS n_records,
       |  count(DISTINCT key) AS n_keys,
       |  CAST(sum(strlen(props)) AS BIGINT) AS payload_bytes,
       |  count(*) - 1 AS max_seq
       |FROM placed
       |GROUP BY shard
       |ORDER BY shard""".stripMargin

  /** Batch twin of the ListState spend trail
    * ([[graft.streaming.StatefulOps.SpendTrailProcessor]]): for each
    * purchasing user, the trailing last-5-purchase count/sum/max at
    * their LATEST purchase — exactly the feature the streaming
    * processor's bounded list state serves, recomputed declaratively so
    * the oracle can gate it. Partitioned rows-frame window + a rank-1
    * filter (WindowGroupLimit keeps the per-user top-1 partial).
    */
  def trailLast5(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    p.withColumn("n_in_trail", count(lit(1)).over(w))
      .withColumn("trail_cents", sum(col("cents")).over(w))
      .withColumn("trail_max_cents", max(col("cents")).over(w))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_in_trail"), col("trail_cents"),
        col("trail_max_cents"))
      .orderBy(col("user_id"))
  }

  val trailLast5Sql: String =
    """WITH p AS (
      |  SELECT user_id, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id, event_id,
      |    CAST(count(*) OVER w AS BIGINT) AS n_in_trail,
      |    CAST(sum(cents) OVER w AS BIGINT) AS trail_cents,
      |    max(cents) OVER w AS trail_max_cents,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC)
      |      AS rn
      |  FROM p
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
      |SELECT user_id, n_in_trail, trail_cents, trail_max_cents
      |FROM t WHERE rn = 1
      |ORDER BY user_id""".stripMargin
}
