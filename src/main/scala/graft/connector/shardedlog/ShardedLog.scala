package graft.connector.shardedlog

import java.io.{File, FileOutputStream, OutputStreamWriter, RandomAccessFile}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.Base64
import scala.jdk.CollectionConverters._

/** Storage layer of the sharded-log connector: a Kinesis-like ordered,
  * sharded, replayable log over a local directory (SURVEY.md §1.1 — the
  * environment has no Kinesis/Kafka connector jars and zero egress, so the
  * stream substrate is modeled, not linked).
  *
  * Layout: `<streamDir>/shard-00000`, `shard-00001`, … — one append-only
  * file per shard, one record per line:
  * `seq \t arrivalMillis \t base64(key) \t base64(data)`.
  *
  * Semantics reproduced from the reference:
  *  - shard count fixed at stream creation (`create_stream ShardCount=2`,
  *    Solution.ipynb cell 24);
  *  - partition key → shard via the MD5 hash-range split exactly like
  *    Kinesis (README.md:244-256): shard = md5(key)·N / 2⁶⁰ over the first
  *    60 bits — same records land on the same shards as a real stream with
  *    evenly split hash ranges;
  *  - sequence numbers are per-shard monotonic line indexes
  *    (consumer.py:120,174);
  *  - records with the same partition key keep production order within
  *    their shard (single appender per shard).
  */
object ShardedLog {

  final case class Record(shard: String, sequenceNumber: Long,
      arrivalMillis: Long, partitionKey: String, data: Array[Byte])

  def shardName(i: Int): String = f"shard-$i%05d"

  /** S8 "DDL": create the stream directory with N shard files. */
  def createStream(streamDir: String, shardCount: Int): Unit = {
    val dir = new File(streamDir)
    dir.mkdirs()
    (0 until shardCount).foreach { i =>
      new File(dir, shardName(i)).createNewFile()
    }
  }

  def listShards(streamDir: String): Seq[String] = {
    val dir = new File(streamDir)
    Option(dir.list()).getOrElse(Array.empty)
      .filter(_.startsWith("shard-")).sorted.toSeq
  }

  def shardCount(streamDir: String): Int = listShards(streamDir).size

  /** Kinesis-style hash-range shard assignment: first 60 bits of md5(key),
    * range [0, 2⁶⁰) split evenly across N shards. Reproducible in Catalyst
    * as `shiftright(conv(substr(md5(key),1,15),16,10) * N, 60)`.
    */
  def shardFor(key: String, numShards: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes(UTF_8)).take(8)
      .map("%02x".format(_)).mkString.take(15)
    ((BigInt(hex, 16) * numShards) >> 60).toInt
  }

  /** Single-record keyed write (≙ PutRecord,
    * producer_from_cli_my_modifications.py:44-49). Returns (shard,
    * sequenceNumber) like the Kinesis response. Thread-safe per JVM.
    */
  def putRecord(streamDir: String, key: String, data: Array[Byte],
      arrivalMillis: Long = System.currentTimeMillis()): (String, Long) = {
    val n = shardCount(streamDir)
    require(n > 0, s"stream $streamDir does not exist / has no shards")
    val shard = shardName(shardFor(key, n))
    appendLines(streamDir, shard, Seq((key, data, arrivalMillis)))
      match { case first => (shard, first) }
  }

  /** Per-path intra-JVM monitors: `FileChannel.lock()` only serializes
    * across PROCESSES — within one JVM an overlapping lock attempt throws
    * OverlappingFileLockException instead of blocking, so two local-mode
    * writer tasks hitting the same shard would crash rather than queue.
    * The monitor serializes same-JVM writers; the channel lock then
    * serializes cross-process ones.
    */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Append a batch of records to ONE shard; returns the first assigned
    * sequence number. Thread-safe in-JVM (per-path monitor) and
    * cross-process (file lock): concurrent writers cannot interleave
    * half-lines or duplicate sequence numbers.
    */
  def appendLines(streamDir: String, shard: String,
      records: Seq[(String, Array[Byte], Long)]): Long = {
    val file = new File(streamDir, shard)
    val monitor = jvmLocks.computeIfAbsent(file.getCanonicalPath, _ => new Object)
    monitor.synchronized {
      val raf = new RandomAccessFile(file, "rw")
      val lock = raf.getChannel.lock()
      try {
        val firstSeq = countLines(file)
        raf.seek(raf.length())
        val sb = new StringBuilder
        records.zipWithIndex.foreach { case ((key, data, arrival), i) =>
          sb.append(firstSeq + i).append('\t')
            .append(arrival).append('\t')
            .append(Base64.getEncoder.encodeToString(key.getBytes(UTF_8))).append('\t')
            .append(Base64.getEncoder.encodeToString(data)).append('\n')
        }
        raf.write(sb.toString.getBytes(UTF_8))
        firstSeq
      } finally {
        lock.release()
        raf.close()
      }
    }
  }

  private def countLines(file: File): Long = {
    if (!file.exists() || file.length() == 0) return 0L
    val in = Files.newInputStream(file.toPath)
    try {
      var count = 0L
      val buf = new Array[Byte](1 << 16)
      var read = in.read(buf)
      while (read > 0) {
        var i = 0
        while (i < read) { if (buf(i) == '\n') count += 1; i += 1 }
        read = in.read(buf)
      }
      count
    } finally in.close()
  }

  /** Current end sequence (exclusive) per shard. */
  def endOffsets(streamDir: String): Map[String, Long] =
    listShards(streamDir).map { s =>
      s -> countLines(new File(streamDir, s))
    }.toMap

  /** Read records of one shard in [startSeq, endSeq). The underlying
    * `Files.lines` stream is closed when the iterator is exhausted (the
    * streaming source calls this per shard per micro-batch — relying on GC
    * to release the handle would leak file descriptors on 2 s triggers).
    */
  def read(streamDir: String, shard: String, startSeq: Long,
      endSeq: Long): Iterator[Record] = {
    val path = Paths.get(streamDir, shard)
    if (!Files.exists(path)) return Iterator.empty
    val stream = Files.lines(path, UTF_8)
    val base = stream.iterator().asScala
      .drop(startSeq.toInt).take((endSeq - startSeq).toInt)
    new Iterator[Record] {
      private var open = true
      private def closeOnce(): Unit = if (open) { open = false; stream.close() }
      override def hasNext: Boolean = {
        val h = open && base.hasNext
        if (!h) closeOnce()
        h
      }
      override def next(): Record = {
        if (!hasNext) throw new NoSuchElementException(s"$shard exhausted")
        val parts = base.next().split("\t", 4)
        Record(shard, parts(0).toLong, parts(1).toLong,
          new String(Base64.getDecoder.decode(parts(2)), UTF_8),
          Base64.getDecoder.decode(parts(3)))
      }
    }
  }

  /** First sequence at-or-after a timestamp (≙ AT_TIMESTAMP iterator). */
  def seqAtTimestamp(streamDir: String, shard: String, millis: Long): Long = {
    val path = Paths.get(streamDir, shard)
    if (!Files.exists(path)) return 0L
    val stream = Files.lines(path, UTF_8)
    try {
      val it = stream.iterator().asScala
      var seq = 0L
      var found = -1L
      while (it.hasNext && found < 0) {
        val parts = it.next().split("\t", 3)
        if (parts(1).toLong >= millis) found = seq
        seq += 1
      }
      if (found < 0) seq else found
    } finally stream.close()
  }
}
