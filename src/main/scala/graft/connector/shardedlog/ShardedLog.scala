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

  /** Lineage + hash-range metadata for one shard (Kinesis DescribeStream
    * analog, README.md:57-69 of the reference). `start`/`endEx` bound the
    * shard's slice of the 60-bit md5 hash space; `parents` is non-empty for
    * shards created by split/merge; a closed shard (`open == false`) takes
    * no further writes and its end offset is final.
    */
  final case class ShardInfo(name: String, start: Long, endEx: Long,
      parents: Seq[String], open: Boolean)

  /** Size of the hash space: first 60 bits of md5. */
  val HashSpace: Long = 1L << 60

  private val MetaFile = "shards.json"

  def shardName(i: Int): String = f"shard-$i%05d"

  /** S8 "DDL": create the stream directory with N shard files and the
    * lineage metadata (even hash-range split, no parents, all open).
    */
  def createStream(streamDir: String, shardCount: Int): Unit = {
    val dir = new File(streamDir)
    dir.mkdirs()
    (0 until shardCount).foreach { i =>
      new File(dir, shardName(i)).createNewFile()
    }
    writeMeta(streamDir, evenMeta((0 until shardCount).map(shardName)))
  }

  /** Even hash-range split over the given shard names: shard i covers
    * exactly the keys where `(hash60 * N) >> 60 == i` (the [[shardFor]]
    * arithmetic), i.e. [ceil(i·2⁶⁰/N), ceil((i+1)·2⁶⁰/N)).
    */
  private def evenMeta(names: Seq[String]): Seq[ShardInfo] = {
    val n = names.size
    def bound(i: Int): Long =
      ((BigInt(i) * HashSpace + n - 1) / n).toLong
    names.zipWithIndex.map { case (name, i) =>
      ShardInfo(name, bound(i), bound(i + 1), Nil, open = true)
    }
  }

  /** Shard metadata; streams created before lineage support (no
    * shards.json) derive the even split with no parents.
    */
  def shardMeta(streamDir: String): Seq[ShardInfo] = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val f = new File(streamDir, MetaFile)
    if (f.exists()) {
      org.json4s.jackson.JsonMethods
        .parse(new String(Files.readAllBytes(f.toPath), UTF_8))
        .extract[Seq[ShardInfo]]
    } else evenMeta(listShards(streamDir))
  }

  private def writeMeta(streamDir: String, meta: Seq[ShardInfo]): Unit = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val tmp = Paths.get(streamDir, MetaFile + ".tmp")
    Files.write(tmp,
      org.json4s.jackson.Serialization.write(meta).getBytes(UTF_8))
    Files.move(tmp, Paths.get(streamDir, MetaFile),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def metaMonitor(streamDir: String): Object =
    jvmLocks.computeIfAbsent(
      new File(streamDir, MetaFile).getCanonicalPath, _ => new Object)

  private def nextShardIndex(meta: Seq[ShardInfo]): Int =
    meta.map(si => si.name.stripPrefix("shard-").toInt).max + 1

  /** SplitShard: close `shard` and hand each half of its hash range to a
    * new child. Like Kinesis, the parent stops accepting writes and
    * remains readable; consumers must exhaust it before reading the
    * children (enforced by the streaming source's offset holdback).
    */
  def splitShard(streamDir: String, shard: String): (String, String) =
    metaMonitor(streamDir).synchronized {
      val meta = shardMeta(streamDir)
      val info = meta.find(_.name == shard)
        .getOrElse(throw new IllegalArgumentException(s"no shard $shard"))
      require(info.open, s"$shard is closed")
      require(info.endEx - info.start >= 2, s"$shard range too small to split")
      val mid = info.start + (info.endEx - info.start) / 2
      val i = nextShardIndex(meta)
      val left = ShardInfo(shardName(i), info.start, mid, Seq(shard), open = true)
      val right = ShardInfo(shardName(i + 1), mid, info.endEx, Seq(shard), open = true)
      new File(streamDir, left.name).createNewFile()
      new File(streamDir, right.name).createNewFile()
      writeMeta(streamDir,
        meta.map(si => if (si.name == shard) si.copy(open = false) else si)
          ++ Seq(left, right))
      (left.name, right.name)
    }

  /** MergeShards: close two ADJACENT shards and hand their combined hash
    * range to one new child (Kinesis requires adjacency too). The child is
    * readable only after BOTH parents are exhausted.
    */
  def mergeShards(streamDir: String, a: String, b: String): String =
    metaMonitor(streamDir).synchronized {
      val meta = shardMeta(streamDir)
      val ia = meta.find(_.name == a).getOrElse(
        throw new IllegalArgumentException(s"no shard $a"))
      val ib = meta.find(_.name == b).getOrElse(
        throw new IllegalArgumentException(s"no shard $b"))
      require(ia.open && ib.open, "both merge parents must be open")
      require(ia.endEx == ib.start || ib.endEx == ia.start,
        s"$a and $b are not adjacent in the hash space")
      val child = ShardInfo(shardName(nextShardIndex(meta)),
        math.min(ia.start, ib.start), math.max(ia.endEx, ib.endEx),
        Seq(a, b), open = true)
      new File(streamDir, child.name).createNewFile()
      writeMeta(streamDir,
        meta.map(si => if (si.name == a || si.name == b) si.copy(open = false)
          else si) :+ child)
      child.name
    }

  /** First 60 bits of md5(key) — the hash-range coordinate. */
  def hash60(key: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes(UTF_8)).take(8)
      .map("%02x".format(_)).mkString.take(15)
    BigInt(hex, 16).toLong
  }

  /** The OPEN shard owning `key`'s hash — the post-resharding routing
    * function (open ranges always tile the hash space: creation tiles it,
    * split/merge preserve the tiling).
    */
  def openShardFor(streamDir: String, key: String): String = {
    val h = hash60(key)
    shardMeta(streamDir)
      .find(si => si.open && h >= si.start && h < si.endEx)
      .getOrElse(throw new IllegalStateException(
        s"no open shard covers hash $h in $streamDir"))
      .name
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
    require(shardCount(streamDir) > 0,
      s"stream $streamDir does not exist / has no shards")
    // Range-based routing over the OPEN shards: identical to
    // shardName(shardFor(key, n)) until a split/merge, after which writes
    // go to the owning child (closed parents take no new records).
    val shard = openShardFor(streamDir, key)
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

  /** (length, mtime) → line-count memo: the streaming source polls
    * `endOffsets` every trigger (2 s in the topology), and an idle shard
    * would otherwise be fully re-read on every poll. Any append changes
    * the file length, so a stale hit requires an external writer that
    * leaves length AND mtime identical — not a supported topology (the
    * log is single-writer-per-shard by design, like the sequence
    * numbering itself). The entry is only stored when length/mtime are
    * unchanged across the count, so a mid-count append can never cache
    * a torn value.
    */
  private val lineCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long)]()

  private def countLines(file: File): Long = {
    if (!file.exists() || file.length() == 0) return 0L
    val key = file.getCanonicalPath
    val len = file.length()
    val mtime = file.lastModified()
    val cached = lineCountCache.get(key)
    if (cached != null && cached._1 == len && cached._2 == mtime)
      return cached._3
    val in = Files.newInputStream(file.toPath)
    val count = try {
      var n = 0L
      val buf = new Array[Byte](1 << 16)
      var read = in.read(buf)
      while (read > 0) {
        var i = 0
        while (i < read) { if (buf(i) == '\n') n += 1; i += 1 }
        read = in.read(buf)
      }
      n
    } finally in.close()
    if (file.length() == len && file.lastModified() == mtime)
      lineCountCache.put(key, (len, mtime, count))
    count
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
