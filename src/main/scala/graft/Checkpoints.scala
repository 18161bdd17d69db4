package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage-truncation policy for the iterative operators (connected
  * components, k-core peeling, PageRank, postings reuse, …).
  *
  * Default (`spark.graft.reliableCheckpoint` unset/false):
  * `localCheckpoint` — executor-local blocks, no DFS round-trip; the
  * right call at local[32] and for latency-sensitive clusters. Its known
  * cost: blocks are NOT replayable, so on a real cluster an executor
  * loss mid-iteration fails the query (restart-from-scratch semantics).
  *
  * Escape hatch (`spark.graft.reliableCheckpoint=true`): `checkpoint()`
  * — materializes to `SparkContext.setCheckpointDir` (HDFS/S3 on a
  * cluster), so iterative lineage survives executor loss at the price of
  * a write+read per truncation. For a 1000-executor 100 TB run where a
  * single executor loss during a 3-round peel is near-certain, that
  * trade is the correct one — flip the flag, point the checkpoint dir at
  * the job's scratch bucket, and every iterative operator switches.
  */
object Checkpoints {

  /** Boolean session conf selecting reliable `checkpoint()` over
    * `localCheckpoint()` in every iterative operator.
    */
  val Flag = "spark.graft.reliableCheckpoint"

  /** Storage level for the `localCheckpoint` path (a
    * `StorageLevel.fromString` name). Default MEMORY_AND_DISK_SER:
    * checkpointed partitions are stored as compact serialized chunks
    * (UnsafeRow bytes — serialization is a near-memcpy) that spill to
    * disk per-chunk. The Spark default for `localCheckpoint` is the
    * DESERIALIZED level, which materializes every partition as a Java
    * object array before the disk fallback can kick in — ~56 B/row of
    * object overhead plus N concurrent task unrolls of GB-scale
    * partitions. The r14 ×1000 depth audit measured that exact failure:
    * `pagerank_bipartite`'s 1.1 B-row edge checkpoint heap-OOMed a
    * 96 GiB JVM mid-unroll under the deserialized default, and completes
    * under MEMORY_AND_DISK_SER. At cluster scale the SER level is also
    * what you want for a row-encoded lineage cut: block transfer and
    * eviction move sealed byte chunks, never object graphs.
    */
  val LevelFlag = "spark.graft.localCheckpointLevel"

  implicit final class StableCheckpoint(private val df: DataFrame)
      extends AnyVal {

    /** `localCheckpoint()` by default; reliable `checkpoint()` when
      * [[Flag]] is true (requires `setCheckpointDir`, enforced with a
      * clear error instead of Spark's late NPE-ish failure).
      */
    def stableCheckpoint(): DataFrame = {
      val spark = df.sparkSession
      val reliable =
        spark.conf.getOption(Flag).exists(_.equalsIgnoreCase("true"))
      if (reliable) {
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$Flag=true requires SparkContext.setCheckpointDir " +
            "(point it at job scratch storage, e.g. an HDFS/S3 path)")
        df.checkpoint()
      } else {
        val level = StorageLevel.fromString(
          spark.conf.getOption(LevelFlag).getOrElse("MEMORY_AND_DISK_SER"))
        df.localCheckpoint(true, level)
      }
    }
  }
}
