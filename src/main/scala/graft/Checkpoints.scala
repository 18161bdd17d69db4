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
    * `StorageLevel.fromString` name). UNSET (the default) is AUTO:
    * MEMORY_AND_DISK — Spark's own localCheckpoint level, partitions as
    * deserialized object arrays with per-partition disk fallback —
    * unless the checkpointed plan's leaf scan mass crosses
    * [[Autoscale]]'s threshold, where it switches to
    * MEMORY_AND_DISK_SER. Both halves are measured:
    *
    *   - deserialized is the fast level whenever checkpointed partitions
    *     are ordinary-sized (gate/bench scale, or a real cluster where
    *     maxPartitionBytes keeps partitions ~100 MB): the r15 two-binary
    *     A/B measured the engine-wide SER default r14 shipped as a REAL
    *     ~9% whole-surface tax at sf0.1 (kcore ×1.24, bfs ×1.27,
    *     neighbor_degree ×1.22 — every stableCheckpoint user paid
    *     serialize+deserialize on blocks that fit in memory anyway;
    *     `ab_pair_drift_r15.json`).
    *   - SER is the level that COMPLETES when single checkpointed
    *     partitions reach GB scale — the r14 ×1000 depth audit measured
    *     the deserialized unroll heap-OOMing a 96 GiB JVM on
    *     `pagerank_bipartite`'s 1.1 B-row edge checkpoint, while SER
    *     (sealed UnsafeRow chunks, spill per-chunk) completes.
    *
    * The auto decision keys on the same leaf-scan signal as the bucketed
    * iteration lever (metadata-only, monotone, excludes LogicalRDD
    * leaves whose stats may be the conf-default Long.MaxValue, AND
    * `graft_scratch_*` depth-scratch tables — see [[Autoscale]]). A
    * checkpoint whose lineage roots in a PREVIOUS checkpoint or in the
    * depth mode's own scratch tables therefore reads mass 0 and stays
    * deserialized — correct for the loops' node-scale state (alive
    * sets, ranks, frontiers, thresholds) in BOTH iteration shapes
    * (without the scratch exclusion the bucketed loops' node-scale
    * in-loop checkpoints silently picked up the adjacency table's Θ(E)
    * file mass and flipped to SER, contradicting this paragraph — r16
    * advice); the Θ(E) in-loop re-checkpoints that genuinely need SER
    * only exist in the eager iteration shape, which the
    * bucketed-iterations auto lever replaces past the very same
    * threshold.
    * Setting the conf to an explicit level still forces it everywhere;
    * a 100 TB deployment whose iterative state per partition outgrows
    * executor heaps can also flip [[Flag]] to reliable checkpointing,
    * which serializes to DFS by construction.
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
        val leaf = Autoscale.leafScanBytes(df)
        val thr = Autoscale.thresholdBytes(spark)
        val (level, mode) = spark.conf.getOption(LevelFlag) match {
          case Some(name) => (StorageLevel.fromString(name), "forced")
          case None =>
            (if (leaf >= BigInt(thr)) StorageLevel.MEMORY_AND_DISK_SER
             else StorageLevel.MEMORY_AND_DISK, "auto")
        }
        // one structured decision row per lever choice (first distinct
        // occurrence printed), so depth artifacts show which level ran
        Autoscale.record(Autoscale.callerOp, "localCheckpointLevel",
          leaf, thr, level.description, mode)
        df.localCheckpoint(true, level)
      }
    }

    /** LAZY variant of [[stableCheckpoint]]: marks the plan for
      * truncation but lets the CALLER's next action materialize the
      * blocks as a side effect — one job instead of two wherever a
      * checkpoint is immediately followed by an action over it (the
      * iterative loops' shape: truncate, then read a convergence
      * scalar). The r18 probe sweep measured the per-action driver
      * round-trip at ~100-300 ms; a 10-round component loop pays it 20
      * times eagerly, 10 times lazily, with identical blocks, lineage
      * truncation and results. Callers MUST run an action on the
      * returned frame before the next loop round builds on it —
      * otherwise round N+1's plan silently grows the untruncated
      * lineage (the exact disease this seam exists to prevent).
      */
    def stableCheckpointLazy(): DataFrame = {
      val spark = df.sparkSession
      val reliable =
        spark.conf.getOption(Flag).exists(_.equalsIgnoreCase("true"))
      if (reliable) {
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$Flag=true requires SparkContext.setCheckpointDir " +
            "(point it at job scratch storage, e.g. an HDFS/S3 path)")
        df.checkpoint(false)
      } else {
        val leaf = Autoscale.leafScanBytes(df)
        val thr = Autoscale.thresholdBytes(spark)
        val (level, mode) = spark.conf.getOption(LevelFlag) match {
          case Some(name) => (StorageLevel.fromString(name), "forced")
          case None =>
            (if (leaf >= BigInt(thr)) StorageLevel.MEMORY_AND_DISK_SER
             else StorageLevel.MEMORY_AND_DISK, "auto")
        }
        Autoscale.record(Autoscale.callerOp, "localCheckpointLevel",
          leaf, thr, level.description, mode)
        df.localCheckpoint(false, level)
      }
    }
  }
}
