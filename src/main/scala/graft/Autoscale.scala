package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Size-conditional selection of the DEPTH levers (bucketed iterative
  * scratch, serialized checkpoint blocks) so one binary runs the right
  * shape at every scale with NO per-run conf.
  *
  * The r14/r15 ×1000 depth audits proved the levers both ways: at ×1000
  * (15 GB lineitem, 1.1 B co-purchase edges) the default checkpoint
  * shapes DNF one box (GC-retained Θ(E) shuffle scratch; deserialized
  * unroll of GB-scale checkpoint partitions OOMs a 96 GiB heap), while
  * at ×100 (1.4 GB) the defaults WIN (kcore eager 72.9 s vs bucketed
  * 76.4 s, and the serialized level was a measured ~5–9% whole-surface
  * tax at sf0.1 — `ab_pair_drift_r15.json`). So the switch must be a
  * function of input size, not a flag a human remembers to pass.
  *
  * The size signal is the LEAF SCAN mass of the operator's input plan:
  * the sum of `stats.sizeInBytes` over file-backed leaves — pure catalog
  * metadata (parquet footer/file sizes), no job, no sampling, monotone
  * in the data scale, and available before the first action. Leaves that
  * are `LogicalRDD` (a previous in-loop checkpoint) are EXCLUDED: their
  * stats may be the conf default (`Long.MaxValue`) rather than a real
  * measurement, and a loop's post-round-1 plans must not flip levers the
  * round-0 decision (which saw the true file leaves) declined.
  *
  * Default threshold 8 GiB: ≥4× above the measured ×100 crossover mass
  * (1.4 GB zstd lineitem — eager/deserialized still faster there) and
  * ~half the ×1000 mass (15 GB — where the depth shapes are the only
  * ones that complete). Codec variation (snappy vs zstd ~2×) cannot
  * bridge that decade. Override per session with
  * `spark.graft.depthAutoThresholdBytes`; the explicit lever flags still
  * force either way.
  */
object Autoscale {

  /** Leaf-scan-bytes threshold (long) above which the depth levers
    * auto-enable when their flags are unset.
    */
  val ThresholdFlag = "spark.graft.depthAutoThresholdBytes"

  val DefaultThresholdBytes: Long = 8L << 30 // 8 GiB

  def thresholdBytes(spark: SparkSession): Long =
    spark.conf.getOption(ThresholdFlag).map(_.toLong)
      .getOrElse(DefaultThresholdBytes)

  /** Σ `stats.sizeInBytes` over the plan's non-LogicalRDD leaves —
    * file-relation stats are the actual on-disk file sizes (catalog
    * metadata, no job).
    */
  def leafScanBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.collectLeaves()
      .filterNot(_.isInstanceOf[LogicalRDD])
      .map(_.stats.sizeInBytes).sum

  /** True when `df`'s source scan mass crosses the depth threshold. */
  def big(df: DataFrame): Boolean =
    leafScanBytes(df) >= BigInt(thresholdBytes(df.sparkSession))
}
