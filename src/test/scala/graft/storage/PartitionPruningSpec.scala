package graft.storage

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Partition pruning (directory-level data skipping): a Hive-layout
  * partitioned write plus a partition-column predicate must scan ONLY the
  * matching directories — at 100 TB the difference between touching one
  * date partition and touching all of them IS the query plan. Companion
  * to BucketingSpec (exchange elimination); together they cover the two
  * storage-layout levers the engine relies on.
  */
class PartitionPruningSpec extends SparkTestBase {

  test("partition-column filter prunes the scan to matching directories only") {
    val dir = Files.createTempDirectory("graft_part_prune").toString
    Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = pruned.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory skip), not
    // PushedFilters (row-group skip) — partition columns aren't in the files
    assert(plan.contains("PartitionFilters:") &&
      plan.contains("isnotnull(event_type"),
      "partition filter missing from scan:\n" + plan)

    // physical proof: the scan's selected partitions are 1 of 5
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, scanned ${scan.selectedPartitions.partitionCount}")

    // and the rows still match the unpartitioned filter
    val expected = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(pruned.count() == expected)
  }

  test("non-partition predicates still push to parquet row groups inside partitions") {
    val dir = Files.createTempDirectory("graft_part_prune2").toString
    Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase" && col("value") > 100.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,100.0)]"),
      "row filter must still push down within partitions:\n" + plan)
  }
}
