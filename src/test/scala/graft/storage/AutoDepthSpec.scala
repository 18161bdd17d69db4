package graft.storage

import graft.{Autoscale, SparkTestBase}
import graft.Checkpoints.StableCheckpoint
import graft.queries.GraphMore
import org.apache.spark.storage.StorageLevel

/** The size-conditional depth levers (r16): with NO flags set, the
  * bucketed-iteration shape and the serialized checkpoint level must
  * auto-enable past the [[Autoscale]] leaf-scan threshold and stay OFF
  * below it — so gate/bench plans are unchanged while a ×1000 depth run
  * completes conf-free. Explicit flags must still force either way.
  */
class AutoDepthSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  // the depth-mode runs necessarily leave their final scratch generation
  // behind (the returned plan scans it); sweep it so the test warehouse
  // stays clean — and the sweep itself exercises dropScratch
  override def afterAll(): Unit = {
    Bucketing.dropScratch(spark)
    super.afterAll()
  }

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("auto depth mode stays OFF below the threshold (default confs)") {
    // sf0.001 leaf mass is KBs, threshold is 2 GiB: the flag-unset plan
    // must be the eager checkpoint shape — no scratch-table scan
    val df = GraphMore.kcoreParts(spark, sf0001)
    assert(!plan(df).contains("graft_scratch_kcore_adj"),
      "auto must not select the bucketed shape at test scale")
  }

  test("auto depth mode turns ON past the threshold, result-identical") {
    val eager = GraphMore.kcoreParts(spark, sf0001)
      .collect().map(_.toString).toSeq
    val auto = withConf(Autoscale.ThresholdFlag -> "1") {
      val df = GraphMore.kcoreParts(spark, sf0001)
      assert(plan(df).contains("graft_scratch_kcore_adj"),
        "threshold=1 with the flag UNSET must auto-select the bucketed shape")
      df.collect().map(_.toString).toSeq
    }
    assert(auto == eager && eager.nonEmpty)
  }

  test("explicit flag=false beats auto past the threshold") {
    val df = withConf(Autoscale.ThresholdFlag -> "1",
      Bucketing.IterationsFlag -> "false") {
      GraphMore.kcoreParts(spark, sf0001)
    }
    assert(!plan(df).contains("graft_scratch_kcore_adj"),
      "an explicit false must force the eager shape at any size")
  }

  /** Storage level the next stableCheckpoint actually registers. */
  private def checkpointLevel(df: org.apache.spark.sql.DataFrame): StorageLevel = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    df.stableCheckpoint() // eager: registers + materializes the blocks
    val fresh = sc.getPersistentRDDs.keySet.diff(before)
    assert(fresh.nonEmpty, "stableCheckpoint must register a persistent RDD")
    val level = sc.getPersistentRDDs(fresh.max).getStorageLevel
    fresh.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    level
  }

  test("stableCheckpoint auto level: deserialized below the threshold") {
    val lvl = checkpointLevel(graft.Tables.lineitem(spark, sf0001))
    assert(lvl.deserialized && lvl.useMemory && lvl.useDisk,
      s"expected MEMORY_AND_DISK below threshold, got $lvl")
  }

  test("stableCheckpoint auto level: serialized past the threshold") {
    val lvl = withConf(Autoscale.ThresholdFlag -> "1") {
      checkpointLevel(graft.Tables.lineitem(spark, sf0001))
    }
    assert(!lvl.deserialized && lvl.useMemory && lvl.useDisk,
      s"expected MEMORY_AND_DISK_SER past threshold, got $lvl")
  }

  test("explicit level conf beats the auto decision") {
    val lvl = withConf(Autoscale.ThresholdFlag -> "1",
      graft.Checkpoints.LevelFlag -> "MEMORY_AND_DISK") {
      checkpointLevel(graft.Tables.lineitem(spark, sf0001))
    }
    assert(lvl.deserialized, s"explicit level must win over auto, got $lvl")
  }

  test("each lever choice records a structured decision row (r17)") {
    Autoscale.clearDecisions()
    // lever 1: bucketedIterations (auto, below threshold → eager)
    GraphMore.kcoreParts(spark, sf0001)
    val iter = Autoscale.decisions.filter(_.lever == "bucketedIterations")
    assert(iter.nonEmpty, "iterationsEnabled must record a decision")
    assert(iter.forall(d => d.mode == "auto" && d.chosen == "eager" &&
      d.leafBytes > 0 && d.thresholdBytes == Autoscale.DefaultThresholdBytes))
    assert(iter.exists(_.op == "GraphMore.kcoreParts"),
      s"decision op should name the operator, got ${iter.map(_.op)}")
    // lever 2: localCheckpointLevel (auto, below threshold → deserialized)
    Autoscale.clearDecisions()
    graft.Tables.lineitem(spark, sf0001).stableCheckpoint()
    val lvl = Autoscale.decisions.filter(_.lever == "localCheckpointLevel")
    assert(lvl.exists(d => d.mode == "auto" &&
      d.chosen == StorageLevel.MEMORY_AND_DISK.description))
    // forced mode is recorded as forced
    Autoscale.clearDecisions()
    withConf(Bucketing.IterationsFlag -> "false") {
      GraphMore.kcoreParts(spark, sf0001)
    }
    assert(Autoscale.decisions
      .filter(_.lever == "bucketedIterations").forall(_.mode == "forced"))
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    Autoscale.clearDecisions()
  }

  test("threshold conf rejects non-numeric values with the conf key (r17)") {
    val e = intercept[IllegalArgumentException] {
      withConf(Autoscale.ThresholdFlag -> "8g") {
        Autoscale.thresholdBytes(spark)
      }
    }
    assert(e.getMessage.contains(Autoscale.ThresholdFlag) &&
      e.getMessage.contains("8g"),
      s"error must name the conf key and the bad value, got: ${e.getMessage}")
  }

  test("leafScanBytes excludes graft_scratch_ tables (r17)") {
    // a plan rooting in the depth mode's own scratch is the loop's
    // node-scale state — counting the table's edge-scale file mass would
    // flip in-loop checkpoints to SER past the threshold (r16 advice)
    Bucketing.writeBucketed(
      graft.Tables.lineitem(spark, sf0001).select("l_orderkey", "l_partkey"),
      "graft_scratch_leafspec", "l_orderkey", 2)
    try {
      val scan = spark.table("graft_scratch_leafspec")
      assert(Autoscale.leafScanBytes(scan) == 0,
        "scratch-table leaves must not count toward the depth signal")
      // ... while a real file leaf in the same plan still counts
      val mixed = scan.join(graft.Tables.lineitem(spark, sf0001)
        .select(org.apache.spark.sql.functions.col("l_orderkey")), "l_orderkey")
      assert(Autoscale.leafScanBytes(mixed) > 0)
    } finally spark.sql("DROP TABLE IF EXISTS default.graft_scratch_leafspec")
  }

  test("leafScanBytes reads file mass and ignores checkpointed lineage") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val bytes = Autoscale.leafScanBytes(li)
    assert(bytes > 0 && bytes < Autoscale.DefaultThresholdBytes,
      s"sf0.001 lineitem scan should be small and positive, got $bytes")
    // post-checkpoint lineage roots in a LogicalRDD — excluded, mass 0
    val cp = li.stableCheckpoint()
    assert(Autoscale.leafScanBytes(cp.groupBy("l_returnflag").count()) == 0)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
