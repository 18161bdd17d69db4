package graft.storage

import graft.SparkTestBase
import graft.queries.GraphMore

/** The depth-mode bucketed-iteration paths of the k-core peel and the BFS
  * frontier loop (r14 ×1000 audit lever: per-round bucketed adjacency
  * materialization instead of localCheckpoint, so rounds see a REPORTED
  * HashPartitioning and prior-round scratch is dropped deterministically)
  * must be RESULT-IDENTICAL to the default checkpoint shape, and the
  * bucketed degree aggregate must actually run exchange-free.
  */
class BucketedIterationsSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  // the depth-mode runs necessarily leave their final scratch generation
  // behind (the returned plan scans it); sweep it so the test warehouse
  // stays clean
  override def afterAll(): Unit = {
    Bucketing.dropScratch(spark)
    super.afterAll()
  }

  private def withFlag[A](on: Boolean)(body: => A): A = {
    spark.conf.set(Bucketing.IterationsFlag, on.toString)
    try body
    finally spark.conf.unset(Bucketing.IterationsFlag)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("kcore_parts: bucketed depth mode matches the checkpoint shape") {
    val eager = withFlag(on = false)(
      rows(GraphMore.kcoreParts(spark, sf0001)))
    val bucketed = withFlag(on = true)(
      rows(GraphMore.kcoreParts(spark, sf0001)))
    assert(bucketed == eager,
      s"bucketed k-core diverged: ${bucketed.size} vs ${eager.size} rows")
    assert(eager.nonEmpty)
  }

  test("bfs_distance_histogram: bucketed depth mode matches") {
    val eager = withFlag(on = false)(
      rows(GraphMore.bfsDistanceHistogram(spark, sf0001)))
    val bucketed = withFlag(on = true)(
      rows(GraphMore.bfsDistanceHistogram(spark, sf0001)))
    assert(bucketed == eager,
      s"bucketed BFS diverged: ${bucketed.size} vs ${eager.size} rows")
    assert(eager.nonEmpty)
  }

  test("bucketed k-core final plan aggregates without an edge exchange") {
    // The returned plan is round-3's degree aggregate over the bucketed
    // adjacency scan ⋉ node-scale alive set. Exchanges are allowed on
    // the ALIVE side (node-scale build of the shuffled-hash semi-join)
    // and above the aggregate (the output sort) — but the path from the
    // bucketed edge scan UP to the first aggregate must be exchange-free
    // (that re-shuffle is exactly what the depth mode exists to delete).
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = withFlag(on = true)(GraphMore.kcoreParts(spark, sf0001))
    val fin: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
      case p => p
    }
    // AQE leaves materialized stages as QueryStageExec leaves — descend
    // through them (the wrapped exchange then shows up on the path and
    // correctly fails clearPath if it sits over the edge scan)
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    def isAdjScan(p: SparkPlan): Boolean = p match {
      case s: FileSourceScanExec =>
        s.tableIdentifier.exists(_.table.startsWith("graft_scratch_kcore_adj"))
      case _ => false
    }
    def containsScan(p: SparkPlan): Boolean =
      isAdjScan(p) || kids(p).exists(containsScan)
    // walk from `p` down the child chain that holds the scan; false if a
    // shuffle sits on that path
    def clearPath(p: SparkPlan): Boolean =
      if (isAdjScan(p)) true
      else if (p.isInstanceOf[ShuffleExchangeLike]) false
      else kids(p).find(containsScan).exists(clearPath)
    def findAgg(p: SparkPlan): Option[HashAggregateExec] = p match {
      case a: HashAggregateExec if containsScan(a) => Some(a)
      case _ => kids(p).view.flatMap(findAgg(_)).headOption
    }
    val agg = findAgg(fin)
    assert(agg.isDefined,
      s"no aggregate over the bucketed adjacency scan found:\n$fin")
    assert(agg.exists(a => kids(a).find(containsScan).exists(clearPath)),
      s"edge scan must reach the degree aggregate without an exchange:\n$fin")
    assert(fin.toString.contains("ShuffledHashJoin"),
      s"alive semi-join must be SHJ (no edge sort):\n$fin")
  }
}
