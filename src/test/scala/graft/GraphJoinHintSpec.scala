package graft

import graft.queries.{GraphMore, GraphQueries, StatsSixth}
import org.apache.spark.sql.DataFrame

/** r19: the graph family's SHUFFLE_HASH pins are scale-conditional
  * ([[GraphMore.joinsBig]], gated on the same Autoscale leaf-scan-mass
  * seam as the depth levers). Below the threshold the planner keeps its
  * (bounded, measured-faster) broadcasts; above it the r18 partitioned
  * hash pins apply verbatim. Results must be identical either way —
  * join hints never change semantics.
  */
class GraphJoinHintSpec extends SparkTestBase {

  private def withThreshold[A](bytes: Long)(body: => A): A = {
    spark.conf.set(Autoscale.ThresholdFlag, bytes.toString)
    try body
    finally spark.conf.unset(Autoscale.ThresholdFlag)
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("below the threshold the consumer joins carry no SHUFFLE_HASH pin") {
    // sf0.001 leaf mass is KBs vs the 2 GiB default: big=false, so the
    // static planner is free to broadcast the (understated) edge/degree
    // relations — the bench-scale shape the r18 unconditional pins cost
    for (df <- Seq(
        GraphMore.neighborDegreeFunction(spark, sf0001),
        StatsSixth.graphAssortativity(spark, sf0001),
        GraphQueries.triangleCount(spark, sf0001)))
      assert(!physical(df).contains("ShuffledHashJoin"),
        "no pinned SHJ expected below the depth threshold:\n" + physical(df))
  }

  test("above the threshold the r18 SHUFFLE_HASH pins are back") {
    // kcoreParts is exercised via the shared helper but cannot be
    // asserted here: its checkpoints truncate the visible plan (the
    // peel joins sit behind ExistingRDD roots)
    withThreshold(1L) {
      for (df <- Seq(
          GraphMore.neighborDegreeFunction(spark, sf0001),
          StatsSixth.graphAssortativity(spark, sf0001),
          GraphQueries.triangleCount(spark, sf0001),
          GraphMore.clusteringCoeffTop(spark, sf0001),
          GraphMore.richClubCoefficient(spark, sf0001)))
        assert(physical(df).contains("ShuffledHashJoin"),
          "SHJ pin expected above the depth threshold:\n" + physical(df))
    }
  }

  test("hint gating never changes results") {
    def rows(df: DataFrame): Seq[String] =
      df.collect().toSeq.map(_.toString)
    val qs: Seq[(String, () => DataFrame)] = Seq(
      "graph_assortativity" -> (() => StatsSixth.graphAssortativity(spark, sf0001)),
      "neighbor_degree_function" ->
        (() => GraphMore.neighborDegreeFunction(spark, sf0001)),
      "triangle_count" -> (() => GraphQueries.triangleCount(spark, sf0001)))
    for ((name, mk) <- qs) {
      val loose = rows(mk())
      val pinned = withThreshold(1L)(rows(mk()))
      assert(loose == pinned, s"$name results differ across the hint gate")
    }
  }
}
