package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical._

/** Structural guard for the r12 double-evaluation class: range
  * partitioning (a GLOBAL Sort's exchange, or an explicit
  * `repartitionByRange`) is planned with a `RangePartitioner`, whose
  * reservoir sample EXECUTES the child RDD — re-running every plan
  * stage between the exchange and the nearest shuffle boundary. When
  * that segment is a map-only pipeline over a LEAF SCAN carrying
  * expensive per-row expressions (higher-order functions, md5/sha
  * digests, regex engines), the whole scoring pass runs TWICE — at
  * 100 TB that doubles the most expensive stage of the query
  * (README r12: `text_stats` two ≈3.3 s single-task stages;
  * `dedup_simhash`; the multimodal decode).
  *
  * Enforced fix pattern ([[graft.queries.QueryShapes.orderedBelow]]):
  * order the CHEAP input first and project once above it. Exclusions:
  *  - Sort directly under a Limit plans as TakeOrderedAndProject — a
  *    distributed partial top-k with NO range sampling;
  *  - sorts/exchanges above an Aggregate/Join/Window: the sample
  *    re-reads shuffle files and re-runs only the small post-shuffle
  *    tail;
  *  - the explicit allowlist below: sampling/filter operators whose
  *    predicate Catalyst (correctly) pushes below the range exchange —
  *    the sampled residual is that one predicate pass, and keeping the
  *    pushdown shrinks the exchange by the rejection rate, which at
  *    scale is worth more than the residual costs.
  */
class SortSampleLintSpec extends SparkTestBase {

  /** predicate-pass residuals, adjudicated (see scaladoc). */
  private val Allow: Map[String, String] = Map(
    "stratified_sample" ->
      "10% key-digest sample: the only heavy expr IS the pushed-down md5-on-key predicate (one digest/row residual)",
    "quality_filter_pipeline" ->
      "scoring predicate pushes below the exchange so it carries only survivors; output scoring projects once above (r12 reshape)")

  private def isHeavy(e: Expression): Boolean = {
    val n = e.getClass.getSimpleName
    n.contains("HigherOrderFunction") || n == "ArrayTransform" ||
    n == "ArrayFilter" || n == "ArrayAggregate" || n == "ZipWith" ||
    n == "ArrayExists" || n == "ArrayForAll" || n == "MapFilter" ||
    n == "Md5" || n == "Sha1" || n == "Sha2" || n == "Crc32" ||
    n.startsWith("RegExp") || n == "StringSplit" || n == "Levenshtein"
  }

  private def heavyIn(plan: LogicalPlan): Seq[String] =
    plan.expressions.flatMap(_.collect { case e if isHeavy(e) => e.getClass.getSimpleName })

  /** Walks the sampled segment under a range exchange: descends through
    * row-streaming nodes, returns (heavy expression names, leafRooted).
    */
  private def segment(p: LogicalPlan): (Seq[String], Boolean) = p match {
    case _: Aggregate | _: Join | _: Window | _: RepartitionOperation |
         _: Sort | _: GlobalLimit | _: Distinct | _: Deduplicate =>
      (Nil, false)
    case l: LeafNode => (Nil, true)
    case n @ (_: Project | _: Filter | _: Generate | _: SubqueryAlias |
              _: LocalLimit | _: Expand | _: DeserializeToObject |
              _: SerializeFromObject) =>
      val (below, leaf) = segment(n.children.head)
      (heavyIn(n) ++ below, leaf)
    case other if other.children.size == 1 =>
      val (below, leaf) = segment(other.children.head)
      (heavyIn(other) ++ below, leaf)
    case _ => (Nil, false) // multi-child (union etc.): conservative stop
  }

  private def isRangeRepartition(r: RepartitionByExpression): Boolean =
    r.partitionExpressions.forall(_.isInstanceOf[SortOrder]) &&
      r.partitionExpressions.nonEmpty

  test("no gate query range-samples a heavy leaf-rooted segment") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !Allow.contains(name) =>
        try {
          val plan = fn(spark, sf0001).queryExecution.optimizedPlan
          // Sorts that plan as TakeOrderedAndProject: directly under a
          // limit — collected so the Sort rule below skips them.
          val topK: Set[Sort] = plan.collect {
            case GlobalLimit(_, LocalLimit(_, s: Sort)) => s
            case GlobalLimit(_, s: Sort) => s
          }.toSet
          val fromSorts = plan.collect {
            case s: Sort if s.global && !topK.contains(s) => segment(s.child)
          }
          val fromRanges = plan.collect {
            case r: RepartitionByExpression if isRangeRepartition(r) =>
              segment(r.child)
          }
          (fromSorts ++ fromRanges).collect {
            case (heavy, true) if heavy.nonEmpty =>
              s"$name: range sample re-runs a leaf-rooted segment with " +
                heavy.distinct.mkString(", ")
          }
        } catch { case e: Throwable =>
          Seq(s"$name: plan construction failed: ${e.getMessage}")
        }
      case _ => Nil
    }
    assert(offenders.isEmpty,
      "double-evaluation class (fix: QueryShapes.orderedBelow below the " +
        "projection — see README r12):\n  " + offenders.mkString("\n  "))
  }

  test("allowlist entries stay live (no stale exemptions)") {
    Allow.keys.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"stale allowlist: $name")
    }
  }
}
