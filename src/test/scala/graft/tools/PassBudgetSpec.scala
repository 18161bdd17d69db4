package graft.tools

import graft.{Autoscale, SparkTestBase}
import org.apache.spark.sql.functions.col

/** The K-pass derivation + post-pass-0 replan seam (r17 punch items 1
  * and 4): plans and replans land in the unified Autoscale decision log,
  * a wrong expansion constant re-slices the remaining residues WITHOUT
  * double- or un-processing any key, and forced counts neither replan
  * nor accept non-positive values.
  */
class PassBudgetSpec extends SparkTestBase {

  private def mkPlan(passes: Int, mode: String, estBytes: Long,
      budgetBytes: Long): PassBudget.Plan =
    PassBudget.Plan(passes, mode, estBytes, budgetBytes,
      availBytes = budgetBytes * 3, leafBytes = 1L, expansion = 1.0)

  // ---------------------------------------------------------- derive

  test("derive records a passCount decision row (r17 punch 4)") {
    Autoscale.clearDecisions()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = PassBudget.derive(docs, expansion = 2.0,
      scratchDir = System.getProperty("java.io.tmpdir"), forced = None,
      op = "spec-runner")
    val d = Autoscale.decisions.filter(d =>
      d.op == "spec-runner" && d.lever == "passCount")
    assert(d.nonEmpty, "derive must record into the unified decision log")
    assert(d.head.chosen == plan.passes.toString && d.head.mode == "auto" &&
      d.head.leafBytes == BigInt(plan.leafBytes) &&
      d.head.thresholdBytes == plan.budgetBytes)
    Autoscale.clearDecisions()
  }

  test("a forced count is recorded as forced; <1 fails naming the knob") {
    Autoscale.clearDecisions()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = PassBudget.derive(docs, 2.0,
      System.getProperty("java.io.tmpdir"), forced = Some(3),
      knob = "SPARK_GRAFT_MODEL_PASSES", op = "spec-runner",
      lever = "modelPassCount")
    assert(plan.passes == 3 && plan.mode == "forced")
    assert(Autoscale.decisions.exists(d => d.lever == "modelPassCount" &&
      d.chosen == "3" && d.mode == "forced"))
    val e = intercept[IllegalArgumentException] {
      PassBudget.derive(docs, 2.0,
        System.getProperty("java.io.tmpdir"), forced = Some(0),
        knob = "SPARK_GRAFT_MODEL_PASSES")
    }
    assert(e.getMessage.contains("SPARK_GRAFT_MODEL_PASSES"),
      s"error must name the env knob, got: ${e.getMessage}")
    Autoscale.clearDecisions()
  }

  test("expansion override validates positivity and names the env var") {
    assert(PassBudget.expansion("GRAFT_SPEC_NO_SUCH_ENV", 7.5) == 7.5)
    // (a set-env positive path can't be tested in-JVM — sys.env is
    // immutable — but the parse/validation seam is pure given the value)
    val e = intercept[IllegalArgumentException] {
      // simulate what a bad value produces by calling the same require
      PassBudget.expansion("PATH", 1.0) // PATH is set and non-numeric
    }
    assert(e.getMessage.contains("PATH"))
  }

  // ---------------------------------------------------------- replan

  test("in-band measurement keeps the one-residue-per-pass schedule") {
    Autoscale.clearDecisions()
    val plan = mkPlan(4, "auto", estBytes = 400, budgetBytes = 100)
    val rp = PassBudget.replan(plan, measuredPass0Bytes = 120,
      op = "spec-runner")
    assert(!rp.triggered && rp.remaining ==
      Seq(1, 2, 3).map(r => PassBudget.SlicePass(Seq(r), 0, 1)))
    assert(Autoscale.decisions.exists(d => d.lever == "passReplan" &&
      d.mode == "keep" && d.chosen == "3"),
      "the keep decision must still be logged")
    Autoscale.clearDecisions()
  }

  test("forced plans never replan even when badly off") {
    val plan = mkPlan(4, "forced", estBytes = 400, budgetBytes = 100)
    val rp = PassBudget.replan(plan, measuredPass0Bytes = 5000)
    assert(!rp.triggered && rp.remaining.size == 3)
  }

  test("estimate badly HIGH -> remaining residues grouped into fewer passes") {
    val plan = mkPlan(6, "auto", estBytes = 600, budgetBytes = 100)
    // measured 20 vs est/K=100: ratio 0.2, remaining mass 100 -> 1 pass
    val rp = PassBudget.replan(plan, measuredPass0Bytes = 20)
    assert(rp.triggered && rp.remaining.size == 1 &&
      rp.remaining.head.residues.sorted == Seq(1, 2, 3, 4, 5))
  }

  test("estimate badly LOW -> residues subdivided into more passes") {
    val plan = mkPlan(4, "auto", estBytes = 400, budgetBytes = 100)
    // measured 1000 vs est/K=100: remaining mass 3000 -> kNew=30 -> J=10
    val rp = PassBudget.replan(plan, measuredPass0Bytes = 1000)
    assert(rp.triggered && rp.subSlices == 10 && rp.remaining.size == 30)
    assert(rp.remaining.forall(p => p.residues.size == 1 && p.subCount == 10))
  }

  test("K=1 plans have nothing to replan") {
    val rp = PassBudget.replan(mkPlan(1, "auto", 50, 100), 5000)
    assert(!rp.triggered && rp.remaining.isEmpty)
  }

  /** Every key must be selected by EXACTLY one pass of the schedule
    * (pass 0 = residue 0 of the original K, plus the replanned rest) —
    * the invariant that keeps the runners' partials additive.
    */
  private def assertExactCover(originalK: Int,
      remaining: Seq[PassBudget.SlicePass]): Unit = {
    val keys = spark.range(0, 3000).toDF("k")
    val schedule = PassBudget.SlicePass(Seq(0), 0, 1) +: remaining
    val counts = schedule.map(p =>
      keys.filter(PassBudget.slicePredicate(col("k"), originalK, p)).count())
    val matched = keys.filter(schedule
      .map(p => PassBudget.slicePredicate(col("k"), originalK, p))
      .reduce(_ || _)).count()
    // Σ multiplicities == #keys AND #keys-matched-at-least-once == #keys
    // together force exactly-once coverage (disjoint AND complete).
    assert(counts.sum == 3000 && matched == 3000,
      s"schedule must cover every key exactly once: $counts, union $matched")
    assert(counts.forall(_ > 0), s"no pass should be empty: $counts")
  }

  test("grouped schedule covers every key exactly once") {
    val rp = PassBudget.replan(mkPlan(6, "auto", 600, 100), 20)
    assertExactCover(6, rp.remaining)
  }

  test("subdivided schedule covers every key exactly once") {
    val rp = PassBudget.replan(mkPlan(4, "auto", 400, 100), 1000)
    assertExactCover(4, rp.remaining)
  }

  test("kept schedule covers every key exactly once") {
    val rp = PassBudget.replan(mkPlan(5, "auto", 500, 100), 100)
    assertExactCover(5, rp.remaining)
  }
}
