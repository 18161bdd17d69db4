package graft.tools

import org.apache.spark.sql.DataFrame

import graft.Autoscale

/** Size-conditional pass-count derivation for the bounded-scratch K-pass
  * depth runners ([[BoundedScratch]], [[CopurchasePasses]]) — the same
  * Autoscale pattern that made the graph family's ×1000 runs conf-free
  * in r16, applied to the last per-run knob the depth recipe still
  * carried (r16 punch item 2: pass counts as invocation parameters).
  *
  * The runners slice ONE big exchange into K hash-range passes so each
  * pass's shuffle scratch fits the box's disk. K is therefore a pure
  * function of two quantities both measurable before any job runs:
  *
  *   - the ONE-PASS exchange mass, estimated as `expansion ×
  *     leafScanBytes(input)` — the expansion factors are measured, not
  *     guessed (committed ×1000 artifacts; see each call site), and the
  *     leaf mass is catalog metadata ([[Autoscale.leafScanBytes]]);
  *   - the scratch filesystem's usable space, already read by both
  *     runners for telemetry.
  *
  * Per-pass budget: 30% of the usable scratch space, clamped to
  * [8 GiB, 24 GiB]. The floor keeps K from exploding on a nearly-full
  * disk (below ~27 GiB free the run is at risk regardless — better a
  * loud disk-full than 100 crawling passes); the cap keeps one pass's
  * scratch + the persistent inputs (pre-split corpus / sliced splits /
  * item model) + the previous pass's not-yet-GC-released files well
  * inside the headroom even on a big disk. At the proven ×1000 points
  * the derivation reproduces the hand-tuned configs: suffix grams
  * 67.6 GB est / ~16.5 GiB budget → K=5 (r14 ran 4 at 16.5 GB/pass);
  * copurchase scoring ~200 GB → K=13 (r15 ran 12 at 16.6 GB/pass);
  * copurchase model ~64 GB → M=4 (r15 ran 4, disk floor 35 GB).
  *
  * `SPARK_GRAFT_PASSES` / `SPARK_GRAFT_MODEL_PASSES` still force a count
  * (the ×100 cross-check A/Bs pin both sides with them); the derived
  * plan is recorded in the runner's artifact either way.
  */
object PassBudget {

  val MinBudgetBytes: Long = 8L << 30 // 8 GiB
  val MaxBudgetBytes: Long = 24L << 30 // 24 GiB
  val HeadroomFraction = 0.30

  final case class Plan(passes: Int, mode: String, estBytes: Long,
      budgetBytes: Long, availBytes: Long, leafBytes: Long,
      expansion: Double) {
    def json: String =
      s"""{"passes":$passes,"mode":"$mode","est_one_pass_bytes":$estBytes,""" +
        s""""per_pass_budget_bytes":$budgetBytes,""" +
        s""""scratch_avail_bytes":$availBytes,"leaf_bytes":$leafBytes,""" +
        s""""expansion":$expansion}"""
  }

  def budgetBytes(availBytes: Long): Long =
    math.min(MaxBudgetBytes,
      math.max(MinBudgetBytes, (availBytes * HeadroomFraction).toLong))

  /** Derive the pass count for an exchange estimated as
    * `expansion × leafScanBytes(input)` against `scratchDir`'s usable
    * space; `forced` (the env knob) wins but the plan still records the
    * signals.
    */
  def derive(input: DataFrame, expansion: Double, scratchDir: String,
      forced: Option[Int]): Plan = {
    val leaf = Autoscale.leafScanBytes(input)
    require(leaf <= BigInt(Long.MaxValue), s"leaf mass overflow: $leaf")
    val leafL = leaf.toLong
    val avail = new java.io.File(scratchDir).getUsableSpace
    val budget = budgetBytes(avail)
    val est = (leafL * expansion).toLong
    val auto = math.max(1, math.ceil(est.toDouble / budget).toInt)
    val plan = Plan(forced.getOrElse(auto),
      if (forced.isDefined) "forced" else "auto",
      est, budget, avail, leafL, expansion)
    println(s"[passbudget] ${plan.json}")
    plan
  }
}
