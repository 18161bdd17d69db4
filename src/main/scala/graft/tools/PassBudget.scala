package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{lit, pmod}

import graft.Autoscale

/** Size-conditional pass-count derivation — and post-pass-0 RE-planning —
  * for the bounded-scratch K-pass depth runners ([[BoundedScratch]],
  * [[CopurchasePasses]]) — the same Autoscale pattern that made the graph
  * family's ×1000 runs conf-free in r16, applied to the last per-run knob
  * the depth recipe still carried (r16 punch item 2: pass counts as
  * invocation parameters).
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
  * 67.6 GB est / ~16.5 GiB budget → K=4 (matching r14's hand config;
  * `x1000_gram_r17.json` records passes=4 from this derivation);
  * copurchase scoring ~200 GB → K=13 (r15 ran 12 at 16.6 GB/pass);
  * copurchase model ~64 GB → M=4 (r15 ran 4, disk floor 35 GB).
  *
  * == Adaptive re-planning (r17 punch item 1) ==
  *
  * The expansion constants are measured ON THIS DATA DISTRIBUTION; on a
  * corpus with different basket fan-out or gram duplication the one-pass
  * estimate can be badly low, and a pass then overruns the disk mid-run —
  * the exact failure the runners exist to prevent. So after pass 0 the
  * runners hand its MEASURED shuffle mass to [[replan]]: if it is off the
  * per-pass estimate by more than [[TriggerRatio]]× (either direction),
  * the REMAINING residues are re-sliced to a new pass count derived from
  * the measurement, and the replan is recorded in the artifact and the
  * [[Autoscale]] decision log. Hash-range slicing makes this safe:
  *
  *   - the residue space stays fixed at the ORIGINAL K₀ (pass 0 already
  *     consumed residue 0 under it), so nothing is double- or
  *     un-processed;
  *   - fewer passes = each remaining pass takes a SET of residues
  *     (`pmod(key, K₀) IN (…)`);
  *   - more passes = each residue r is subdivided into J sub-slices via
  *     ONE finer modulus: `pmod(key, K₀·J) = r + j·K₀` for j ∈ [0, J) —
  *     for key = q·K₀ + r this selects `q mod J = j`, so the J
  *     sub-slices of r are disjoint and complete, and any key-grouped
  *     unit (a gram's h1, a customer, an item) still lands WHOLLY in
  *     exactly one pass, which is what keeps partials additive.
  *
  * A FORCED pass count never replans — the ×100 cross-check A/Bs pin
  * both sides with the env knobs precisely so the two runs are
  * slice-identical. Auto mode at the calibrated constants measures
  * within the trigger band and replans nothing, so the proven ×1000
  * derivations are reproduced unchanged.
  *
  * `SPARK_GRAFT_PASSES` / `SPARK_GRAFT_MODEL_PASSES` still force a count;
  * the derived plan is recorded in the runner's artifact either way.
  * Every derivation and every replan ALSO lands in the unified
  * [[Autoscale]] decision log (r17 punch item 4), so a depth artifact's
  * `autoscale_decisions` carries all size-conditional decisions — the
  * pass plan is no longer a separate channel.
  */
object PassBudget {

  val MinBudgetBytes: Long = 8L << 30 // 8 GiB
  val MaxBudgetBytes: Long = 24L << 30 // 24 GiB
  val HeadroomFraction = 0.30

  /** Replan when pass-0 measured mass is off the per-pass estimate by
    * more than this factor, either direction. 1.5 leaves room for
    * ordinary hash-slice variance (the residues are md5-uniform; their
    * masses agree to a few percent) while catching a genuinely wrong
    * expansion constant before pass 1 maps.
    */
  val TriggerRatio = 1.5

  final case class Plan(passes: Int, mode: String, estBytes: Long,
      budgetBytes: Long, availBytes: Long, leafBytes: Long,
      expansion: Double) {
    def json: String =
      s"""{"passes":$passes,"mode":"$mode","est_one_pass_bytes":$estBytes,""" +
        s""""per_pass_budget_bytes":$budgetBytes,""" +
        s""""scratch_avail_bytes":$availBytes,"leaf_bytes":$leafBytes,""" +
        s""""expansion":$expansion}"""
  }

  /** Per-pass scratch budget: 30% of usable, clamped to [8, 24] GiB.
    * `SPARK_GRAFT_PASS_BUDGET_BYTES` overrides (validated ≥ 1) — the
    * seam for a different disk-reservation policy and for the replan
    * proof runs, which need a small budget to exercise the subdivide
    * direction at a scale one box can cross-check.
    */
  def budgetBytes(availBytes: Long): Long =
    sys.env.get("SPARK_GRAFT_PASS_BUDGET_BYTES").map { v =>
      val b =
        try v.trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"SPARK_GRAFT_PASS_BUDGET_BYTES must be a plain byte count " +
              s"as a long; got '$v'")
        }
      require(b >= 1,
        s"SPARK_GRAFT_PASS_BUDGET_BYTES must be >= 1; got '$v'")
      b
    }.getOrElse(
      math.min(MaxBudgetBytes,
        math.max(MinBudgetBytes, (availBytes * HeadroomFraction).toLong)))

  /** Derive the pass count for an exchange estimated as
    * `expansion × leafScanBytes(input)` against `scratchDir`'s usable
    * space; `forced` (the env knob named by `knob`) wins but the plan
    * still records the signals. A forced count below 1 would make the
    * runners' pass loops silently run zero passes and emit an empty
    * artifact — fail loudly with the knob named instead (the auto path
    * already clamps to ≥1). The decision lands in the unified
    * [[Autoscale]] decision log under (`op`, `lever`) with the per-pass
    * budget playing the threshold role.
    */
  def derive(input: DataFrame, expansion: Double, scratchDir: String,
      forced: Option[Int], knob: String = "SPARK_GRAFT_PASSES",
      op: String = "unknown", lever: String = "passCount"): Plan = {
    forced.foreach(k => require(k >= 1,
      s"$knob must be >= 1 (got $k) — a non-positive pass count would " +
        "run zero passes and emit an empty-result artifact"))
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
    Autoscale.record(op, lever, leaf, budget, plan.passes.toString, plan.mode)
    println(s"[passbudget] ${plan.json}")
    plan
  }

  /** An expansion constant, overridable by `env` — the recalibration
    * seam on a new data distribution, and the injection point for the
    * replan proof runs (a deliberately wrong value must trigger a replan
    * that still cross-checks identical).
    */
  def expansion(env: String, default: Double): Double =
    sys.env.get(env).map { v =>
      val d =
        try v.trim.toDouble
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$env must be a positive number (exchange bytes per input " +
              s"byte); got '$v'")
        }
      require(d > 0 && !d.isNaN && !d.isInfinite,
        s"$env must be a positive finite number; got '$v'")
      d
    }.getOrElse(default)

  /** One pass of a (possibly re-planned) slice schedule: the set of
    * residues mod the ORIGINAL K₀ it covers — subdivided into sub-slice
    * `subIdx` of `subCount` when the replan needs MORE passes than
    * residues remain (single residue only; see [[slicePredicate]]).
    */
  final case class SlicePass(residues: Seq[Int], subIdx: Int, subCount: Int) {
    require(subCount >= 1 && (subCount == 1 || residues.size == 1),
      s"sub-sliced pass must cover exactly one residue: $this")
    def label: String =
      if (subCount == 1) s"r${residues.mkString("+")}"
      else s"r${residues.head}s$subIdx/$subCount"
  }

  /** The filter selecting exactly `pass`'s keys out of the original
    * K₀-residue space. Disjointness/completeness across a schedule is
    * by construction: residue sets partition [0, K₀) and the sub-slice
    * comparison `pmod(key, K₀·J) = r + j·K₀` partitions residue r over
    * j ∈ [0, J). Only `pmod` on the already-computed key — no division,
    * so 60-bit hash keys stay exact.
    */
  def slicePredicate(key: Column, originalK: Int, pass: SlicePass): Column =
    if (pass.subCount == 1)
      pmod(key, lit(originalK.toLong)).isin(pass.residues.map(_.toLong): _*)
    else
      pmod(key, lit(originalK.toLong * pass.subCount)) ===
        lit(pass.residues.head.toLong + pass.subIdx.toLong * originalK)

  /** The post-pass-0 schedule decision, embedded in the runner artifact
    * as `"replan"` and mirrored into the [[Autoscale]] decision log.
    */
  final case class Replan(originalPasses: Int, measuredPass0Bytes: Long,
      estPerPassBytes: Long, ratio: Double, triggered: Boolean,
      remaining: Seq[SlicePass]) {
    def subSlices: Int = remaining.map(_.subCount).maxOption.getOrElse(1)
    def json: String =
      f"""{"triggered":$triggered,"trigger_ratio":$TriggerRatio,""" +
        f""""original_passes":$originalPasses,""" +
        f""""measured_pass0_bytes":$measuredPass0Bytes,""" +
        f""""est_per_pass_bytes":$estPerPassBytes,"ratio":$ratio%.3f,""" +
        f""""remaining_passes":${remaining.size},"sub_slices":$subSlices,""" +
        f""""remaining":[${remaining.map("\"" + _.label + "\"").mkString(",")}]}"""
  }

  /** Compare pass 0's measured shuffle mass against the plan's per-pass
    * estimate; when off by more than [[TriggerRatio]]× in AUTO mode,
    * re-derive the pass count for the remaining residues from the
    * measurement (each residue's mass ≈ pass 0's — the slice key is
    * hash-uniform) and re-slice them:
    *
    *   - kNew ≤ K₀−1 → group residues round-robin into kNew passes
    *     (largest group ⌈(K₀−1)/kNew⌉ residues, so a grouped pass stays
    *     within one measured-pass mass of the budget);
    *   - kNew > K₀−1 → subdivide each residue into ⌈kNew/(K₀−1)⌉
    *     sub-slices of ≈ measured/J bytes each.
    *
    * Forced plans and in-band measurements keep the original
    * one-residue-per-pass schedule. Either way the decision is recorded
    * (lever `passReplan`, mode `replan`/`keep`) so the artifact's
    * `autoscale_decisions` shows what the measurement said.
    */
  def replan(plan: Plan, measuredPass0Bytes: Long,
      op: String = "unknown", lever: String = "passReplan"): Replan = {
    val k0 = plan.passes
    val keep = (1 until k0).map(r => SlicePass(Seq(r), 0, 1))
    val estPerPass = math.max(1L, plan.estBytes / k0)
    val ratio = measuredPass0Bytes.toDouble / estPerPass
    val offBand = ratio > TriggerRatio || ratio < 1.0 / TriggerRatio
    val result =
      if (k0 <= 1 || plan.mode == "forced" || !offBand)
        Replan(k0, measuredPass0Bytes, estPerPass, ratio,
          triggered = false, keep)
      else {
        val remainingMass = measuredPass0Bytes.toDouble * (k0 - 1)
        val kNew = math.max(1,
          math.ceil(remainingMass / plan.budgetBytes).toInt)
        val remaining =
          if (kNew <= k0 - 1)
            (0 until kNew).map(g =>
              SlicePass((1 until k0).filter(r => (r - 1) % kNew == g), 0, 1))
          else {
            val j = math.ceil(kNew.toDouble / (k0 - 1)).toInt
            for { r <- 1 until k0; s <- 0 until j }
              yield SlicePass(Seq(r), s, j)
          }
        Replan(k0, measuredPass0Bytes, estPerPass, ratio,
          triggered = true, remaining)
      }
    Autoscale.record(op, lever, BigInt(measuredPass0Bytes),
      plan.budgetBytes, result.remaining.size.toString,
      if (result.triggered) "replan" else "keep")
    println(s"[passbudget] replan: ${result.json}")
    result
  }
}
