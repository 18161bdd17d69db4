package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source lint: every lineage truncation in production query/operator
  * code must go through `Checkpoints.stableCheckpoint()` so the
  * `spark.graft.reliableCheckpoint` escape hatch covers the WHOLE
  * surface. r11 found 14 bare `.localCheckpoint()` sites (copurchase,
  * BPE trainer, embedding moments, …) that silently bypassed the flag:
  * with reliableCheckpoint=true an executor loss mid-query still killed
  * them, contradicting the documented recovery story (executor-kill
  * chaos is the observable: localCheckpoint blocks are not replayable).
  *
  * Allowed exceptions: `Checkpoints.scala` (the policy seam itself) and
  * `BenchProbe.scala` (a dev-only timing probe, never gated or run on a
  * cluster).
  */
class CheckpointPolicyLintSpec extends AnyFunSuite {

  private val root = Paths.get("src/main/scala/graft")
  private val allowed = Set("Checkpoints.scala", "BenchProbe.scala")

  test("no bare .localCheckpoint( outside the policy seam") {
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => allowed(p.getFileName.toString))
      .flatMap { p: Path =>
        Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i) if line.contains(".localCheckpoint(") &&
            !line.trim.startsWith("//") && !line.trim.startsWith("*") =>
            s"$p:${i + 1}: ${line.trim.take(80)}"
        }
      }.toSeq
    assert(offenders.isEmpty,
      "bare .localCheckpoint( bypasses the reliableCheckpoint flag — " +
        "use Checkpoints.stableCheckpoint():\n  " +
        offenders.mkString("\n  "))
  }
}
