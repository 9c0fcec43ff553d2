package graft.plan

import scala.util.Random

import graft.SparkSpec
import graft.mtail.{Frontend, LogLines, MiniVm, Snapshot}
import graft.streaming.FuzzPool

/** Directed pins for the SURVIVING provisional/fallback shapes — the
  * r16 verdict's order #2 ("no code path that silently returns a
  * non-VM value, proven by spec"). These nine seeds are every program
  * in the 5801–6100 sweep whose plan construction reached the
  * one-level-unroll splice or the last-resort machinery (they include
  * 5816 and 6006, the two historically named fuzz tangles: the
  * abort-guard-tangled as-of pair and the directly self-conditioned
  * gauge). Each case asserts BOTH halves of the round-17 contract:
  *
  *  1. the plan DECLARES the approximation (`approxNotes` non-empty —
  *     if a refactor reroutes the shape through the exact machinery,
  *     this half fails and the seed should be retired, never ignored);
  *  2. the value is nevertheless VM-EXACT against the independent
  *     sequential interpreter ([[graft.mtail.MiniVm]]) — on every
  *     shape that is REACHABLE today, the unroll bottom sits in its
  *     absorbing corner and the splice is value-preserving.
  *
  * The broad net behind these pins is
  * [[graft.streaming.VmDifferentialSpec]]; seed→program mapping
  * depends on [[FuzzPool]], so pool changes that shift these seeds
  * will surface here as a failed half-1 assertion (regenerate the
  * seed list from a VmDifferentialSpec sweep's
  * "declared-but-VM-exact" summary line).
  */
class ApproxShapeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(cells: Seq[Snapshot.Cell]) =
    cells.map(c => (c.name, c.labels) ->
      ((c.kind, c.value, c.tsSec.getOrElse(0L), c.buckets))).toMap

  private val seeds =
    Seq(5816, 5824, 5872, 5993, 6006, 6012, 6048, 6080, 6081)

  seeds.foreach { seed =>
    test(s"fuzz seed $seed: approximation path declares itself and " +
        "matches the VM exactly") {
      val rnd = new Random(seed)
      val src = FuzzPool.genProgram(rnd)
      val prog = Frontend.parse(src, s"approx.$seed")
      val lines = FuzzPool.genLines(rnd)
      val pb = new PlanBuilder(prog,
        LogLines.fromLines(lines.toDF("line"), "line"), 2020)
      val engine = norm(Snapshot.collect(pb.snapshot()))
      assert(pb.approxNotes.nonEmpty,
        s"seed $seed no longer reaches a declared-approximation path " +
          "— regenerate the seed list (see scaladoc)")
      val vm = norm(MiniVm.run(prog, lines))
      assert(engine == vm,
        s"""seed $seed diverged from the VM under the declared notes:
           |${pb.approxNotes.mkString("\n")}
           |--- program:
           |$src""".stripMargin)
    }
  }
}
