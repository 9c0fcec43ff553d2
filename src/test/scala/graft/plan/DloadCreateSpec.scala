package graft.plan

import graft.SparkSpec
import graft.mtail.{Frontend, LogLines, MiniVm, Snapshot}
import graft.mtail.Snapshot.VInt

/** Directed pins for Dload-creation semantics (round 18): the
  * reference's Dload opcode calls Metric.GetDatum, which CREATES a
  * zero datum for ANY cell it loads (metric.go GetDatum), so
  *
  *  - reading a missing cell of an exported metric grows a
  *    zero-valued cell in the export;
  *  - a statement that aborts AFTER its lvalue's Dload (value or
  *    coercion error) still leaves the created datum;
  *  - an abort BEFORE the Dload (inside a key expression) prevents
  *    the creation;
  *  - &&/|| short-circuiting skips the unevaluated arm's Dloads
  *    (codegen.go:330-356 Jnm jumps);
  *  - `del` removes created cells like any datum; a Dload after the
  *    del recreates.
  *
  * Every case asserts engine == MiniVm == the explicit expectation
  * (both implement creation independently: the engine through
  * PlanBuilder.scanCreations gating columns, the interpreter through
  * its natural evaluation order).
  */
class DloadCreateSpec extends SparkSpec {
  import spark.implicits._

  private def run(src: String, lines: Seq[String]) = {
    val prog = Frontend.parse(src, "dload.mtail")
    val pb = new PlanBuilder(prog,
      LogLines.fromLines(lines.toDF("line"), "line"), 2020)
    def norm(cells: Seq[Snapshot.Cell]) =
      cells.map(c => (c.name, c.labels) -> c.value).toMap
    (norm(Snapshot.collect(pb.snapshot())),
      norm(MiniVm.run(prog, lines)))
  }

  test("reading a missing cell of an exported metric creates a " +
      "zero cell in the export") {
    val src =
      """counter c0
        |gauge g by k
        |/^r (?P<s>[a-z]+)$/ { c0 += g[$s] }
        |""".stripMargin
    val (eng, vm) = run(src, Seq("r alpha", "r beta"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(eng(("g", Map("k" -> "alpha"))) == VInt(0))
    assert(eng(("g", Map("k" -> "beta"))) == VInt(0))
  }

  test("a value abort AFTER the lvalue's Dload still creates the " +
      "datum (codegen walks LHS before RHS)") {
    val src =
      """gauge g by k
        |counter c0
        |/^w (?P<s>[a-z]+)$/ { g[$s] = int($s)
        |c0++ }
        |""".stripMargin
    // int("ab") aborts — after g[ab]'s Dload; c0 never increments
    val (eng, vm) = run(src, Seq("w ab"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(eng(("g", Map("k" -> "ab"))) == VInt(0))
    assert(eng(("c0", Map.empty)) == VInt(0))
  }

  test("an abort BEFORE the Dload (inside a key) prevents creation") {
    val src =
      """gauge g by k
        |counter c0
        |/^w (?P<s>[a-z]+)$/ { c0++
        |g[int($s)] = 1 }
        |""".stripMargin
    // int("ab") aborts while evaluating the KEY — no Dload, no cell;
    // the earlier c0++ already landed
    val (eng, vm) = run(src, Seq("w ab"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(!eng.keys.exists(_._1 == "g"), eng.toString)
    assert(eng(("c0", Map.empty)) == VInt(1))
  }

  test("&& short-circuit skips the right arm's Dload") {
    val src =
      """counter c0
        |gauge g by k
        |/^c (?P<s>[a-z]+) (?P<x>\d+)$/ {
        |  $x > 5 && g[$s] > 0 { c0++ }
        |}
        |""".stripMargin
    // x=3: lhs false → g[low] never loaded; x=9: loaded → created
    val (eng, vm) = run(src, Seq("c low 3", "c high 9"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(!eng.contains(("g", Map("k" -> "low"))), eng.toString)
    assert(eng(("g", Map("k" -> "high"))) == VInt(0))
  }

  test("del removes a created cell; a load after the del recreates") {
    val src =
      """counter c0
        |gauge g by k
        |/^r (?P<s>[a-z]+)$/ { c0 += g[$s] }
        |/^reset$/ { del g["alpha"]
        |del g["beta"] }
        |""".stripMargin
    // alpha: created then deleted → absent; beta: deleted then
    // re-loaded on a later line → present
    val (eng, vm) = run(src,
      Seq("r alpha", "r beta", "reset", "r beta"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(!eng.contains(("g", Map("k" -> "alpha"))), eng.toString)
    assert(eng(("g", Map("k" -> "beta"))) == VInt(0))
  }

  test("a cond expression's Dloads fire regardless of the cond's own " +
      "outcome (the jump follows the loads)") {
    val src =
      """counter c0
        |gauge g by k
        |/^c (?P<s>[a-z]+)$/ {
        |  g[$s] > 99 { c0++ }
        |}
        |""".stripMargin
    val (eng, vm) = run(src, Seq("c alpha"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(eng(("g", Map("k" -> "alpha"))) == VInt(0))
    assert(eng(("c0", Map.empty)) == VInt(0))
  }
}
