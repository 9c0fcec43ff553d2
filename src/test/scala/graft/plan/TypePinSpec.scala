package graft.plan

import graft.SparkSpec
import graft.mtail.{Frontend, LogLines, MiniVm, Snapshot, TypeInfer}
import graft.mtail.Snapshot.{VFloat, VInt, VStr}

/** Directed pins for round 18's order-sensitive metric typing — the
  * reference checker pins a metric's type variable at its FIRST typed
  * use and later writes coerce at RUNTIME through the store opcodes'
  * Pop* arms (checker.go:344-674, vm.go:128-186), they do NOT promote
  * the type. Found by the biased approximation hunt (seed 60002): the
  * old "any String write promotes" fixpoint exported a String where
  * the reference keeps an Int and S2i-coerces the later site.
  *
  * Every case asserts the ENGINE value, the MiniVm value, and their
  * agreement — both consume [[TypeInfer]], so agreement alone would
  * not prove reference fidelity; the expected literals are derived
  * from the cited reference code.
  */
class TypePinSpec extends SparkSpec {
  import spark.implicits._

  private def run(src: String, lines: Seq[String])
      : (Map[(String, Map[String, String]), Snapshot.Value],
        Map[(String, Map[String, String]), Snapshot.Value]) = {
    val prog = Frontend.parse(src, "typepin.mtail")
    val pb = new PlanBuilder(prog,
      LogLines.fromLines(lines.toDF("line"), "line"), 2020)
    def norm(cells: Seq[Snapshot.Cell]) =
      cells.map(c => (c.name, c.labels) -> c.value).toMap
    (norm(Snapshot.collect(pb.snapshot())),
      norm(MiniVm.run(prog, lines)))
  }

  test("int-pinned counter with a later string site: S2i runtime " +
      "coercion, abort on non-numeric — NOT a String promotion") {
    val src =
      """counter c0
        |hidden gauge hids
        |/^w (?P<s>[a-z0-9]+)$/ {
        |  c0 += 1
        |  c0 += hids
        |  hids = $s
        |}
        |""".stripMargin
    // line 1: hids="" → PopInt("") fails → abort AFTER c0 += 1 landed
    // line 2: hids="7" (set on line 1? no — aborted). Walk: line 1
    //   c0+=1 (c0=1), c0+=int("")→abort, hids never set.
    // line 2 "w 7": c0+=1 (2), c0+="" abort again.
    // So c0=2, hids="" — the abort is absorbing here; the VALUE TYPE
    // is the point: c0 exports VInt, not VStr.
    val (eng, vm) = run(src, Seq("w 7", "w alpha"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(eng(("c0", Map.empty)) == VInt(2))
  }

  test("int-pinned counter adds parseable string deltas (seed-60002 " +
      "family: VInt(42), not VStr)") {
    val src =
      """counter c0
        |hidden gauge hids
        |/^set (?P<s>[a-z0-9]+)$/ { hids = $s }
        |/^add$/ { c0 += int(hids)
        |c0 += hids }
        |""".stripMargin
    // hids pins String ($s CapString); c0 pins Int (int(hids) first).
    // set 7 → hids="7"; add → c0 += 7 += 7 = 14; set alpha → "alpha";
    // add → int("alpha") aborts before any write.
    val (eng, vm) = run(src, Seq("set 7", "add", "set alpha", "add"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(eng(("c0", Map.empty)) == VInt(14))
  }

  test("string-pinned gauge: first write is a word; += then CONCATS " +
      "(Cat), never sums") {
    val src =
      """gauge g by k
        |/^v (?P<s>[a-z]+) (?P<x>\d+)$/ {
        |  g[$s] = $s
        |  g[$s] += $x
        |}
        |""".stripMargin
    // g's value pins String ($s first); ADD_ASSIGN@String = Cat:
    // "alpha" + "3" = "alpha3"; next line re-sets then concats again
    val (eng, vm) = run(src, Seq("v alpha 3", "v alpha 4"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(eng(("g", Map("k" -> "alpha"))) == VStr("alpha4"))
  }

  test("a comparison pins an unpinned metric to Int: a later word " +
      "set aborts at Iset instead of going lexicographic") {
    val src =
      """counter c0
        |hidden gauge hids
        |/^t (?P<s>[a-z0-9]+)$/ {
        |  hids < 5 { c0++ }
        |  hids = $s
        |}
        |""".stripMargin
    // `hids < 5` walks first → pins hids:=Int (checker.go:461-489).
    // line "t 3": hids=0 < 5 → c0=1; Iset ParseInt("3") → hids=3.
    // line "t zz": 3 < 5 → c0=2; Iset ParseInt("zz") aborts.
    // line "t 9": 3 < 5 → c0=3; hids=9.
    // line "t 1": 9 < 5 false; hids=1.
    val (eng, vm) = run(src, Seq("t 3", "t zz", "t 9", "t 1"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(eng(("c0", Map.empty)) == VInt(3))
  }

  test("float delta into an Int-pinned metric aborts the line " +
      "(PopInt has no float64 arm) — prior same-line writes persist") {
    val src =
      """counter c0
        |gauge g0
        |/^n (?P<x>\d+)$/ {
        |  g0 = $x
        |  c0++
        |  g0 = $x / 2.0
        |}
        |""".stripMargin
    // g0 pins Int ($x first). The float set aborts AFTER c0++ landed;
    // g0 keeps the line's integer set.
    val (eng, vm) = run(src, Seq("n 4", "n 5"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(eng(("c0", Map.empty)) == VInt(2))
    assert(eng(("g0", Map.empty)) == VInt(5))
  }

  test("++ on a Float-pinned metric is a compile error (expecting an " +
      "Int, checker.go:590-632); ++-first then float += is legal") {
    val bad =
      """gauge g0
        |/(?P<x>\d+)/ { g0 = $x / 2.0
        |g0++ }
        |""".stripMargin
    intercept[IllegalArgumentException] {
      Frontend.parse(bad, "bad.mtail")
    }
    // opposite order: ++ pins Int; the float += aborts at runtime
    // but COMPILES (LUB(Int,Float)=Float unifies fine)
    val ok =
      """gauge g0
        |/(?P<x>\d+)/ { g0++
        |g0 += $x / 2.0 }
        |""".stripMargin
    Frontend.parse(ok, "ok.mtail")
  }

  test("scalar String-pinned counter cannot zero-init: compile error " +
      "(codegen.go:109-126)") {
    val bad =
      """counter c0
        |/(?P<s>[a-z]+)/ { c0 = $s
        |c0 += $s }
        |""".stripMargin
    intercept[IllegalArgumentException] {
      Frontend.parse(bad, "badcounter.mtail")
    }
  }

  test("len()/strtol() pin an unpinned metric to String " +
      "(types.go Builtins)") {
    val prog = Frontend.parse(
      """gauge g0
        |hidden gauge hids
        |/(?P<x>\d+)/ {
        |  g0 = len(hids)
        |  hids = string($x)
        |}
        |""".stripMargin, "lenpin.mtail")
    assert(TypeInfer.infer(prog)("hids") == 'S')
    assert(TypeInfer.infer(prog)("g0") == 'I')
  }

  test("concat of a float delta renders PopString 'G' UPPERCASE " +
      "(Cat has no checker conversion, vm.go:171-186)") {
    val src =
      """text t0
        |/^f (?P<x>\d+)$/ {
        |  t0 += float($x) * 100000000000000000000000.0
        |}
        |""".stripMargin
    val (eng, vm) = run(src, Seq("f 3"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    // 3 × 1e23 isn't an exact double — pin the rendering property
    // (UPPERCASE exponent, no lowercase anywhere), not the mantissa
    val VStr(s) = eng(("t0", Map.empty)): @unchecked
    assert(s.endsWith("E+23") && !s.contains("e"), s)
  }

  test("int() and bitwise string operands are strict ParseInt: a " +
      "decimal rendering aborts the line, never truncates (vm.go:" +
      "128-147, 908-931)") {
    val src =
      """counter c0
        |counter after_site
        |/^d (?P<x>\d+)$/ {
        |  c0++
        |  c0 += int(string($x / 2.0))
        |  after_site++
        |}
        |/^b (?P<s>[a-z]+)$/ {
        |  c0++
        |  c0 += ($s & 7)
        |  after_site++
        |}
        |""".stripMargin
    // "d 4": 4/2.0 renders "2" → int ok → c0 += 1+2, after_site=1
    // "d 3": renders "1.5" → ParseInt FAILS → line aborts after c0++
    //        (Spark's bare cast would have truncated to 1)
    // "b ab": "ab" & 7 → ParseInt fails → abort after c0++
    val (eng, vm) = run(src, Seq("d 4", "d 3", "b ab"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(eng(("c0", Map.empty)) == VInt(5)) // 1+2 (d4) +1 (d3) +1 (b)
    assert(eng(("after_site", Map.empty)) == VInt(1))
  }

  test("never-written scalar counter pinned Float zero-inits 0.0 " +
      "(codegen.go:117-121)") {
    val src =
      """counter c0
        |counter fired
        |/^nomatch$/ { c0 += 0.5 }
        |/./ { fired++ }
        |""".stripMargin
    val (eng, vm) = run(src, Seq("x"))
    assert(eng == vm, s"engine $eng vs vm $vm")
    assert(eng(("c0", Map.empty)) == VFloat(0.0))
  }
}
