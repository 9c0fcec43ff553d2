package graft.mtail

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.plan.PlanBuilder

/** The reference's random-program sweep, re-expressed for this
  * frontend: `cmd/mgen/main.go` generates random valid programs and
  * `internal/runtime/fuzz.go:27-61` feeds arbitrary inputs through the
  * compiler asserting it never panics. Here a grammar-shaped generator
  * draws whole programs and pushes them through Frontend → PlanBuilder
  * (compile-only, the shape of the reference's
  * `examples_integration_test.go:130-147` compile pass). The property:
  * every program either compiles or is rejected with the typed compile
  * error (IllegalArgumentException) — never a MatchError, NPE, analysis
  * crash, or StackOverflowError.
  */
class FrontendPropSpec extends SparkSpec {

  private def probe = LogLines.fromLines(
    spark.range(0).selectExpr("CAST('' AS STRING) AS line"), "line")

  private def compile(src: String): Unit = {
    val prog = Frontend.parse(src, "prop.mtail")
    val pb = new PlanBuilder(prog, probe, 2020)
    val _ = pb // construction runs both walk passes (full lowering)
  }

  // every metric kind/dimension the statement pool references
  private val declsBlock =
    """counter c0
      |counter c1 by a
      |counter errs
      |gauge g0
      |gauge g1 by a, b
      |text t0
      |histogram h0 buckets 0.5, 2, 8
      |hidden gauge hid0
      |counter lim by k limit 3
      |""".stripMargin

  // every pattern binds x (digits → Int capref) and s (word → String)
  private val patterns = Seq(
    """(?P<x>\d+) (?P<s>\w+)""",
    """val=(?P<x>\d+) tag=(?P<s>\w+).*""",
    """^(?P<x>\d+)\s+(?P<s>[A-Za-z]+)$""",
    """(?P<s>\w+): (?P<x>\d+)(?: extra)?""")

  private val intExpr: Gen[String] = Gen.oneOf(
    "$x", "1", "17", "$x + 1", "$x * 2", "$x % 5", "$x - 3",
    "len($s)", "$x << 1", "$x & 7", "$x ^ 2", "~$x", "-$x",
    "strtol($s, 16)", "int($x)")
  private val numExpr: Gen[String] = Gen.oneOf(
    "$x", "$x + 1", "$x / 2.0", "3.5", "$x * 1.5", "timestamp()",
    "float($x)", "$x ** 2", "hid0 + $x", "g0 + 1")
  private val strExpr: Gen[String] = Gen.oneOf(
    "$s", "tolower($s)", "$s + \"!\"", "subst(\"a\", \"b\", $s)",
    "getfilename()", "string($x)")

  private val leafStmt: Gen[String] = Gen.frequency(
    3 -> Gen.const("c0++"),
    2 -> Gen.const("errs++"),
    3 -> Gen.const("c1[$s]++"),
    2 -> intExpr.map("c1[$s] += " + _),
    2 -> numExpr.map("g0 = " + _),
    2 -> numExpr.map("g1[$s][$x] = " + _),
    2 -> strExpr.map("t0 = " + _),
    2 -> numExpr.map("h0 = " + _),
    1 -> numExpr.map("hid0 = " + _),
    1 -> Gen.const("lim[$s]++"),
    1 -> Gen.const("del c1[$s]"),
    1 -> Gen.const("del c1[$s] after 72h"),
    1 -> Gen.const("stop"),
    1 -> Gen.const("strptime($x, \"2006\")"),
    1 -> Gen.const("settime($x)"))

  private def body(depth: Int): Gen[String] = for {
    n <- Gen.choose(1, 3)
    ss <- Gen.listOfN(n, stmt(depth))
  } yield ss.mkString("\n")

  /** `else` branches run when the pattern did NOT match, so its
    * caprefs are unbound there — like the reference checker, using one
    * is a compile error, which the generator must not produce.
    */
  private val capFreeBody: Gen[String] = for {
    n <- Gen.choose(1, 2)
    ss <- Gen.listOfN(n, Gen.oneOf("c0++", "errs++", "stop",
      "g0 = 1", "t0 = \"none\"", "g0 = timestamp()"))
  } yield ss.mkString("\n")

  /** block statements — a pattern always encloses capref use. */
  private def blockStmt(depth: Int): Gen[String] = Gen.frequency(
    3 -> (for { // pattern cond, optionally with else
      p <- Gen.oneOf(patterns)
      b <- body(depth - 1)
      e <- Gen.option(capFreeBody)
    } yield "/" + p + "/ {\n" + b + "\n}" +
      e.fold("")(eb => " else {\n" + eb + "\n}")),
    1 -> (for { // negated pattern: no caprefs bound inside
      p <- Gen.oneOf(patterns)
      b <- Gen.oneOf("c0++", "errs++", "stop")
    } yield "!/" + p + "/ {\n" + b + "\n}"),
    2 -> (for { // expression cond under a capref-binding pattern
      p <- Gen.oneOf(patterns)
      c <- Gen.oneOf("$x > 3", "$x == 17", "$s =~ /err/",
        "$s !~ /ok/", "$x > 1 && $x < 100", "len($s) > 2 || $x == 0")
      b <- body(depth - 1)
      o <- Gen.option(body(depth - 1))
    } yield "/" + p + "/ {\n" + c + " {\n" + b + "\n}" +
      o.fold("")(ob => "\notherwise {\n" + ob + "\n}") + "\n}"))

  private def stmt(depth: Int): Gen[String] =
    if (depth <= 0) leafStmt
    else Gen.frequency(4 -> leafStmt, 6 -> blockStmt(depth))

  /** top-level statements run outside any pattern, so bare capref
    * leaves would be compile errors by construction — use blocks or
    * capref-free leaves there.
    */
  private val topStmt: Gen[String] =
    Gen.frequency(6 -> blockStmt(2), 1 -> capFreeBody)

  private val decoratorBlock =
    """def deco {
      |  /(?P<x>\d+) (?P<s>\w+)/ {
      |    next
      |  }
      |}
      |""".stripMargin

  private val constUse =
    """const PRE /val=/
      |// + PRE + /(?P<x>\d+) tag=(?P<s>\w+)/ {
      |  c1[$s] += $x
      |}
      |""".stripMargin

  private val program: Gen[String] = for {
    n <- Gen.choose(1, 5)
    stmts <- Gen.listOfN(n, topStmt)
    useDec <- Gen.oneOf(true, false)
    useConst <- Gen.oneOf(true, false)
    decBody <- body(1)
  } yield {
    val progBody =
      (if (useConst) constUse else "") +
      (if (useDec)
        decoratorBlock + "@deco {\n" + decBody + "\n}\n"
      else "") +
      stmts.mkString("\n") + "\n"
    // declare only metrics the body references: an unused declaration
    // is a compile error (checker.go:249-266), and silently rejecting
    // most generated programs would hollow out the sweep
    val usedDecls = declsBlock.linesIterator.filter { d =>
      val name = d.split("\\s+").find(w =>
        !Set("counter", "gauge", "timer", "text", "histogram",
          "hidden").contains(w)).get
      ("\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
        .findFirstIn(progBody).isDefined
    }.mkString("", "\n", "\n")
    usedDecls + progBody
  }

  test("1k random grammar-shaped programs compile or fail typed") {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var compiled = 0
    var rejected = 0
    (1 to 1000).foreach { i =>
      val src = program.pureApply(params, seed)
      seed = seed.next
      try { compile(src); compiled += 1 }
      catch {
        // the typed compile error is a legal outcome (like the
        // reference checker rejecting a fuzzed program)…
        case e: IllegalArgumentException =>
          rejected += 1
          if (rejected <= 5) info(s"REJECTED: ${e.getMessage}\n$src")
        // …anything else is the crash this sweep exists to find
        case e: Throwable =>
          fail(s"program $i crashed the compiler with " +
            s"${e.getClass.getName}: ${e.getMessage}\n--- source:\n$src",
            e)
      }
    }
    info(s"$compiled compiled, $rejected rejected (typed)")
    // the generator stays inside the grammar, so the overwhelming
    // majority must actually compile — a sweep that mostly rejects
    // isn't exercising the planner
    assert(compiled >= 990, s"only $compiled/1000 compiled")
  }

  test("generated programs also EXECUTE: analysis and runtime clean") {
    // compile-only sweeps miss errors Spark raises at analysis or
    // runtime (round 9: string + lowered to arithmetic — an analysis
    // error — passed 1k compile-only iterations); execute a sample of
    // generated programs end-to-end over lines that hit every pattern
    val params = Gen.Parameters.default
    var seed = Seed(4242L)
    val lines = Seq("12 abc", "7 de", "val=7 tag=foo x", "bar: 3",
      "0 a", "junk !!", "999 zz")
    import spark.implicits._
    val df = LogLines.fromLines(lines.toDF("line"), "line")
    var executed = 0
    (1 to 60).foreach { i =>
      val src = program.pureApply(params, seed)
      seed = seed.next
      val compiled =
        try Some(Frontend.parse(src, "prop.mtail"))
        catch { case _: IllegalArgumentException => None }
      compiled.foreach { prog =>
        try {
          new PlanBuilder(prog, df, 2020).snapshot().collect()
          executed += 1
        } catch {
          // the typed compile error stays legal at plan/materialize
          // time (e.g. a generated cyclic self-read, rejected like the
          // reference checker would); anything else — Spark analysis
          // errors included — is the regression this sweep hunts
          case _: IllegalArgumentException => ()
          case e: Throwable => fail(
            s"program $i failed to execute with ${e.getClass.getName}: " +
              s"${e.getMessage}\n--- source:\n$src", e)
        }
      }
    }
    info(s"$executed programs executed")
    assert(executed >= 50, s"only $executed/60 executed")
  }

  test("arbitrary and mutated input never crashes the frontend") {
    // the reference's fuzz target feeds raw bytes through the compiler
    // asserting no panic (fuzz.go:27-61); same contract here — any
    // input either compiles or raises the typed compile error
    val params = Gen.Parameters.default
    var seed = Seed(7L)
    val junk = Gen.listOf(Gen.choose(0.toChar, 127.toChar))
      .map(_.mkString)
    val template = declsBlock + constUse + decoratorBlock +
      "@deco {\n  c1[$s] += $x\n}\n/val=(?P<x>\\d+) tag=(?P<s>\\w+)/ " +
      "{\n  h0 = $x\n  del c1[$s] after 72h\n}\n"
    // mutate a valid program: flip a few characters to random bytes
    val mutated = for {
      n <- Gen.choose(1, 6)
      flips <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0, template.length - 1), Gen.choose(0.toChar, 127.toChar)))
    } yield flips.foldLeft(template) { case (t, (i, c)) =>
      t.updated(i, c)
    }
    def tryCompile(src: String, i: Int): Unit =
      try { compile(src); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          val esc = src.map(c =>
            if (c >= ' ' && c <= '~') c.toString
            else "\\u%04x".format(c.toInt)).mkString
          e.printStackTrace()
          fail(s"fuzz case $i crashed with ${e.getClass.getName}: " +
            s"${e.getMessage}\n--- escaped source:\n$esc", e)
      }
    (1 to 1000).foreach { i =>
      tryCompile(junk.pureApply(params, seed), i)
      seed = seed.next
    }
    (1 to 1000).foreach { i =>
      tryCompile(mutated.pureApply(params, seed), 1000 + i)
      seed = seed.next
    }
  }

  test("100-site program plans linearly (no expression blow-up)") {
    // postfix.mtail-scale program: 100 blocks, each a pattern cond
    // with a keyed counter, a gauge write, and an expr sub-cond
    // (declare only what the blocks use — unused decls are errors)
    val sb = new StringBuilder("counter c1 by a\ngauge g1 by a, b\n")
    (0 until 100).foreach { i =>
      sb.append("/val=(?P<x>\\d+) tag=(?P<s>\\w+) n" + i + "/ {\n")
        .append("  c1[$s]++\n")
        .append("  $x > " + i + " {\n    g1[$s][$x] = $x + " + i +
          "\n  }\n")
        .append("}\n")
    }
    val t0 = System.nanoTime()
    val prog = Frontend.parse(sb.toString, "wide.mtail")
    val pb = new PlanBuilder(prog, probe, 2020)
    val exprNodes = pb.df.queryExecution.analyzed.expressions
      .map(_.collect { case e => e }.size).sum
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"$exprNodes expression nodes, $secs%.1f s")
    // 2^n guard-embedding or per-site re-inlining would overflow both
    // bounds by orders of magnitude
    assert(exprNodes < 200000, s"expression blow-up: $exprNodes nodes")
    assert(secs < 60, f"plan build took $secs%.1f s")
  }
}
