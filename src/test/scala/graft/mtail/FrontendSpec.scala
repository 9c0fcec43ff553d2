package graft.mtail

import org.scalatest.funsuite.AnyFunSuite

class FrontendSpec extends AnyFunSuite {
  import Ir._

  test("parser terminates on arbitrary input (fuzz, fixed seed)") {
    // a daemon reloads operator-edited files: the frontend must never
    // hang or throw anything but a clean error on garbage. 500 random
    // byte strings + 500 random token soups (keywords, regexes,
    // braces, numbers) — each either parses or throws an Exception.
    val rnd = new scala.util.Random(7)
    val tokens = Seq("counter", "gauge", "hidden", "by", "as", "def",
      "next", "const", "otherwise", "else", "del", "after", "{", "}",
      "/", "$1", "$name", "==", "=~", "+", "=", "+=", "++", "(", ")",
      "[", "]", "\"s\"", "1", "2.5", "x", "/re/", "\n", "strptime",
      "len", "stop", "@d", "//", "**")
    (1 to 500).foreach { i =>
      val garbage = new String(
        Array.fill(rnd.nextInt(200))(rnd.nextPrintableChar()))
      try { Frontend.parse(garbage, s"fuzz$i"); () }
      catch { case _: Exception => () }
    }
    (1 to 500).foreach { i =>
      val soup = Seq.fill(rnd.nextInt(40))(
        tokens(rnd.nextInt(tokens.length))).mkString(" ")
      try { Frontend.parse(soup, s"soup$i"); () }
      catch { case _: Exception => () }
    }
  }

  private def parseFile(path: String): Program = {
    val src = scala.io.Source.fromFile(path).mkString
    Frontend.parse(src, new java.io.File(path).getName)
  }

  test("linecount parses") {
    val p = Frontend.parse(
      "counter lines_total\n\n/$/ {\n  lines_total++\n}\n", "linecount")
    assert(p.decls == Seq(MetricDecl(Counter, "lines_total")))
    assert(p.stmts == Seq(CondBlock(CondPattern("$"),
      Seq(IncStmt("lines_total")))))
  }

  test("all reference example programs parse") {
    // mirror of TestCompileExamplePrograms
    // (examples_integration_test.go:130-147)
    val dir = new java.io.File("/root/reference/examples")
    val files = dir.listFiles().filter(_.getName.endsWith(".mtail")).sorted
    files.foreach { f =>
      val p = parseFile(f.getPath)
      info(s"${f.getName}: ${p.decls.size} metrics, ${p.stmts.size} top stmts")
      // nocode.mtail is deliberately empty; everything else has content
      assert(p.decls.nonEmpty || p.stmts.nonEmpty ||
        f.getName == "nocode.mtail", f.getName)
    }
    assert(files.length >= 17)
  }

  test("decl forms") {
    val p = Frontend.parse(
      """counter a by x, y as "a-total" limit 7
        |hidden gauge g
        |histogram h by code buckets 0, 1, 2, 4, 8
        |timer t
        |text tx
        |/(?P<code>\d+)/ {
        |  a["1"]["2"]++
        |  g = 1
        |  h[$code] = $code
        |  t = 2
        |  tx = "z"
        |}
        |""".stripMargin, "decls")
    assert(p.decls(0) == MetricDecl(Counter, "a", Seq("x", "y"),
      Some("a-total"), false, Nil, 7))
    assert(p.decls(1).hidden && p.decls(1).kind == Gauge)
    assert(p.decls(2).buckets == Seq(0d, 1d, 2d, 4d, 8d))
    assert(p.decls(3).kind == Timer)
    assert(p.decls(4).kind == Text)
  }

  test("const folding and concat across lines") {
    val p = Frontend.parse(
      """counter c
        |const IP /\d+(\.\d+){3}/
        |const MATCH_IP /(?P<ip>/ + IP + /)/
        |// + MATCH_IP {
        |  c++
        |}
        |""".stripMargin, "consts")
    p.stmts.head match {
      case CondBlock(CondPattern(re2, _), _, _) =>
        assert(re2 == """(?P<ip>\d+(\.\d+){3})""")
      case other => fail(s"unexpected: $other")
    }
  }

  test("decorator inlining replaces next") {
    val p = Frontend.parse(
      """counter c
        |def deco {
        |  /x/ {
        |    next
        |  }
        |}
        |@deco {
        |  c++
        |}
        |""".stripMargin, "deco")
    assert(p.stmts == Seq(CondBlock(CondPattern("x"),
      Seq(IncStmt("c")))))
  }

  test("expr statements, assignment forms, del after") {
    val p = Frontend.parse(
      """hidden gauge t
        |hidden gauge sessions by client
        |counter total
        |/^(?P<n>\d+)/ {
        |  t = $n
        |  total += t
        |  settime(t)
        |  del sessions[$n] after 168h
        |  stop
        |}
        |""".stripMargin, "stmts")
    val body = p.stmts.head.asInstanceOf[CondBlock].body
    assert(body(0) == SetStmt("t", Nil, Capref("n")))
    assert(body(1) ==
      IncStmt("total", Nil, MetricRead("t", Nil), addAssign = true))
    assert(body(2) == ExprStmt(Call("settime", Seq(MetricRead("t", Nil)))))
    assert(body(3) == DelStmt("sessions", Seq(Capref("n")),
      Some(168L * 3600)))
    assert(body(4) == StopStmt)
  }

  test("constant folding: literal arithmetic folds at compile time " +
      "(opt.go:17-170)") {
    // the pattern carries a group so the non-constant `$1` case stays
    // a legal program under the checker
    def body(src: String): Seq[Stmt] =
      Frontend.parse(s"gauge g\n/(x)/ {\n$src\n}\n", "fold")
        .stmts.head.asInstanceOf[CondBlock].body
    // the reference optimiser's own table (opt_test.go:21-75)
    assert(body("g = 1 + 2") == Seq(SetStmt("g", Nil, IntLit(3))))
    assert(body("g = 2.0 * 3.0") == Seq(SetStmt("g", Nil, FloatLit(6))))
    assert(body("g = 2 ** 3.0") == Seq(SetStmt("g", Nil, FloatLit(8))))
    assert(body("g = 3.0 % 2") == Seq(SetStmt("g", Nil, FloatLit(1))))
    // nested ops fold in one pass: 2 ** 4 - 1
    assert(body("g = 2 ** 4 - 1") == Seq(SetStmt("g", Nil, IntLit(15))))
    // POW is a mul_op (parser.y:372-380): LEFT-assoc, same tier as *
    assert(body("g = 2 ** 3 ** 2") == Seq(SetStmt("g", Nil, IntLit(64))))
    assert(body("g = 2 * 3 ** 2") == Seq(SetStmt("g", Nil, IntLit(36))))
    assert(body("g = 2 ** (3 ** 2)") ==
      Seq(SetStmt("g", Nil, IntLit(512))))
    // Go truncating semantics survive the fold
    assert(body("g = (0 - 7) / 3") ==
      Seq(SetStmt("g", Nil, IntLit(-2))))
    assert(body("g = (0 - 7) % 3") ==
      Seq(SetStmt("g", Nil, IntLit(-1))))
    // a non-constant operand is left for the runtime path
    assert(body("g = $1 + 2") ==
      Seq(SetStmt("g", Nil, Binop("+", Capref("1"), IntLit(2)))))
  }

  test("constant div/mod by zero is a compile error, non-constant " +
      "is not (opt_test.go:87-131)") {
    def bad(expr: String, msg: String): Unit = {
      val e = intercept[IllegalArgumentException](Frontend.parse(
        s"gauge g\n/x/ {\n  g = $expr\n}\n", "divzero"))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    bad("4 / 0", "divide by zero")
    bad("4.0 / 0.0", "divide by zero")
    bad("4 % 0", "mod by zero")
    bad("4.0 % 0", "mod by zero")
    bad("1 + 4 / (2 - 2)", "divide by zero")
    // non-constant divisor compiles; zero at runtime aborts the line
    // (VmSemanticsSpec pins that path)
    Frontend.parse("gauge g\n/^(?P<y>\\d+)$/ {\n  g = 4 / $y\n}\n",
      "rtdiv")
  }

  test("composite conds: pattern && expr, expr match binding") {
    val p = Frontend.parse(
      """counter c
        |hidden gauge partial
        |/end;$/ && partial == 1 {
        |  c++
        |}
        |""".stripMargin, "conds")
    p.stmts.head match {
      case CondBlock(CondExpr(Binop("&&", LineMatch("end;$", false),
        Binop("==", MetricRead("partial", Nil), IntLit(1)))), _, _) =>
      case other => fail(s"unexpected: $other")
    }
  }

  test("resource guards: oversized regex and too-deep expressions " +
      "are compile errors (checker.go:66-71,883-887)") {
    // a 2000-char pattern exceeds the 1024-byte default cap
    val longRe = "/" + ("c" * 1500) + "/ { c++ }\n"
    val e1 = intercept[IllegalArgumentException] {
      Frontend.parse("counter c\n" + longRe, "guards")
    }
    assert(e1.getMessage.contains(
      "Exceeded maximum regular expression pattern length of 1024 " +
        "bytes with 1500"))
    // the cap applies to the FOLDED pattern: two under-limit const
    // fragments concatenated over the limit must still reject
    val half = "x" * 600
    val e2 = intercept[IllegalArgumentException] {
      Frontend.parse(
        s"""const A /$half/
           |const B /$half/
           |A + B {
           |}
           |""".stripMargin, "guards")
    }
    assert(e2.getMessage.contains("maximum regular expression"))
    // subst's pattern argument is guarded too (checker_test.go:288)
    val e3 = intercept[IllegalArgumentException] {
      Frontend.parse("counter c\n/(?P<x>.*)/ {\n  subst(/" +
        ("y" * 1500) + "/, \"\", $x)\n  c++\n}\n", "guards")
    }
    assert(e3.getMessage.contains("maximum regular expression"))

    // a ~300-token expression chain exceeds the depth-100 default.
    // NOTE the chain must not be constant: like the reference, the
    // optimiser folds literal arithmetic BEFORE the checker runs
    // (compiler.go:103-114), so "1 + 1 + ..." never reaches the guard
    // in either engine; anchoring on a capref keeps it unfoldable
    val deep = "counter c\n/(?P<x>\\d+)/ {\n  c += $x + " +
      Seq.fill(150)("1").mkString(" + ") + "\n}\n"
    val e4 = intercept[IllegalArgumentException] {
      Frontend.parse(deep, "guards", maxRecursionDepth = 100)
    }
    assert(e4.getMessage.contains(
      "Expression exceeded maximum recursion depth of 100"))

    // raised limits admit both; every reference example stays under
    // the defaults (the "all reference example programs parse" test
    // above already proves the guards don't over-reject)
    Frontend.parse("counter c\n" + longRe, "guards",
      maxRegexpLength = 4096)
    Frontend.parse(deep, "guards", maxRecursionDepth = 1000)
  }

  test("malformed regex is a compile error, not a plan-time failure " +
      "(checker.go:269-283)") {
    val e = intercept[IllegalArgumentException] {
      Frontend.parse("counter c\n/(unclosed/ {\n  c++\n}\n", "syn")
    }
    assert(e.getMessage.contains("regex"))
    // subst's pattern argument is syntax-checked too
    val e2 = intercept[IllegalArgumentException] {
      Frontend.parse("counter c\n/(?P<x>.*)/ {\n" +
        "  subst(/[bad/, \"\", $x)\n  c++\n}\n", "syn")
    }
    assert(e2.getMessage.contains("regex"))
  }
}
