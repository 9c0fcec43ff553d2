package graft.mtail

import org.scalatest.funsuite.AnyFunSuite

import graft.mtail.Ir._

/** `graft fmt` ([[Fmt]]) — the mfmt analogue (cmd/mfmt/main.go:1-59).
  * Contract: formatting is reparse-EXACT (the formatted text parses
  * back to the identical IR, modulo the synthetic CondAlways wrapper
  * that has no surface syntax) and idempotent (format∘parse is a
  * fixpoint after one application), over the full reference example
  * corpus and the fuzz pool.
  */
class FmtSpec extends AnyFunSuite {

  private val ref = "/root/reference"

  /** CondAlways is decorator-splice plumbing with no surface syntax;
    * the formatter inlines its body, so IR comparison flattens it on
    * both sides.
    */
  private def flatten(ss: Seq[Stmt]): Seq[Stmt] = ss.flatMap {
    case CondBlock(CondAlways, b, _) => flatten(b)
    case CondBlock(c, b, e) => Seq(CondBlock(c, flatten(b), flatten(e)))
    case s => Seq(s)
  }
  private def norm(p: Program): (Seq[MetricDecl], Seq[Stmt]) =
    (p.decls, flatten(p.stmts))

  private def examples: Seq[java.io.File] =
    new java.io.File(s"$ref/examples").listFiles()
      .filter(_.getName.endsWith(".mtail")).sortBy(_.getName).toSeq

  test("every reference example formats reparse-exact and idempotent") {
    examples.foreach { f =>
      val src = scala.io.Source.fromFile(f).mkString
      val p1 = Frontend.parse(src, f.getName)
      val out1 = Fmt.format(p1)
      val p2 = Frontend.parse(out1, f.getName)
      assert(norm(p2) == norm(p1), s"${f.getName} reparse changed the IR")
      val out2 = Fmt.format(p2)
      assert(out2 == out1, s"${f.getName} not idempotent")
    }
  }

  test("fuzz-pool programs format reparse-exact and idempotent") {
    (1 to 60).foreach { i =>
      val rnd = new scala.util.Random(160817L + i)
      val src = graft.streaming.FuzzPool.genProgram(rnd)
      val p1 =
        try Frontend.parse(src, "fmt.fuzz")
        catch { case _: IllegalArgumentException => null } // rejected
      if (p1 != null) {
        val out1 = Fmt.format(p1)
        val p2 = Frontend.parse(out1, "fmt.fuzz")
        assert(norm(p2) == norm(p1), s"seed $i:\n$src\n---\n$out1")
        assert(Fmt.format(p2) == out1, s"seed $i not idempotent")
      }
    }
  }

  test("declaration attributes survive formatting (the reference " +
      "unparser drops hidden/as, unparser.go:174-200)") {
    val src =
      """hidden counter c by a, b as "exported_c" limit 5
        |histogram h buckets 0.5, 4, 16 by u
        |/x/ {
        |  c[$0]["k"]++
        |  h["z"] = 1
        |}
        |""".stripMargin
    val out = Fmt.formatSource(src, "attrs")
    assert(out.contains("hidden counter c by a, b as \"exported_c\" " +
      "limit 5"), out)
    assert(out.contains("histogram h by u buckets 0.5, 4, 16"), out)
    val p2 = Frontend.parse(out, "attrs")
    assert(p2.decl("c").hidden && p2.decl("c").exportAs ==
      Some("exported_c") && p2.decl("c").limit == 5)
    assert(p2.decl("h").buckets == Seq(0.5, 4.0, 16.0))
  }

  test("precedence-required parentheses are emitted (the reference " +
      "unparser emits none and silently reassociates)") {
    val src =
      """gauge g
        |/(?P<x>\d+)/ {
        |  g = $x * ($x + 1)
        |  g = $x - ($x - 1)
        |}
        |""".stripMargin
    val p1 = Frontend.parse(src, "parens")
    val out = Fmt.format(p1)
    assert(out.contains("$x * ($x + 1)"), out)
    assert(out.contains("$x - ($x - 1)"), out)
    assert(norm(Frontend.parse(out, "parens")) == norm(p1))
  }

  test("POW is a mul_op (parser.y:379): left-assoc, same tier as *, " +
      "and fmt round-trips pow chains reparse-exact") {
    val src =
      """gauge g
        |/(?P<x>\d+)/ {
        |  g = ($x ** 2) ** 3
        |  g = $x ** ($x ** 3)
        |  g = $x * $x ** 2
        |}
        |""".stripMargin
    val p1 = Frontend.parse(src, "pow")
    // left-assoc: `($x ** 2) ** 3` is the natural nesting — no parens
    val out = Fmt.format(p1)
    assert(out.contains("g = $x ** 2 ** 3"), out)
    // right-nesting needs parens to survive
    assert(out.contains("$x ** ($x ** 3)"), out)
    // same tier as *: a pow right child of * must keep its parens off
    // (left-assoc chain `$x * $x ** 2` ≡ `($x * $x) ** 2`)
    assert(out.contains("g = $x * $x ** 2"), out)
    assert(norm(Frontend.parse(out, "pow")) == norm(p1))
    // and the shapes really differ
    val body = p1.stmts.head.asInstanceOf[CondBlock].body
    assert(body(0).asInstanceOf[SetStmt].value ==
      Binop("**", Binop("**", Capref("x"), IntLit(2)), IntLit(3)))
    assert(body(2).asInstanceOf[SetStmt].value ==
      Binop("**", Binop("*", Capref("x"), Capref("x")), IntLit(2)))
  }

  test("del after prints canonical seconds and round-trips") {
    val src =
      """counter c by a
        |/(?P<s>\w+)/ {
        |  del c[$s] after 1h
        |}
        |""".stripMargin
    val out = Fmt.formatSource(src, "delafter")
    assert(out.contains("del c[$s] after 3600s"), out)
    assert(Fmt.formatSource(out, "delafter") == out)
  }

  test("graft fmt CLI: stdout mode, -write mode, and error exits") {
    val dir = java.nio.file.Files.createTempDirectory("fmtcli")
    val f = dir.resolve("p.mtail")
    val ugly = "counter   c\n/x/ {  c++\n}\n"
    java.nio.file.Files.write(f,
      ugly.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder
    assert(graft.Main.fmtRun(Seq("-prog", f.toString), sb.append(_)) == 0)
    assert(sb.toString == "counter c\n\n/x/ {\n  c++\n}\n", sb.toString)
    // -write rewrites in place
    assert(graft.Main.fmtRun(Seq("-write", f.toString)) == 0)
    val rewritten = new String(java.nio.file.Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(rewritten == sb.toString)
    // a parse failure exits 1; missing operand exits 2
    val bad = dir.resolve("bad.mtail")
    java.nio.file.Files.write(bad, "counter c\n/x/ { undeclared++ }\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(graft.Main.fmtRun(Seq(bad.toString), _ => ()) == 1)
    assert(graft.Main.fmtRun(Seq("-write"), _ => ()) == 2)
  }
}
