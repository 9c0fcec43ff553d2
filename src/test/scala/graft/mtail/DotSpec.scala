package graft.mtail

import org.scalatest.funsuite.AnyFunSuite

/** `graft dot` ([[Dot]]) — the mdot analogue (cmd/mdot/main.go).
  * Contract: well-formed deterministic DOT for every reference
  * example — every edge references a defined node, exactly one root
  * (the StmtList), declarations/terms/expressions carry the
  * reference's color scheme, and label text is DOT-escaped.
  */
class DotSpec extends AnyFunSuite {

  private val ref = "/root/reference"

  private def parseDot(text: String)
      : (Set[Int], Seq[(Int, Int)]) = {
    val nodes = "(?m)^n(\\d+) \\[".r.findAllMatchIn(text)
      .map(_.group(1).toInt).toSet
    val edges = "(?m)^n(\\d+) -> n(\\d+)$".r.findAllMatchIn(text)
      .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    (nodes, edges)
  }

  test("every reference example renders a well-formed single-root " +
      "digraph") {
    new java.io.File(s"$ref/examples").listFiles()
      .filter(_.getName.endsWith(".mtail")).sortBy(_.getName)
      .foreach { f =>
        val p = Frontend.parse(scala.io.Source.fromFile(f).mkString,
          f.getName)
        val text = Dot.dot(p)
        assert(text.startsWith(s"""digraph "${f.getName}" {"""), text.take(80))
        assert(text.endsWith("}\n"))
        val (nodes, edges) = parseDot(text)
        assert(nodes.nonEmpty, f.getName)
        edges.foreach { case (a, b) =>
          assert(nodes(a) && nodes(b), s"${f.getName}: dangling edge n$a->n$b")
        }
        // exactly one root: every node but n1 (the StmtList) has a parent
        val children = edges.map(_._2).toSet
        assert((nodes -- children) == Set(1), s"${f.getName}: roots ${nodes -- children}")
        // deterministic
        assert(Dot.dot(p) == text)
      }
  }

  test("node classes carry the reference color scheme and labels " +
      "escape DOT metacharacters") {
    val src =
      """counter c by a
        |hidden gauge h
        |/(?P<x>\d+) "q"/ {
        |  c["lit\\with\"quote"]++
        |  h = $x + 1
        |} else {
        |  stop
        |}
        |""".stripMargin
    val text = Dot.dot(Frontend.parse(src, "dotspec"))
    assert(text.contains("VarDecl\\ncounter c by a"), text)
    assert(text.contains("lightgreen"), text)
    assert(text.contains("CaprefTerm\\n$x"), text)
    assert(text.contains("fillcolor=\"pink\""), text)
    assert(text.contains("BinaryExpr\\n+"), text)
    assert(text.contains("fillcolor=\"lightblue\""), text)
    assert(text.contains("ElseStmt"), text)
    assert(text.contains("StopStmt"), text)
    // the embedded quote/backslash in the label is escaped, so no raw
    // `"` can terminate a label early: every label attr stays balanced
    assert(text.contains("\\\"quote"), text)
  }

  test("graft dot CLI: stdout mode and error exits") {
    val dir = java.nio.file.Files.createTempDirectory("dotcli")
    val f = dir.resolve("p.mtail")
    java.nio.file.Files.write(f, "counter c\n/x/ { c++ }\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder
    assert(graft.Main.dotRun(Seq("-prog", f.toString), sb.append(_)) == 0)
    assert(sb.toString.startsWith("digraph \"p.mtail\" {"))
    assert(graft.Main.dotRun(Seq(), _ => ()) == 2)
    val bad = dir.resolve("bad.mtail")
    java.nio.file.Files.write(bad, "counter c\n/x/ { nope++ }\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(graft.Main.dotRun(Seq(bad.toString), _ => ()) == 1)
    // a non-numeric -http_port is a usage error, not silent stdout
    assert(graft.Main.dotRun(
      Seq("-http_port", "abc", f.toString), _ => ()) == 2)
  }

  test("c-- renders as UnaryExpr\\n-- with no synthetic delta child") {
    val src = "gauge c\n/x/ {\n  c--\n  c++\n}\n"
    val text = Dot.dot(Frontend.parse(src, "dec"))
    assert(text.contains("UnaryExpr\\n--"), text)
    assert(text.contains("UnaryExpr\\n++"), text)
    // the -1 delta is plumbing, not surface syntax — no IntLit -1
    assert(!text.contains("IntLit\\n-1"), text)
  }
}
