package graft.mtail

import graft.mtail.Ir._

/** AST → graphviz — the `mdot` analogue (cmd/mdot/main.go:1-206):
  * one node per IR node, parent→child edges, the reference's color
  * scheme (declarations lightgreen boxes, terms/literals pink
  * ellipses, expressions lightblue boxes, statements plain boxes).
  * The graph renders over the post-parse IR, so decorators and
  * `const` fragments appear inlined — the same canonicalization
  * `graft fmt` documents.
  */
object Dot {

  def dot(p: Program): String = {
    val sb = new StringBuilder
    sb.append("digraph \"").append(esc(p.name)).append("\" {\n")
    var id = 0
    def nextId(): Int = { id += 1; id }
    def node(label: String, shape: String, fill: Option[String],
        parent: Int): Int = {
      val i = nextId()
      sb.append(s"n$i [label=\"${esc(label)}\" shape=\"$shape\"")
      fill.foreach(c => sb.append(s" style=\"filled\" fillcolor=\"$c\""))
      sb.append("]\n")
      if (parent > 0) sb.append(s"n$parent -> n$i\n")
      i
    }
    def term(label: String, parent: Int): Unit = {
      val _ = node(label, "ellipse", Some("pink"), parent)
    }
    def exprNode(label: String, parent: Int): Int =
      node(label, "box", Some("lightblue"), parent)

    def walkExpr(e: Expr, parent: Int): Unit = e match {
      case StrLit(v) => term("StringLit\n" + v, parent)
      case IntLit(v) => term(s"IntLit\n$v", parent)
      case FloatLit(v) => term("FloatLit\n" + GoFmt.g(v), parent)
      case Capref(n) => term(s"CaprefTerm\n$$$n", parent)
      case PatternLit(re2) => term(s"PatternLit\n/$re2/", parent)
      case LineMatch(re2, neg) =>
        term("PatternExpr\n" + (if (neg) "!" else "") + s"/$re2/", parent)
      case MetricRead(m, keys) =>
        val i = exprNode("IndexedExpr", parent)
        term(s"IDTerm\n$m", i)
        keys.foreach(walkExpr(_, i))
      case Binop(op, l, r) =>
        val i = exprNode(s"BinaryExpr\n$op", parent)
        walkExpr(l, i); walkExpr(r, i)
      case Unop(op, x) =>
        val i = exprNode(s"UnaryExpr\n$op", parent)
        walkExpr(x, i)
      case Call(fn, args) =>
        val i = exprNode(s"BuiltinExpr\n$fn", parent)
        args.foreach(walkExpr(_, i))
    }

    def lvalue(m: String, keys: Seq[Expr], parent: Int): Unit = {
      val i = exprNode("IndexedExpr", parent)
      term(s"IDTerm\n$m", i)
      keys.foreach(walkExpr(_, i))
    }

    def walkStmt(s: Stmt, parent: Int): Unit = s match {
      case CondBlock(cond, body, elseBody) =>
        val i = node("CondStmt", "box", None, parent)
        cond match {
          case CondPattern(re2, neg) =>
            term("PatternLit\n" + (if (neg) "!" else "") + s"/$re2/", i)
          case CondExpr(e) => walkExpr(e, i)
          case CondOtherwise =>
            val _ = node("OtherwiseStmt", "box", None, i)
          case CondAlways =>
            val _ = node("CondAlways", "box", None, i)
        }
        body.foreach(walkStmt(_, i))
        if (elseBody.nonEmpty) {
          val e = node("ElseStmt", "box", None, i)
          elseBody.foreach(walkStmt(_, e))
        }
      case IncStmt(m, keys, delta, addAssign) =>
        // `c--` is IncStmt(delta = -1, !addAssign): label it -- and
        // suppress the synthetic delta child, mirroring Fmt
        val isDec = !addAssign && delta == IntLit(-1)
        val label =
          if (addAssign) "BinaryExpr\n+="
          else if (isDec) "UnaryExpr\n--"
          else "UnaryExpr\n++"
        val i = exprNode(label, parent)
        lvalue(m, keys, i)
        delta match {
          case IntLit(1) if !addAssign => ()
          case IntLit(-1) if !addAssign => ()
          case d => walkExpr(d, i)
        }
      case SetStmt(m, keys, value) =>
        val i = exprNode("BinaryExpr\n=", parent)
        lvalue(m, keys, i)
        walkExpr(value, i)
      case DelStmt(m, keys, after) =>
        val i = node("DelStmt" +
          after.fold("")(secs => s"\nafter ${secs}s"), "box", None,
          parent)
        lvalue(m, keys, i)
      case ExprStmt(e) => walkExpr(e, parent)
      case StopStmt => val _ = node("StopStmt", "box", None, parent)
      case NextStmt => val _ = node("NextStmt", "box", None, parent)
    }

    val root = node(s"StmtList\n${p.name}", "box", None, 0)
    p.decls.foreach { d =>
      val kind = d.kind.toString.toLowerCase(java.util.Locale.ROOT)
      val extras = (if (d.hidden) " hidden" else "") +
        (if (d.keys.nonEmpty) s" by ${d.keys.mkString(",")}" else "")
      val _ = node(s"VarDecl\n$kind ${d.name}$extras", "box",
        Some("lightgreen"), root)
    }
    p.stmts.foreach(walkStmt(_, root))
    sb.append("}\n")
    sb.toString
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    }
}
