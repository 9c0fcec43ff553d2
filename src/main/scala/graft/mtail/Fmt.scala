package graft.mtail

import graft.mtail.Ir._

/** Program formatter — the `graft fmt` analogue of the reference's
  * `mfmt` (cmd/mfmt/main.go:1-59, which parses, checks, and unparses
  * via parser/unparser.go). Pretty-prints an [[Ir.Program]] with the
  * unparser's surface conventions: two-space indents, one statement
  * per line, `cond {` / `} else {` / `}` block style, spaces around
  * binary operators, `/`-escaped pattern literals.
  *
  * Deliberate improvements over the reference unparser (both are
  * silent LOSSES there, not style choices):
  *  - `hidden` and `as "name"` declaration attributes are preserved
  *    (unparser.go:174-200 drops both — a formatted program would
  *    change its export surface);
  *  - parentheses are emitted wherever operator precedence requires
  *    them (the reference emits none, so `a * (b + c)` silently
  *    reassociates to `a * b + c`).
  *
  * Canonicalizations (semantics-preserving, documented):
  *  - declarations print first, in declaration order (the IR separates
  *    decls from statements);
  *  - decorators and `const` pattern fragments print INLINED — the
  *    frontend splices them before the IR exists, mirroring the
  *    reference's codegen-time inlining (codegen.go:290-311);
  *  - `del … after` durations print in canonical seconds (`3600s`);
  *  - histogram bucket bounds print shortest-form (`1, 4, 16`, not
  *    the unparser's `1.000000`).
  *
  * Contract (FmtSpec): idempotent — format(parse(format(parse(p))))
  * == format(parse(p)) — and reparse-exact: parse(format(p)) yields
  * the IDENTICAL IR (modulo the synthetic CondAlways wrapper, which
  * has no surface syntax and flattens).
  */
object Fmt {

  def format(p: Program): String = {
    val sb = new StringBuilder
    p.decls.foreach(d => sb.append(declLine(d)).append('\n'))
    if (p.decls.nonEmpty && p.stmts.nonEmpty) sb.append('\n')
    p.stmts.foreach(s => emitStmt(sb, s, 0))
    sb.toString
  }

  /** Format a source string end-to-end (parse → format). */
  def formatSource(src: String, name: String): String =
    format(Frontend.parse(src, name))

  private def declLine(d: MetricDecl): String = {
    val kind = d.kind match {
      case Counter => "counter"
      case Gauge => "gauge"
      case Timer => "timer"
      case Text => "text"
      case Histogram => "histogram"
    }
    val sb = new StringBuilder
    if (d.hidden) sb.append("hidden ")
    sb.append(kind).append(' ').append(d.name)
    if (d.keys.nonEmpty) sb.append(" by ").append(d.keys.mkString(", "))
    d.exportAs.foreach(a => sb.append(" as \"").append(escStr(a))
      .append('"'))
    if (d.limit > 0) sb.append(" limit ").append(d.limit)
    if (d.buckets.nonEmpty)
      sb.append(" buckets ").append(d.buckets.map(num).mkString(", "))
    sb.toString
  }

  private def num(x: Double): String =
    if (x == x.floor && !x.isInfinite && math.abs(x) < 1e15)
      x.toLong.toString
    else GoFmt.g(x)

  private def escStr(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    }

  private def pat(re2: String): String =
    "/" + re2.replace("/", "\\/") + "/"

  private def indent(sb: StringBuilder, level: Int): StringBuilder =
    sb.append("  " * level)

  private def emitStmt(sb: StringBuilder, s: Stmt, level: Int): Unit =
    s match {
      case CondBlock(CondAlways, body, _) =>
        // synthetic decorator-splice wrapper: no surface syntax —
        // inline the body at the current level
        body.foreach(emitStmt(sb, _, level))
      case CondBlock(cond, body, elseBody) =>
        val head = cond match {
          case CondPattern(re2, neg) => (if (neg) "!" else "") + pat(re2)
          case CondExpr(e) => expr(e, 0)
          case CondOtherwise => "otherwise"
          case CondAlways => "" // handled above
        }
        indent(sb, level).append(head).append(" {\n")
        body.foreach(emitStmt(sb, _, level + 1))
        if (elseBody.nonEmpty) {
          indent(sb, level).append("} else {\n")
          elseBody.foreach(emitStmt(sb, _, level + 1))
        }
        indent(sb, level).append("}\n")
      case IncStmt(m, keys, delta, addAssign) =>
        val lv = lvalue(m, keys)
        val line = (delta, addAssign) match {
          case (_, true) => s"$lv += ${expr(delta, 0)}"
          case (IntLit(1), false) => s"$lv++"
          case (IntLit(-1), false) => s"$lv--"
          case _ => s"$lv += ${expr(delta, 0)}"
        }
        indent(sb, level).append(line).append('\n')
      case SetStmt(m, keys, value) =>
        indent(sb, level).append(lvalue(m, keys)).append(" = ")
          .append(expr(value, 0)).append('\n')
      case DelStmt(m, keys, after) =>
        indent(sb, level).append("del ").append(lvalue(m, keys))
        after.foreach(secs => sb.append(" after ").append(secs)
          .append('s'))
        sb.append('\n')
      case ExprStmt(e) =>
        indent(sb, level).append(expr(e, 0)).append('\n')
      case StopStmt => indent(sb, level).append("stop\n")
      case NextStmt => indent(sb, level).append("next\n")
    }

  private def lvalue(m: String, keys: Seq[Expr]): String =
    if (keys.isEmpty) m
    else m + "[" + keys.map(expr(_, 0)).mkString("][") + "]"

  /** binary-operator precedence, parser.y's ladder (higher binds
    * tighter); used to emit minimal parentheses.
    */
  private def prec(op: String): Int = op match {
    case "||" => 2
    case "&&" => 3
    case "=~" | "!~" => 4
    case "==" | "!=" => 5
    case "<" | "<=" | ">" | ">=" => 6
    case "|" | "^" => 7
    case "&" => 8
    case "<<" | ">>" => 9
    case "+" | "-" => 10
    case "*" | "/" | "%" | "**" => 11 // POW is a mul_op (parser.y:379)
    case _ => 1
  }
  private val UnaryPrec = 12

  /** render `e`; wrap in parens when its precedence is below `min`. */
  private def expr(e: Expr, min: Int): String = e match {
    case StrLit(v) => "\"" + escStr(v) + "\""
    case IntLit(v) => v.toString
    case FloatLit(v) =>
      // keep a float literal a FLOAT on reparse: integral values need
      // the ".0" the shortest-form rendering drops
      if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15)
        v.toLong.toString + ".0"
      else GoFmt.g(v)
    case Capref(n) => "$" + n
    case MetricRead(m, keys) => lvalue(m, keys)
    case PatternLit(re2) => pat(re2)
    case LineMatch(re2, neg) => (if (neg) "!" else "") + pat(re2)
    case Binop(op, l, r) =>
      val p = prec(op)
      // left-associative ladder: same-precedence RIGHT child needs
      // parens (`a - (b - c)`), left child doesn't
      val s = expr(l, p) + " " + op + " " + expr(r, p + 1)
      if (p < min) "(" + s + ")" else s
    case Unop(op @ ("++" | "--"), x) => expr(x, UnaryPrec) + op
    case Unop(op, x) =>
      val s = op + expr(x, UnaryPrec)
      if (UnaryPrec < min) "(" + s + ")" else s
    case Call(fn, args) =>
      fn + "(" + args.map(expr(_, 0)).mkString(", ") + ")"
  }
}
