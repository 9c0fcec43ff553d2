package graft.mtail

import scala.collection.mutable

import Ir._

/** Semantic checks over the parsed IR — the port of the reference's
  * checker pass (`internal/runtime/compiler/checker/checker.go`,
  * behaviors pinned by `checker_test.go`'s invalid-program corpus):
  *
  *  - undeclared / duplicate / unused metric declarations;
  *  - capture-group references must be bound by a regex visible in
  *    scope (named and positional);
  *  - index arity: keys supplied vs `by` dimensions declared, and
  *    "index taken on unindexable expression" for keyless metrics;
  *  - `del` requires at least one key (checker.go:865-874 — the VM has
  *    no keyless delete);
  *  - `buckets` only on histograms; `++`/`--` only on numeric kinds;
  *  - builtin arity and definite argument-type mismatches, including
  *    the compile-time strptime layout self-parse (checker.go:801-825)
  *    and the reference's missing Float→Int conversion (`int($f)` is a
  *    compile error, codegen.go:585-611);
  *  - `strptime`/`settime` type to None: using their result in any
  *    expression is a type error;
  *  - a bare Int/Float/String condition is rejected ("Can't interpret
  *    Int as a boolean expression here");
  *  - `next` may only appear inside a decorator definition.
  *
  * Typing is deliberately conservative: only DEFINITE mismatches error
  * (an untyped capref or metric read passes everywhere), so every
  * program the reference accepts stays accepted while the corpus's
  * invalid programs are all rejected at compile time instead of
  * surfacing as plan-time crashes or silently mislabeled metrics.
  */
object Checker {

  def check(prog: Program): Unit = new Checker(prog).run()

  /** Go-checker type names, used in error messages. */
  private[mtail] sealed abstract class T(val goName: String)
  private[mtail] case object TInt extends T("Int")
  private[mtail] case object TFloat extends T("Float")
  private[mtail] case object TStr extends T("String")
  private[mtail] case object TBool extends T("Bool")
  private[mtail] case object TPattern extends T("Pattern")
  private[mtail] case object TNone extends T("None")
  private[mtail] case object TUnknown extends T("?")

  /** builtin → arity (parser already restricts the name set). */
  private val arities = Map(
    "strptime" -> 2, "settime" -> 1, "timestamp" -> 0, "len" -> 1,
    "tolower" -> 1, "subst" -> 3, "strtol" -> 2, "getfilename" -> 0,
    "int" -> 1, "float" -> 1, "string" -> 1, "bool" -> 1)
}

private final class Checker(prog: Program) {
  import Checker._

  private def err(m: String): Nothing =
    throw new IllegalArgumentException(s"${prog.name}: $m")

  private val decls: Map[String, MetricDecl] = {
    prog.decls.groupBy(_.name).collectFirst {
      case (n, ds) if ds.size > 1 => n
    }.foreach(n => err(s"Redeclaration of metric `$n' previously " +
      "declared"))
    prog.decls.map(d => d.name -> d).toMap
  }

  private val used = mutable.Set[String]()

  /** memoized — regex syntax errors themselves are reported by the
    * resource-limit walk, so a bad pattern just binds nothing here
    */
  private val parsedMemo = mutable.Map[String, Option[Re2.Parsed]]()
  private def parsed(re2: String): Option[Re2.Parsed] =
    parsedMemo.getOrElseUpdate(re2,
      try Some(Re2.parse(re2))
      catch { case _: IllegalArgumentException => None })

  def run(): Unit = {
    decls.values.foreach { d =>
      if (d.kind != Histogram && d.buckets.nonEmpty) err(
        s"Can't specify buckets for non-histogram metric `${d.name}'.")
    }
    walk(prog.stmts, Nil)
    prog.decls.find(d => !used(d.name)).foreach(d => err(
      s"Declaration of variable `${d.name}' here is never used."))
    // the reference's unification typing (round 18): rejects what the
    // conservative per-node checks above cannot see — `++` on a
    // Float/String-pinned metric ("expecting an Int",
    // checker.go:590-632) and LUB failures across write sites
    // (Numeric vs String, Float vs Pattern, types.go:499-544). Runs
    // LAST so its error messages never preempt the directly-pinned
    // corpus messages above.
    TypeInfer.infer(prog)
  }

  // ---------- statements ----------

  private def walk(stmts: Seq[Stmt], scope: List[Re2.Parsed]): Unit =
    stmts.foreach {
      case CondBlock(c, body, els) =>
        val inner = c match {
          case CondPattern(re2, negated) =>
            if (negated) scope else parsed(re2).toList ::: scope
          case CondExpr(e) =>
            val (t, frames) = condExpr(e, scope)
            t match {
              case TInt | TFloat | TStr => err(
                s"Can't interpret ${t.goName} as a boolean expression " +
                  "here.\n\tTry using comparison operators to make " +
                  "the condition explicit.")
              case TNone => err("can't interpret None as a boolean " +
                "expression here")
              case _ => ()
            }
            frames.reverse ::: scope
          case CondOtherwise | CondAlways => scope
        }
        walk(body, inner)
        // caprefs bound by this cond are NOT visible in else — the
        // branch runs exactly when the pattern did not match
        walk(els, scope)
      case IncStmt(m, keys, delta, addAssign) =>
        val d = metricOp(m, keys, scope)
        d.kind match {
          // `+=` compiles as `m = m + e` (codegen.go:359-363) — legal
          // concatenation on a text metric; only `++`/`--` (Inc/Dec
          // opcodes) require an Int
          case Text if !addAssign => err("type mismatch: expecting an " +
            "Int for INC, not String.")
          case Histogram => err("type mismatch: expecting an Int for " +
            "INC, not Buckets.")
          case _ => ()
        }
        noNone(typeOf(delta, scope), "INC")
      case SetStmt(m, keys, v) =>
        val d = metricOp(m, keys, scope)
        val t = typeOf(v, scope)
        if (t == TNone) err(s"Can't assign rhs of type None to `$m'")
        if (t == TPattern) err(s"Can't assign rhs of type Pattern to `$m'")
        val _ = d
      case DelStmt(m, keys, _) =>
        if (keys.isEmpty) err("Cannot delete this.\n\tTry deleting " +
          "from a dimensioned metric with this as an index.")
        val _ = metricOp(m, keys, scope)
      case ExprStmt(e) =>
        val _ = typeOf(e, scope)
      case StopStmt => ()
      case NextStmt =>
        err("Can't use `next' outside of a decorator.")
    }

  /** declared-ness + index arity + key typing; returns the decl. */
  private def metricOp(m: String, keys: Seq[Expr],
      scope: List[Re2.Parsed]): MetricDecl = {
    val d = decls.getOrElse(m, err(s"Identifier `$m' not declared.\n" +
      s"\tTry adding `counter $m' to the top of the program."))
    used += m
    val expected = d.keys.length
    if (expected == 0 && keys.nonEmpty)
      err(s"Index taken on unindexable expression `$m'")
    if (keys.length < expected)
      err(s"Not enough keys for indexed expression: expecting " +
        s"$expected, received ${keys.length}")
    if (keys.length > expected)
      err(s"Too many keys for indexed expression: expecting " +
        s"$expected, received ${keys.length}.")
    keys.foreach(k => noNone(typeOf(k, scope), "index"))
    d
  }

  private def noNone(t: T, where: String): Unit =
    if (t == TNone) err(s"type mismatch: $where cannot take a None " +
      "(strptime/settime return no value)")

  // ---------- condition expressions ----------

  /** Type a condition expression, collecting pattern frames
    * left-to-right exactly like the planner does (`&&` carries the left
    * side's bindings into the right; `||` and negations bind nothing
    * downstream but keep their own bindings for the body).
    */
  private def condExpr(e: Expr, scope: List[Re2.Parsed])
      : (T, List[Re2.Parsed]) = e match {
    case LineMatch(re2, negated) =>
      (TBool, if (negated) Nil else parsed(re2).toList)
    case Binop("=~", subj, PatternLit(re2)) =>
      noNone(typeOf(subj, scope), "match")
      (TBool, parsed(re2).toList)
    case Binop("!~", subj, PatternLit(re2)) =>
      noNone(typeOf(subj, scope), "match")
      (TBool, Nil)
    case Binop("&&", l, r) =>
      val (_, lf) = condExpr(l, scope)
      val (_, rf) = condExpr(r, lf.reverse ::: scope)
      (TBool, lf ++ rf)
    case Binop("||", l, r) =>
      val (_, lf) = condExpr(l, scope)
      val (_, rf) = condExpr(r, scope)
      (TBool, lf ++ rf)
    case other => (typeOf(other, scope), Nil)
  }

  // ---------- expressions ----------

  private def typeOf(e: Expr, scope: List[Re2.Parsed]): T = e match {
    case StrLit(_) => TStr
    case IntLit(_) => TInt
    case FloatLit(_) => TFloat
    case PatternLit(_) => TPattern
    case LineMatch(_, _) => TBool
    case Capref(n) => resolveCapref(n, scope)
    case MetricRead(m, keys) =>
      val d = metricOp(m, keys, scope)
      d.kind match {
        case Text => TStr
        case _ => TUnknown // counter/gauge/timer int-or-float
      }
    case Binop(op, l, r) => binop(op, l, r, scope)
    case Unop("!", x) =>
      noNone(typeOf(x, scope), "`!' operator"); TBool
    case Unop("~", x) =>
      typeOf(x, scope) match {
        case TNone => err("type mismatch; expected Int received None " +
          "for `~' operator.")
        case TFloat => err("type mismatch; expected Int received " +
          "Float for `~' operator.")
        case _ => TInt
      }
    case Unop("-", x) =>
      typeOf(x, scope) match {
        case TNone => err("type mismatch; expected Numeric received " +
          "None for `-' operator.")
        case t @ (TInt | TFloat) => t
        case _ => TUnknown
      }
    case Unop(op, _) => err(s"unexpected unary operator `$op'")
    case Call(fn, args) => call(fn, args, scope)
  }

  private def binop(op: String, l: Expr, r: Expr,
      scope: List[Re2.Parsed]): T = {
    lazy val lt = typeOf(l, scope)
    lazy val rt = typeOf(r, scope)
    op match {
      case "=~" | "!~" =>
        r match {
          case PatternLit(_) => noNone(lt, "match"); TBool
          case _ => err("type mismatch; expected Pattern on the right " +
            s"side of `$op'")
        }
      case "<" | "<=" | ">" | ">=" | "==" | "!=" =>
        if (lt == TNone || rt == TNone) err("type mismatch: can't " +
          s"apply $op to an operand of type \"None\".")
        TBool
      case "&&" | "||" =>
        noNone(lt, s"`$op'"); noNone(rt, s"`$op'"); TBool
      case "+" =>
        (lt, rt) match {
          case (TPattern, TPattern) => TPattern
          case (TPattern, _) | (_, TPattern) => err("Can't append " +
            "this expression to a pattern.\n\tTry using a " +
            "`const'-defined pattern fragment.")
          case (TNone, _) | (_, TNone) => err("type mismatch: can't " +
            "apply + to an operand of type \"None\".")
          case (TStr, _) | (_, TStr) => TStr
          case (TFloat, _) | (_, TFloat) => TFloat
          case (TInt, TInt) => TInt
          case _ => TUnknown
        }
      case "-" | "*" | "/" | "%" | "**" =>
        if (lt == TNone || rt == TNone) err("type mismatch: can't " +
          s"apply $op to an operand of type \"None\".")
        if (lt == TPattern || rt == TPattern) err("type mismatch: " +
          s"can't apply $op to an operand of type \"Pattern\".")
        // LUB(String, numeric) = String, and the typed-operator table
        // has no String arm outside PLUS (codegen.go:373-398) — the
        // reference fails codegen with "no opcode for type String"
        if (lt == TStr || rt == TStr)
          err(s"no opcode for type String in op `$op'")
        if (lt == TFloat || rt == TFloat) TFloat
        else if (lt == TInt && rt == TInt) TInt
        else TUnknown
      case "<<" | ">>" | "&" | "|" | "^" =>
        // bitwise ops unify their operands with Int, which Strings
        // COERCE into (types.go:470) — the VM's PopInt parses them at
        // runtime — so only None/Pattern are compile errors
        if (lt == TNone || rt == TNone) err("type mismatch: can't " +
          s"apply $op to an operand of type \"None\".")
        if (lt == TPattern || rt == TPattern) err("type mismatch: " +
          s"can't apply $op to an operand of type \"Pattern\".")
        TInt
      case "=" | "+=" | "-=" =>
        // nested assignment inside an expression — the parser only
        // routes top-level forms through exprToStmt
        err(s"Can't assign to expression on left; expecting a " +
          "variable here.")
      case other => err(s"unexpected binary operator `$other'")
    }
  }

  private def call(fn: String, args: Seq[Expr],
      scope: List[Re2.Parsed]): T = {
    arities.get(fn).foreach { want =>
      if (args.length != want) err(s"call to `$fn': type mismatch; " +
        s"expected $want argument(s), received ${args.length} " +
        "(incomplete type)")
    }
    def argT(i: Int): T = typeOf(args(i), scope)
    // the reference's Int/Float/Bool→String coercions
    // (types.go:465-474) make most String-signature arguments legal
    // with numeric operands (the VM's PopString formats them), so only
    // the checker's explicitly special-cased arguments reject:
    // tolower's first (checker.go:835-840) and strptime's second
    // (checker.go:803-808)
    def wantString(i: Int): Unit = argT(i) match {
      case TInt | TFloat | TBool | TNone => err(
        s"Expecting a String for argument ${i + 1} of $fn(), not " +
          s"${argT(i).goName}.")
      case _ => ()
    }
    fn match {
      case "strptime" =>
        noNone(argT(0), "strptime")
        args(1) match {
          case StrLit(layout) =>
            // the reference validates a literal layout by parsing a
            // cleaned copy of itself (checker.go:801-825): `_` marks
            // a may-be-two-digits field and `Z` a zulu-or-offset zone,
            // neither of which self-parses verbatim
            val timeStr = layout.replace("_", "").replace("Z", "+")
            if (GoTime.parse(layout, timeStr, 2006).isEmpty) err(
              s"""invalid time format string "$layout"""" +
                "\n\tRefer to the documentation at " +
                "https://golang.org/pkg/time/#pkg-constants for advice.")
          case other => typeOf(other, scope) match {
            case TStr | TUnknown => () // non-literal: plan-time rule
            case t => err("Expecting a format string for argument 2 " +
              s"of strptime(), not ${t.goName}.")
          }
        }
        TNone
      case "settime" =>
        noNone(argT(0), "settime"); TNone
      case "timestamp" => TInt
      case "len" => noNone(argT(0), "len"); TInt
      case "tolower" => wantString(0); TStr
      case "subst" =>
        // arg 1 is Alternate(Pattern, String) — a numeric operand has
        // no intersection with the alternate (types.go:393-398)
        argT(0) match {
          case TInt | TFloat | TBool | TNone => err("Expecting a " +
            "Pattern or String for argument 1 of subst(), not " +
            argT(0).goName + ".")
          case _ => ()
        }
        noNone(argT(1), "subst"); noNone(argT(2), "subst")
        TStr
      case "strtol" =>
        noNone(argT(0), "strtol"); noNone(argT(1), "strtol")
        TInt
      case "int" =>
        argT(0) match {
          case TFloat => err("can't convert Float to Int")
          case TNone => err("can't convert None to Int")
          case TPattern => err("can't convert Pattern to Int")
          case _ => TInt
        }
      case "float" =>
        argT(0) match {
          case TNone => err("can't convert None to Float")
          case TPattern => err("can't convert Pattern to Float")
          case _ => TFloat
        }
      case "string" =>
        argT(0) match {
          case TNone => err("can't convert None to String")
          case TPattern => err("can't convert Pattern to String")
          case _ => TStr
        }
      case "getfilename" => TStr
      case "bool" =>
        // parsed but unsupported by the reference VM (codegen.go:439:
        // "Nothing, no support in VM yet") — same stance here
        err("bool() is not supported")
      case other => err(s"unknown function $other")
    }
  }

  // ---------- caprefs ----------

  private def resolveCapref(n: String, scope: List[Re2.Parsed]): T =
    n.toIntOption match {
      case Some(0) =>
        // $0 = the whole match — bound by ANY visible regex
        // (checker.go:897-899 registers index 0 like any capref)
        scope.headOption.map(p => capTOf(p, 0))
          .getOrElse(err("Capture group `$0' was not defined by a " +
            "regular expression visible to this scope."))
      case Some(i) =>
        scope.view.flatMap(_.groups.find(_.index == i)).headOption
          .map(g => capT(scope, g))
          .getOrElse(err(s"Capture group `$$$n' was not defined by a " +
            "regular expression visible to this scope.\n\tCheck that " +
            s"there are at least $i pairs of parentheses."))
      case None =>
        scope.view.flatMap(p => p.groups.find(_.name.contains(n))
          .map(g => (p, g))).headOption
          .map { case (p, g) => capTOf(p, g.index) }
          .getOrElse(err(s"Capture group `$$$n' was not defined by a " +
            "regular expression visible to this scope.\n\tTry using " +
            s"`(?P<$n>...)' to name the capture group."))
    }

  private def capT(scope: List[Re2.Parsed], g: Re2.GroupInfo): T =
    scope.view.flatMap(p =>
      if (p.groups.contains(g)) Some(capTOf(p, g.index)) else None)
      .headOption.getOrElse(TUnknown)

  private def capTOf(p: Re2.Parsed, index: Int): T =
    Re2.inferCaprefType(p, index) match {
      case Re2.CapInt => TInt
      case Re2.CapFloat => TFloat
      case Re2.CapString => TStr
    }
}
