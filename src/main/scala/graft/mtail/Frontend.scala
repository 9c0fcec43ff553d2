package graft.mtail

import scala.collection.mutable

/** The mtail DSL frontend: lexer + recursive-descent parser producing
  * [[Ir.Program]], with decorator inlining and const-pattern folding done
  * at parse time (mirroring the reference compiler's codegen-time
  * decorator splice, `compiler/codegen/codegen.go:290-311`, and
  * compile-time pattern concatenation, `checker/checker.go:921-966`).
  *
  * Grammar per `internal/runtime/compiler/parser/parser.y` (18 keywords,
  * `lexer.go:20-39`; 12 builtins, `lexer.go:42-55`). Newlines terminate
  * statements unless the line ends mid-expression (operator, comma,
  * opening bracket) — the reference achieves the same with an
  * expression-oriented grammar.
  */
object Frontend {

  import Ir._

  // ---------------- lexer ----------------

  sealed trait Tok { def pos: Int }
  case class TId(s: String, pos: Int) extends Tok
  case class TKw(s: String, pos: Int) extends Tok
  case class TCapref(s: String, pos: Int) extends Tok
  case class TStr(s: String, pos: Int) extends Tok
  case class TInt(v: Long, pos: Int) extends Tok
  case class TFloat(v: Double, pos: Int) extends Tok
  case class TRegex(re2: String, pos: Int) extends Tok
  case class TDur(seconds: Long, pos: Int) extends Tok
  case class TPunct(s: String, pos: Int) extends Tok
  case class TNL(pos: Int) extends Tok
  case class TEOF(pos: Int) extends Tok

  private val keywords = Set("counter", "gauge", "timer", "text",
    "histogram", "hidden", "by", "as", "buckets", "limit", "def", "next",
    "const", "otherwise", "else", "del", "after", "stop")

  // NOTE no "-=", "*=", "/=": the reference lexer has only ADD_ASSIGN
  // (lexer.go:252-264; '-' followed by '=' lexes MINUS then ASSIGN and
  // the parser rejects the shape)
  private val punctuation = Seq( // longest first
    "<<", ">>", "**", "++", "--", "+=", "=~", "!~",
    "<=", ">=", "==", "!=", "&&", "||",
    "{", "}", "[", "]", "(", ")", ",", "+", "-", "*", "/", "%", "<",
    ">", "=", "!", "~", "&", "|", "^", "@", "$")

  private val durRe = """(\d+(?:\.\d+)?(?:ns|us|µs|ms|s|m|h))+""".r
  private val durPart = """(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)""".r

  def lex(src: String): Vector[Tok] = {
    val out = mutable.ArrayBuffer[Tok]()
    var i = 0
    // can the IMMEDIATELY previous token end an expression? (decides
    // '/'-as-regex vs division, and newline-as-terminator; a newline or
    // '}' before '/' always means a regex — mtail has no block exprs)
    def prevEndsExpr: Boolean = out.lastOption match {
      // `const NAME /re/` — the reference lexer is parser-directed
      // (InRegex, lexer.go:81); the one place an identifier precedes a
      // regex is a const definition
      case Some(TId(_, _))
        if out.length >= 2 &&
          out(out.length - 2).isInstanceOf[TKw] &&
          out(out.length - 2).asInstanceOf[TKw].s == "const" => false
      case Some(TId(_, _) | TCapref(_, _) | TStr(_, _) | TInt(_, _) |
        TFloat(_, _) | TRegex(_, _) | TDur(_, _)) => true
      case Some(TPunct(")" | "]" | "++" | "--", _)) => true
      case Some(TKw("stop" | "next", _)) => true
      case _ => false
    }
    while (i < src.length) {
      val c = src(i)
      if (c == '#') { while (i < src.length && src(i) != '\n') i += 1 }
      else if (c == '\n') {
        if (prevEndsExpr) out += TNL(i)
        i += 1
      } else if (c.isWhitespace) i += 1
      else if (c == '"') {
        val sb = new StringBuilder
        val start = i
        i += 1
        while (i < src.length && src(i) != '"') {
          if (src(i) == '\\' && i + 1 < src.length) {
            sb.append(src(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
            i += 2
          } else { sb.append(src(i)); i += 1 }
        }
        i += 1
        out += TStr(sb.toString, start)
      } else if (c == '/' && !prevEndsExpr) {
        // regex literal: scan to unescaped '/'
        val start = i
        i += 1
        val sb = new StringBuilder
        while (i < src.length && src(i) != '/') {
          if (src(i) == '\\' && i + 1 < src.length &&
            src(i + 1) == '/') { sb.append('/'); i += 2 }
          else if (src(i) == '\\') { sb.append(src(i)).append(src(i + 1)); i += 2 }
          else if (src(i) == '\n') throw new IllegalArgumentException(
            s"unterminated regex at $start")
          else { sb.append(src(i)); i += 1 }
        }
        i += 1
        out += TRegex(sb.toString, start)
      } else if (c.isDigit) {
        val start = i
        durRe.findPrefixOf(src.substring(i)) match {
          case Some(d) if d.exists(ch => ch.isLetter || ch == 'µ') &&
            !src.substring(i).startsWith(d + ".") =>
            var secs = 0.0
            durPart.findAllMatchIn(d).foreach { m =>
              val v = m.group(1).toDouble
              secs += (m.group(2) match {
                case "ns" => v / 1e9
                case "us" | "µs" => v / 1e6
                case "ms" => v / 1e3
                case "s" => v
                case "m" => v * 60
                case "h" => v * 3600
              })
            }
            i += d.length
            out += TDur(secs.toLong, start)
          case _ =>
            while (i < src.length && src(i).isDigit) i += 1
            var isFloat = false
            if (i < src.length && src(i) == '.' && i + 1 < src.length &&
              src(i + 1).isDigit) {
              isFloat = true
              i += 1
              while (i < src.length && src(i).isDigit) i += 1
            }
            // scientific notation: 1e2, 0.5e-3
            if (i < src.length && (src(i) == 'e' || src(i) == 'E') &&
              i + 1 < src.length &&
              (src(i + 1).isDigit || ((src(i + 1) == '+' ||
                src(i + 1) == '-') && i + 2 < src.length &&
                src(i + 2).isDigit))) {
              isFloat = true
              i += 1
              if (src(i) == '+' || src(i) == '-') i += 1
              while (i < src.length && src(i).isDigit) i += 1
            }
            if (isFloat)
              out += TFloat(src.substring(start, i).toDouble, start)
            else if (i < src.length && (src(i) == 'x' || src(i) == 'X')
              && src.substring(start, i) == "0") {
              i += 1
              while (i < src.length &&
                Character.digit(src(i), 16) >= 0) i += 1
              out += TInt(java.lang.Long.parseLong(
                src.substring(start + 2, i), 16), start)
            } else out += TInt(src.substring(start, i).toLong, start)
        }
      } else if (c == '$') {
        val start = i
        i += 1
        val nb = new StringBuilder
        while (i < src.length && (src(i).isLetterOrDigit ||
          src(i) == '_')) { nb.append(src(i)); i += 1 }
        out += TCapref(nb.toString, start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < src.length && (src(i).isLetterOrDigit ||
          src(i) == '_')) i += 1
        val word = src.substring(start, i)
        out += (if (keywords(word)) TKw(word, start) else TId(word, start))
      } else {
        punctuation.find(p => src.startsWith(p, i)) match {
          case Some(p) => out += TPunct(p, i); i += p.length
          case None => throw new IllegalArgumentException(
            s"unexpected character '$c' at $i")
        }
      }
    }
    out += TEOF(src.length)
    out.toVector
  }

  // ---------------- parser ----------------

  /** Reference compiler resource-guard defaults
    * (`cmd/mtail/main.go:69-70`). `<= 0` means "use the default", like
    * the reference checker's zero-value handling
    * (`compiler/checker/checker.go:46-52`).
    */
  val DefaultMaxRegexpLength = 1024
  val DefaultMaxRecursionDepth = 100

  def parse(src: String, name: String,
      maxRegexpLength: Int = DefaultMaxRegexpLength,
      maxRecursionDepth: Int = DefaultMaxRecursionDepth): Program = {
    // fold first (the reference optimises before checking,
    // compiler.go:103-114 — constant chains never reach the depth
    // guard), then resource guards, then the semantic checker
    val prog = constFold(new Parser(lex(src), name).parseProgram())
    checkResourceLimits(prog,
      if (maxRegexpLength <= 0) DefaultMaxRegexpLength
      else maxRegexpLength,
      if (maxRecursionDepth <= 0) DefaultMaxRecursionDepth
      else maxRecursionDepth)
    Checker.check(prog)
    prog
  }

  /** Compiler resource guards — the checker's pattern-length and
    * walk-depth budgets (`compiler/checker/checker.go:66-71,883-887`).
    * Run on the folded IR: `const` fragments are already inlined, so
    * the measured pattern is the one the engine actually compiles
    * (the reference too checks the concatenated pattern). A
    * pathological program must be a compile error, not a planner DoS.
    */
  private def checkResourceLimits(prog: Program, maxRe: Int,
      maxDepth: Int): Unit = {
    def err(m: String): Nothing =
      throw new IllegalArgumentException(s"${prog.name}: $m")
    def checkRe(p: String): Unit = {
      val plen = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .length
      if (plen > maxRe) err(
        s"Exceeded maximum regular expression pattern length of " +
          s"$maxRe bytes with $plen.\n\tExcessively long patterns " +
          "are likely to cause compilation and runtime performance " +
          "problems.")
      // syntax check at compile time, like the reference checker's
      // regexp.Compile walk (checker.go:269-283): a malformed pattern
      // must be a compile error, not a plan-time failure deep in the
      // engine (or worse, a silent never-matching condition)
      try Re2.parse(p)
      catch { case e: IllegalArgumentException => err(e.getMessage) }
    }
    // depth mirrors the reference's checker-walk counter: every IR
    // node (stmt, cond, expr) adds one level
    def dExpr(e: Expr): Int = 1 + (e match {
      case Binop(_, l, r) => math.max(dExpr(l), dExpr(r))
      case Unop(_, x) => dExpr(x)
      case Call(_, args) => (0 +: args.map(dExpr)).max
      case MetricRead(_, ks) => (0 +: ks.map(dExpr)).max
      case PatternLit(re) => checkRe(re); 0
      case LineMatch(re, _) => checkRe(re); 0
      case _ => 0
    })
    def dStmt(s: Stmt): Int = 1 + (s match {
      case CondBlock(cond, body, elseBody) =>
        val dc = cond match {
          case CondPattern(re, _) => checkRe(re); 1
          case CondExpr(e) => 1 + dExpr(e)
          case CondOtherwise | CondAlways => 1
        }
        // body stmts count via dStmt's own `1 +` wrapper — no extra
        // level here, so the metric stays one-level-per-IR-node like
        // the reference's checker-walk counter (checker.go:883-887)
        (dc +: (body ++ elseBody).map(dStmt)).max
      case IncStmt(_, ks, delta, _) => (ks :+ delta).map(dExpr).max
      case SetStmt(_, ks, v) => (ks :+ v).map(dExpr).max
      case DelStmt(_, ks, _) => (0 +: ks.map(dExpr)).max
      case ExprStmt(e) => dExpr(e)
      case _ => 0
    })
    val depth = (0 +: prog.stmts.map(dStmt)).max
    if (depth > maxDepth) err(
      s"Expression exceeded maximum recursion depth of $maxDepth")
  }

  // ------------- compile-time constant folding -------------

  /** Fold constant numeric arithmetic and reject constant div/mod by
    * zero at compile time — the reference's optimiser pass
    * (`compiler/opt/opt.go:17-170`, run around the type checker at
    * `compiler/compiler.go:103-134`). One bottom-up walk reaches the
    * fixpoint on literal trees (the reference's own nested-ops test
    * folds in a single `Optimise` call).
    *
    * Folded ops: `+ - * / % **` when BOTH operands are Int/Float
    * literals (a non-constant divisor of zero still takes the runtime
    * NULL + error-counter path, like the reference VM). Int∘Int stays
    * Int — Go truncating `/` and `%`, `**` via math.Pow then int64
    * conversion, exactly the reference's arms — and any Float operand
    * widens the result to Float. A constant `x/0` or `x%0` (either
    * type) is a COMPILE error: "divide by zero" / "mod by zero".
    *
    * Deliberate deviation: the reference's IntLit-lhs/FloatLit-rhs MOD
    * arm stores its result into the RHS node and returns the
    * zero-valued fresh literal (opt.go:88-93 — so `1 % 2.0` folds to
    * 0.0 there); we fold to the IEEE remainder like its other three
    * MOD arms.
    */
  private def constFold(prog: Program): Program = {
    def err(m: String): Nothing =
      throw new IllegalArgumentException(s"${prog.name}: $m")
    def foldII(op: String, l: Long, r: Long): Option[Expr] = op match {
      case "+" => Some(IntLit(l + r))
      case "-" => Some(IntLit(l - r))
      case "*" => Some(IntLit(l * r))
      case "/" =>
        if (r == 0) err("divide by zero") else Some(IntLit(l / r))
      case "%" =>
        if (r == 0) err("mod by zero") else Some(IntLit(l % r))
      case "**" =>
        Some(IntLit(math.pow(l.toDouble, r.toDouble).toLong))
      case _ => None
    }
    def foldFF(op: String, l: Double, r: Double): Option[Expr] =
      op match {
        case "+" => Some(FloatLit(l + r))
        case "-" => Some(FloatLit(l - r))
        case "*" => Some(FloatLit(l * r))
        case "/" =>
          if (r == 0) err("divide by zero") else Some(FloatLit(l / r))
        case "%" =>
          if (r == 0) err("mod by zero") else Some(FloatLit(l % r))
        case "**" => Some(FloatLit(math.pow(l, r)))
        case _ => None
      }
    def foldE(e: Expr): Expr = e match {
      case Binop(op, l0, r0) =>
        val (l, r) = (foldE(l0), foldE(r0))
        val folded = (l, r) match {
          case (IntLit(a), IntLit(b)) => foldII(op, a, b)
          case (IntLit(a), FloatLit(b)) => foldFF(op, a.toDouble, b)
          case (FloatLit(a), IntLit(b)) => foldFF(op, a, b.toDouble)
          case (FloatLit(a), FloatLit(b)) => foldFF(op, a, b)
          case _ => None
        }
        folded.getOrElse(Binop(op, l, r))
      case Unop(op, e0) => Unop(op, foldE(e0))
      case Call(fn, args) => Call(fn, args.map(foldE))
      case MetricRead(m, keys) => MetricRead(m, keys.map(foldE))
      case other => other
    }
    def foldC(c: Cond): Cond = c match {
      case CondExpr(e) => CondExpr(foldE(e))
      case other => other
    }
    def foldS(s: Stmt): Stmt = s match {
      case CondBlock(c, body, els) =>
        CondBlock(foldC(c), body.map(foldS), els.map(foldS))
      case s @ IncStmt(m, keys, delta, _) =>
        s.copy(keys = keys.map(foldE), delta = foldE(delta))
      case SetStmt(m, keys, v) => SetStmt(m, keys.map(foldE), foldE(v))
      case DelStmt(m, keys, after) => DelStmt(m, keys.map(foldE), after)
      case ExprStmt(e) => ExprStmt(foldE(e))
      case other => other
    }
    prog.copy(stmts = prog.stmts.map(foldS))
  }

  private final class Parser(toks: Vector[Tok], name: String) {
    private var p = 0
    private val decls = mutable.ArrayBuffer[MetricDecl]()
    private val defs = mutable.Map[String, Seq[Stmt]]()
    private val consts = mutable.Map[String, String]()
    // decorator / pattern-constant usage: an unused definition is a
    // compile error like the reference's symbol-table sweep
    // (checker.go:249-266)
    private val usedDefs = mutable.Set[String]()
    private val usedConsts = mutable.Set[String]()

    // clamp to the TEOF sentinel: a parse error right after consuming
    // the last token (e.g. parsePrimary advancing onto EOF) must report
    // the typed error, not crash the error reporter with an
    // IndexOutOfBounds (found by FrontendPropSpec's fuzz sweep)
    private def cur: Tok = toks(math.min(p, toks.length - 1))
    private def advance(): Tok = { val t = cur; p += 1; t }
    private def skipNLs(): Unit =
      while (cur.isInstanceOf[TNL]) p += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"$name at ${cur.pos}: $msg (got $cur)")
    private def expectPunct(s: String): Unit = cur match {
      case TPunct(`s`, _) => p += 1
      case _ => fail(s"expected '$s'")
    }
    private def at(s: String): Boolean = cur match {
      case TPunct(`s`, _) => true
      case _ => false
    }
    private def atKw(s: String): Boolean = cur match {
      case TKw(`s`, _) => true
      case _ => false
    }

    def parseProgram(): Program = {
      val stmts = mutable.ArrayBuffer[Stmt]()
      skipNLs()
      while (!cur.isInstanceOf[TEOF]) {
        parseTop().foreach(stmts += _)
        skipNLs()
      }
      (defs.keySet -- usedDefs).toSeq.sorted.headOption.foreach(d =>
        throw new IllegalArgumentException(s"$name: Declaration of " +
          s"decorator `$d' here is never used."))
      (consts.keySet -- usedConsts).toSeq.sorted.headOption.foreach(c =>
        throw new IllegalArgumentException(s"$name: Declaration of " +
          s"named pattern constant `$c' here is never used."))
      Program(name, decls.toSeq, stmts.toSeq)
    }

    /** `next` statements reachable in a decorator body (nested blocks
      * included) — exactly one is legal (checker.go's def-without-next
      * and two-nexts rules).
      */
    private def countNexts(ss: Seq[Stmt]): Int = ss.iterator.map {
      case NextStmt => 1
      case CondBlock(_, b, e) => countNexts(b) + countNexts(e)
      case _ => 0
    }.sum

    private def parseTop(): Option[Stmt] = {
      if (atKw("hidden") || atKw("counter") || atKw("gauge") ||
        atKw("timer") || atKw("text") || atKw("histogram")) {
        parseDecl(); None
      } else if (atKw("def")) { parseDef(); None }
      else if (atKw("const")) { parseConst(); None }
      else Some(parseStmt())
    }

    private def parseDecl(): Unit = {
      val hidden = atKw("hidden") && { advance(); true }
      val kind = advance() match {
        case TKw("counter", _) => Counter
        case TKw("gauge", _) => Gauge
        case TKw("timer", _) => Timer
        case TKw("text", _) => Text
        case TKw("histogram", _) => Histogram
        case t => fail(s"metric kind expected, got $t")
      }
      val mname = advance() match {
        case TId(s, _) => s
        case t => fail(s"metric name expected, got $t")
      }
      var keys = Seq.empty[String]
      var exportAs: Option[String] = None
      var buckets = Seq.empty[Double]
      var limit = 0
      var more = true
      while (more) {
        if (atKw("by")) {
          advance()
          val ks = mutable.ArrayBuffer[String]()
          ks += (advance() match {
            case TId(s, _) => s; case t => fail(s"label expected: $t")
          })
          while (at(",")) {
            advance()
            ks += (advance() match {
              case TId(s, _) => s; case t => fail(s"label expected: $t")
            })
          }
          keys = ks.toSeq
        } else if (atKw("as")) {
          advance()
          exportAs = Some(advance() match {
            case TStr(s, _) => s; case t => fail(s"string expected: $t")
          })
        } else if (atKw("buckets")) {
          advance()
          val bs = mutable.ArrayBuffer[Double]()
          def num(): Double = advance() match {
            case TInt(v, _) => v.toDouble
            case TFloat(v, _) => v
            case t => fail(s"bucket bound expected: $t")
          }
          bs += num()
          while (at(",")) { advance(); bs += num() }
          buckets = bs.toSeq
        } else if (atKw("limit")) {
          advance()
          limit = advance() match {
            case TInt(v, _) => v.toInt; case t => fail(s"limit int: $t")
          }
        } else more = false
      }
      decls += MetricDecl(kind, mname, keys, exportAs, hidden, buckets,
        limit)
    }

    private def parseDef(): Unit = {
      advance() // def
      val dname = advance() match {
        case TId(s, _) => s; case t => fail(s"decorator name: $t")
      }
      skipNLs()
      val body = parseBlock()
      if (countNexts(body) > 1)
        fail("Can't use `next' statement twice in a decorator.")
      defs(dname) = body
    }

    private def parseConst(): Unit = {
      advance() // const
      val cname = advance() match {
        case TId(s, _) => s; case t => fail(s"const name: $t")
      }
      // pattern expression: regex/const-id concatenated by '+'
      val sb = new StringBuilder
      var more = true
      while (more) {
        advance() match {
          case TRegex(re2, _) => sb.append(re2)
          case TId(id, _) =>
            sb.append(consts.getOrElse(id, fail(s"unknown const $id")))
            usedConsts += id
          case t => fail(s"pattern fragment expected: $t")
        }
        if (at("+")) { advance(); skipNLsAfterOp() } else more = false
      }
      consts(cname) = sb.toString
    }

    private def skipNLsAfterOp(): Unit = skipNLs()

    private def parseBlock(): Seq[Stmt] = {
      expectPunct("{")
      val stmts = mutable.ArrayBuffer[Stmt]()
      skipNLs()
      while (!at("}")) {
        // blocks admit declarations too (ntpd.mtail declares counters
        // inside its decorated block); decls hoist to program scope
        parseTop().foreach(stmts += _)
        skipNLs()
      }
      expectPunct("}")
      stmts.toSeq
    }

    private def parseStmt(): Stmt = {
      skipNLs()
      if (atKw("otherwise")) {
        advance(); skipNLs()
        CondBlock(CondOtherwise, parseBlock())
      } else if (atKw("del")) {
        advance()
        val (m, keys) = parseLvalue()
        val after = if (atKw("after")) {
          advance()
          advance() match {
            case TDur(s, _) => Some(s)
            case TInt(v, _) => Some(v) // bare seconds
            case t => fail(s"duration expected: $t")
          }
        } else None
        DelStmt(m, keys, after)
      } else if (atKw("stop")) { advance(); StopStmt }
      else if (atKw("next")) { advance(); NextStmt }
      else if (at("@")) {
        advance()
        val dname = advance() match {
          case TId(s, _) => s; case t => fail(s"decorator name: $t")
        }
        skipNLs()
        val block = parseBlock()
        val body = defs.getOrElse(dname, fail(s"unknown decorator $dname"))
        usedDefs += dname
        if (countNexts(body) == 0)
          fail(s"No symbols found in decorator `@$dname'.\n\tTry " +
            "adding a `next' statement inside the `{}' block.")
        // splice: decorator body with `next` replaced by the block
        spliceAll(body, block) match {
          case Seq(one) => one
          case many => CondBlock(CondAlways, many)
        }
      } else {
        // expression-led: cond-block, assignment, inc/dec, or expr stmt
        val e = parseExpr()
        if (at("{")) {
          skipNLs()
          val body = parseBlock()
          val els = if (atKw("else")) {
            advance(); skipNLs(); parseBlock()
          } else Nil
          CondBlock(toCond(e), body, els)
        } else exprToStmt(e)
      }
    }

    private def spliceAll(body: Seq[Stmt], block: Seq[Stmt]): Seq[Stmt] =
      body.flatMap {
        case NextStmt => block
        case CondBlock(c, b, e) =>
          Seq(CondBlock(c, spliceAll(b, block), spliceAll(e, block)))
        case s => Seq(s)
      }

    private def toCond(e: Expr): Cond = e match {
      case PatternLit(re2) => CondPattern(re2)
      case Unop("!", PatternLit(re2)) => CondPattern(re2, negated = true)
      case other => CondExpr(patternize(other))
    }

    /** bare PatternLits inside a cond expr become line matches. */
    private def patternize(e: Expr): Expr = e match {
      case PatternLit(re2) => LineMatch(re2)
      case Binop(op @ ("&&" | "||"), l, r) =>
        Binop(op, patternize(l), patternize(r))
      case Unop("!", PatternLit(re2)) => LineMatch(re2, negated = true)
      case other => other
    }

    /** index chains: both `m[a, b]` and `m[a][b]` (parser.y:375-390). */
    private def parseIndexChain(): Seq[Expr] = {
      val ks = mutable.ArrayBuffer[Expr]()
      while (at("[")) {
        advance()
        ks += parseExpr()
        while (at(",")) { advance(); ks += parseExpr() }
        expectPunct("]")
      }
      ks.toSeq
    }

    private def parseLvalue(): (String, Seq[Expr]) = {
      val m = advance() match {
        case TId(s, _) => s; case t => fail(s"metric name expected: $t")
      }
      (m, parseIndexChain())
    }

    private def exprToStmt(e: Expr): Stmt = e match {
      case Binop("=", MetricRead(m, keys), rhs) => SetStmt(m, keys, rhs)
      case Binop("+=", MetricRead(m, keys), rhs) =>
        IncStmt(m, keys, rhs, addAssign = true)
      case Unop("++", MetricRead(m, keys)) => IncStmt(m, keys)
      case Unop("--", MetricRead(m, keys)) =>
        IncStmt(m, keys, IntLit(-1))
      case call @ Call(_, _) => ExprStmt(call)
      case other => fail(s"expression is not a statement: $other")
    }

    // expression precedence (parser.y): = += -= (right) < || < && <
    // =~ !~ < == != < < <= > >= < | ^ < & < << >> < + - <
    // * / % ** (POW is a mul_op, parser.y:372-380 — left-assoc, SAME
    // tier as *: `2 * 3 ** 2` is `(2*3)**2`) < unary < postfix
    private def parseExpr(): Expr = parseAssign()

    private def parseAssign(): Expr = {
      val l = parseOr()
      if (at("=") || at("+=")) {
        val op = advance().asInstanceOf[TPunct].s
        skipNLs()
        Binop(op, l, parseAssign())
      } else l
    }

    private def binLevel(next: () => Expr, ops: Set[String]): Expr = {
      var l = next()
      while (cur match {
        case TPunct(s, _) if ops(s) => true
        case _ => false
      }) {
        val op = advance().asInstanceOf[TPunct].s
        skipNLs() // operators continue across newlines
        l = Binop(op, l, next())
      }
      l
    }

    private def parseOr(): Expr = binLevel(() => parseAnd(), Set("||"))
    private def parseAnd(): Expr = binLevel(() => parseMatch(), Set("&&"))
    private def parseMatch(): Expr =
      binLevel(() => parseEq(), Set("=~", "!~"))
    private def parseEq(): Expr =
      binLevel(() => parseRel(), Set("==", "!="))
    private def parseRel(): Expr =
      binLevel(() => parseBitOr(), Set("<", "<=", ">", ">="))
    private def parseBitOr(): Expr =
      binLevel(() => parseBitAnd(), Set("|", "^"))
    private def parseBitAnd(): Expr =
      binLevel(() => parseShift(), Set("&"))
    private def parseShift(): Expr =
      binLevel(() => parseAdd(), Set("<<", ">>"))
    private def parseAdd(): Expr =
      binLevel(() => parseMul(), Set("+", "-"))
    private def parseMul(): Expr =
      binLevel(() => parseUnary(), Set("*", "/", "%", "**"))

    private def parseUnary(): Expr = cur match {
      case TPunct("!", _) => advance(); Unop("!", parseUnary())
      case TPunct("~", _) => advance(); Unop("~", parseUnary())
      case TPunct("-", _) => advance(); Unop("-", parseUnary())
      case _ => parsePostfix()
    }

    private def parsePostfix(): Expr = {
      var e = parsePrimary()
      var more = true
      while (more) {
        if (at("++")) { advance(); e = Unop("++", e) }
        else if (at("--")) { advance(); e = Unop("--", e) }
        else more = false
      }
      e
    }

    private val builtins = Set("strptime", "settime", "timestamp", "len",
      "tolower", "subst", "strtol", "getfilename", "int", "float",
      "string", "bool")

    private def parsePrimary(): Expr = advance() match {
      case TInt(v, _) => IntLit(v)
      case TFloat(v, _) => FloatLit(v)
      case TStr(s, _) => StrLit(s)
      case TCapref(s, _) => Capref(s)
      case TRegex(re2, _) => foldConcat(PatternLit(re2))
      case TPunct("(", _) =>
        val e = parseExpr()
        expectPunct(")")
        e
      case TId(id, _) =>
        if (at("(")) {
          if (!builtins(id)) fail(s"unknown function $id")
          advance()
          val args = mutable.ArrayBuffer[Expr]()
          if (!at(")")) {
            args += parseExpr()
            while (at(",")) { advance(); args += parseExpr() }
          }
          expectPunct(")")
          Call(id, args.toSeq)
        } else if (consts.contains(id)) {
          usedConsts += id
          foldConcat(PatternLit(consts(id)))
        } else MetricRead(id, parseIndexChain())
      case t => fail(s"unexpected token $t")
    }

    /** after a pattern primary, greedily fold `+ pattern/const` chains so
      * concatenation happens at compile time (checker.go:921-966).
      */
    private def foldConcat(first: PatternLit): Expr = {
      var re2 = first.re2
      var more = true
      while (more && at("+")) {
        // lookahead: only fold when the next operand is a pattern/const
        val save = p
        advance()
        skipNLs()
        cur match {
          case TRegex(r, _) => advance(); re2 += r
          case TId(id, _) if consts.contains(id) =>
            advance(); re2 += consts(id); usedConsts += id
          case _ => p = save; more = false
        }
      }
      PatternLit(re2)
    }
  }
}
