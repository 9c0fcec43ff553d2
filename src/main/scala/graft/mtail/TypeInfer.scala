package graft.mtail

import scala.collection.mutable

import Ir._

/** Order-sensitive metric type inference — the port of the reference
  * checker's unification walk (checker.go:344-674 over
  * types.go:253-544), which round 18's biased fuzz hunt proved the
  * old "any String write promotes" fixpoint deviates from.
  *
  * The reference gives every non-text metric a fresh type VARIABLE
  * (checker.go:113-149) and walks the AST once in program order; the
  * FIRST unification that instantiates the variable pins it, and
  * later conflicting uses do NOT re-pin: `Unify` of two distinct
  * concrete scalars resolves to their LUB and returns it WITHOUT
  * touching the already-instantiated variable (types.go:424-443 — the
  * operator/operator arm computes the LUB only for the RESULT).
  * Consequences this module reproduces exactly:
  *
  *  - `c0 += int(x)` then `c0 += $s` → c0 is INT; the later string
  *    delta is popped through PopInt's strconv.ParseInt coercion at
  *    runtime (vm.go:128-147) — abort on non-numeric, NOT a promotion
  *    of c0 to String (the old fixpoint's answer);
  *  - `c0 = $s` then `c0 += 1` → c0 is STRING; ADD_ASSIGN at String
  *    is Cat — string CONCAT of "1" (codegen.go:358-362,523-540);
  *  - a comparison `m < 5` pins an unpinned m to Int
  *    (checker.go:461-489 unifies both operands with the LUB);
  *  - `len(m)` / `tolower(m)` / `strtol(m, b)` pin an unpinned m to
  *    String; `settime(m)` pins Int (types.go:254-267 Builtins);
  *  - `m++` pins an unpinned m to Int, and is a COMPILE ERROR when m
  *    was already pinned Float or String ("expecting an Int",
  *    checker.go:590-632 — the unify result must still contain Int);
  *  - arithmetic/comparison/assignment LUB failures (Float vs
  *    Pattern, Numeric vs String, …) are compile errors
  *    (types.go:499-544).
  *
  * Datum type mapping at the end (codegen.go:86-101): Float→'F',
  * String→'S', everything else — unpinned variables, Int, Bool,
  * Pattern, the Numeric alternate — defaults to 'I'. Text declarations
  * pin String up front; histograms keep the engine's observe-as-float
  * semantics ('F', golden-pinned) — the reference corpus never writes
  * a non-numeric into a histogram.
  */
object TypeInfer {

  // ---- type model (types.go): scalars are 0-arg operators, Numeric
  // is the {Int,Float} alternate, Dimension carries key types + value
  sealed trait Ty {
    def root: Ty = this
  }
  final class TVar extends Ty {
    var inst: Option[Ty] = None
    override def root: Ty = inst match {
      case Some(t) =>
        val r = t.root
        inst = Some(r) // path compression
        r
      case None => this
    }
  }
  final case class TCon(name: String) extends Ty
  final case class TAlt(members: Seq[TCon]) extends Ty
  final case class TDim(args: Seq[Ty]) extends Ty

  val TInt: TCon = TCon("Int")
  val TFloat: TCon = TCon("Float")
  val TString: TCon = TCon("String")
  val TBool: TCon = TCon("Bool")
  val TPattern: TCon = TCon("Pattern")
  val TNone: TCon = TCon("None")
  val TNumeric: TAlt = TAlt(Seq(TInt, TFloat))

  final class TypeError(msg: String)
    extends IllegalArgumentException(msg)

  /** types.go:465-474 — ordered; the loop returns the FIRST match, so
    * the trailing {Int,Bool} pair is dead code there and omitted here.
    */
  private val coercions: Seq[(TCon, TCon)] = Seq(
    (TBool, TInt), (TBool, TFloat), (TInt, TFloat), (TBool, TString),
    (TInt, TString), (TFloat, TString), (TString, TPattern))

  /** types.go:477-544. */
  def lub(a0: Ty, b0: Ty): Ty = {
    val a = a0.root; val b = b0.root
    if (a == b) return a
    (a, b) match {
      case (v: TVar, o) => o
      case (o, _: TVar) => o
      case _ =>
        coercions.collectFirst {
          case (sub, sup) if (a == sub && b == sup) ||
            (b == sub && a == sup) => sup
        }.getOrElse {
          (a, b) match {
            case (TPattern, TBool) | (TBool, TPattern) => TBool
            case (TNumeric, TInt) | (TInt, TNumeric) => TInt
            case (TNumeric, TFloat) | (TFloat, TNumeric) => TFloat
            case (TPattern, TInt) | (TInt, TPattern) => TBool
            case _ => throw new TypeError(
              s"type mismatch: $a vs $b")
          }
        }
    }
  }

  /** types.go:359-456. Unify of two distinct concrete scalars is the
    * LUB (no error, no variable re-instantiation) — the heart of the
    * first-pin-wins behavior.
    */
  def unify(a0: Ty, b0: Ty): Ty = {
    val a = a0.root; val b = b0.root
    (a, b) match {
      case (av: TVar, bv: TVar) =>
        if (av ne bv) { av.inst = Some(bv); bv } else av
      case (av: TVar, o) => av.inst = Some(o); o
      case (_, _: TVar) => unify(b, a)
      case (aa: TAlt, bo) if !bo.isInstanceOf[TAlt] =>
        bo match {
          case c: TCon if aa.members.contains(c) => c
          case _ => throw new TypeError(s"type mismatch: $aa vs $bo")
        }
      case (ao, ba: TAlt) if !ao.isInstanceOf[TAlt] => unify(ba, ao)
      case (aa: TAlt, ba: TAlt) =>
        val inter = ba.members.filter(aa.members.contains)
        inter match {
          case Seq() => throw new TypeError(s"type mismatch: $aa vs $ba")
          case Seq(one) => one
          case many => TAlt(many)
        }
      case (ad: TDim, bd: TDim) =>
        if (ad.args.length != bd.args.length) throw new TypeError(
          s"key-arity mismatch: ${ad.args.length - 1} vs " +
            s"${bd.args.length - 1}")
        TDim(ad.args.zip(bd.args).map { case (x, y) => unify(x, y) })
      case (ac: TCon, bc: TCon) => lub(ac, bc) // names differ, 0 args
      case _ => throw new TypeError(s"type mismatch: $a vs $b")
    }
  }

  /** checker.go:786-799 + types.go Builtins — (argTypes, resultType);
    * fresh-variable arguments are created per call site.
    */
  private def builtinSig(name: String): (Seq[() => Ty], Ty) =
    name match {
      case "int" => (Seq(() => new TVar), TInt)
      case "bool" => (Seq(() => new TVar), TBool)
      case "float" => (Seq(() => new TVar), TFloat)
      case "string" => (Seq(() => new TVar), TString)
      case "timestamp" => (Seq.empty, TInt)
      case "len" => (Seq(() => TString), TInt)
      case "settime" => (Seq(() => TInt), TNone)
      case "strptime" => (Seq(() => TString, () => TString), TNone)
      case "strtol" => (Seq(() => TString, () => TInt), TInt)
      case "tolower" => (Seq(() => TString), TString)
      case "getfilename" => (Seq.empty, TString)
      case "subst" =>
        (Seq(() => TPattern, () => TString, () => TString), TString)
      case _ => (Seq.empty, TString) // parser restricts the set
    }

  /** Inferred value types per metric: 'I' | 'F' | 'S' (codegen.go's
    * datum mapping — incomplete/Bool/Pattern default to Int). Throws
    * [[TypeError]] (an IllegalArgumentException, same contract as
    * Checker) on the reference's compile errors.
    */
  def infer(prog: Program): Map[String, Char] =
    new Infer(prog).run()

  private final class Infer(prog: Program) {
    // metric name → value Ty (keyless) or TDim(keys :+ value)
    private val metricTy = mutable.Map[String, Ty]()
    prog.decls.foreach { d =>
      val valueTy: Ty = d.kind match {
        case Text => TString
        case Histogram => TFloat // engine semantic: observe-as-float
        case _ => new TVar
      }
      metricTy(d.name) =
        if (d.keys.isEmpty) valueTy
        else TDim(d.keys.map(_ => new TVar: Ty) :+ valueTy)
    }

    private val reMemo = mutable.Map[String, Option[Re2.Parsed]]()
    private def parsed(re2: String): Option[Re2.Parsed] =
      reMemo.getOrElseUpdate(re2,
        try Some(Re2.parse(re2))
        catch { case _: IllegalArgumentException => None })

    /** capref type from the innermost binding frame, as the engine and
      * MiniVm resolve them (charclass inference).
      */
    private def caprefTy(name: String, scope: List[Re2.Parsed]): Ty =
      scope.view.flatMap { p =>
        val idx = name.toIntOption match {
          case Some(i) => p.groups.find(_.index == i).map(_.index)
          case None => p.groups.find(_.name.contains(name)).map(_.index)
        }
        idx.map(i => Re2.inferCaprefType(p, i) match {
          case Re2.CapInt => TInt
          case Re2.CapFloat => TFloat
          case Re2.CapString => TString
        })
      }.headOption.getOrElse(TString)

    /** the value slot of a metric use; keys unify positionally with
      * the declared Dimension (checker.go:676-771).
      */
    private def metricValueTy(m: String, keys: Seq[Expr],
        scope: List[Re2.Parsed]): Ty =
      metricTy.get(m) match {
        case None => new TVar // undeclared: Checker's business
        case Some(t) => t.root match {
          case d: TDim =>
            if (keys.isEmpty) d.args.last // arity err is Checker's
            else {
              val rv = new TVar
              val got = TDim(keys.map(k => ty(k, scope)) :+ (rv: Ty))
              if (d.args.length == got.args.length) unify(d, got)
              rv.root
            }
          case v => v
        }
      }

    /** post-order expression typing with the checker's unification
      * side effects (checker.go:344-674).
      */
    private def ty(e: Expr, scope: List[Re2.Parsed]): Ty = e match {
      case StrLit(_) => TString
      case IntLit(_) => TInt
      case FloatLit(_) => TFloat
      case PatternLit(_) => TPattern
      case LineMatch(_, _) => TBool
      case Capref(n) => caprefTy(n, scope)
      case MetricRead(m, keys) => metricValueTy(m, keys, scope)
      case Binop(op, l, r) =>
        val lT = ty(l, scope)
        val rT = ty(r, scope)
        op match {
          case "+" | "-" | "*" | "/" | "%" | "**" =>
            // arithmetic: LUB errors reject; the t→t→t unification
            // pins unpinned variable operands (checker.go:357-380)
            val t = lub(lT, rT)
            val v: Ty = new TVar
            val v1 = unify(v, lT)
            val v2 = unify(v1, rT)
            unify(v2, t)
            t
          case "<<" | ">>" | "&" | "|" | "^" =>
            unify(TInt, lT); unify(TInt, rT) // String coerces via LUB
            TInt
          case "&&" | "||" =>
            unify(TBool, lT); unify(TBool, rT)
            TBool
          case "<" | "<=" | ">" | ">=" | "==" | "!=" =>
            // comparisons unify BOTH operands with the LUB — this is
            // the rule that pins `m < 5` to Int (checker.go:461-489)
            val t = lub(lT, rT)
            unify(t, lT); unify(t, rT)
            TBool
          case "=~" | "!~" =>
            unify(TPattern, rT)
            TBool
          case _ => TBool
        }
      case Unop("!", x) => ty(x, scope); TBool
      case Unop("~", x) =>
        unify(TInt, ty(x, scope)); TInt
      case Unop(op @ ("++" | "--"), x) => ty(x, scope)
      case Unop(_, x) => ty(x, scope)
      case Call(fn, args) =>
        val (sig, res) = builtinSig(fn)
        args.zipWithIndex.foreach { case (a, i) =>
          val aT = ty(a, scope)
          if (i < sig.length) unify(sig(i)(), aT)
        }
        res
    }

    private def incCheck(m: String, keys: Seq[Expr],
        scope: List[Re2.Parsed]): Unit = {
      // `m++`/`m--`: unify with Int; the RESULT must still contain Int
      // or it's "expecting an Int" (checker.go:590-632) — a Float- or
      // String-pinned metric cannot be ++'d
      val lT = metricValueTy(m, keys, scope)
      val u = unify(TInt, lT)
      val containsInt = u.root match {
        case TInt => true
        case TAlt(ms) => ms.contains(TInt)
        case _ => false
      }
      if (!containsInt) throw new TypeError(
        s"type mismatch: expecting an Int for ++/-- on `$m', not $u")
    }

    private def walk(ss: Seq[Stmt], scope: List[Re2.Parsed]): Unit =
      ss.foreach {
        case CondBlock(c, body, els) =>
          val s2 = c match {
            case CondPattern(re2, neg) =>
              parsed(re2) match {
                case Some(p) if !neg => p :: scope
                case _ => scope
              }
            case CondExpr(e) =>
              ty(e, scope)
              // frames pushed by embedded matches (bare /re/, =~) —
              // capref TYPING only; binding legality is Checker's
              collectFrames(e, scope)
            case _ => scope
          }
          walk(body, s2)
          walk(els, scope)
        case IncStmt(m, keys, delta, addAssign) =>
          if (!addAssign && (delta == IntLit(1) || delta == IntLit(-1)))
            incCheck(m, keys, scope)
          else {
            // ADD_ASSIGN: Tl := LUB(Tl, Tr), first pin wins
            // (checker.go:505-532)
            val rT = ty(delta, scope)
            val lT = metricValueTy(m, keys, scope)
            val t = lub(lT, rT)
            unify(lT, t)
          }
        case SetStmt(m, keys, v) =>
          val rT = ty(v, scope)
          val lT = metricValueTy(m, keys, scope)
          val t = lub(lT, rT)
          unify(lT, t)
        case DelStmt(m, keys, _) =>
          val _ = metricValueTy(m, keys, scope)
        case ExprStmt(e) =>
          val _ = ty(e, scope)
        case StopStmt | NextStmt => ()
      }

    /** frames contributed by pattern terms inside a condition
      * expression, left-to-right (mirrors PlanBuilder.condExpr).
      */
    private def collectFrames(e: Expr,
        scope: List[Re2.Parsed]): List[Re2.Parsed] = e match {
      case LineMatch(re2, false) =>
        parsed(re2).map(_ :: scope).getOrElse(scope)
      case Binop("&&" | "||", l, r) =>
        collectFrames(r, collectFrames(l, scope))
      case Binop("=~", l, PatternLit(re2)) =>
        parsed(re2).map(_ :: scope).getOrElse(scope)
      case Unop("!", x) => scope
      case _ => scope
    }

    def run(): Map[String, Char] = {
      walk(prog.stmts, Nil)
      val out = prog.decls.map { d =>
        val vt = metricTy(d.name).root match {
          case dim: TDim => dim.args.last.root
          case v => v
        }
        d.name -> (vt match {
          case TFloat => 'F'
          case TString => 'S'
          case _ => 'I' // Int, Bool, Pattern, Numeric, unpinned var
        })
      }.toMap
      // scalar counters zero-init at declaration; only Int and Float
      // datums can ("Can't initialize to zero", codegen.go:109-126) —
      // a String-pinned keyless counter is a compile error
      prog.decls.find(d => d.keys.isEmpty && d.kind == Counter &&
        out(d.name) == 'S').foreach(d => throw new TypeError(
        s"Can't initialize to zero a String-typed counter `${d.name}'"))
      out
    }
  }
}
