package graft.mtail

/** Typed intermediate representation of an mtail program — the analogue of
  * the reference's checked AST (`internal/runtime/compiler/ast/ast.go`),
  * consumed by [[graft.plan.PlanBuilder]] to emit DataFrame plans.
  *
  * Decorators and `const` pattern fragments are inlined by the frontend
  * before this IR exists (mirroring codegen-time inlining,
  * `compiler/codegen/codegen.go:290-311`), so the IR has no macro forms.
  */
object Ir {

  sealed trait Kind
  case object Counter extends Kind
  case object Gauge extends Kind
  case object Timer extends Kind
  case object Text extends Kind
  case object Histogram extends Kind

  final case class MetricDecl(
      kind: Kind,
      name: String,
      keys: Seq[String] = Nil,
      exportAs: Option[String] = None,
      hidden: Boolean = false,
      buckets: Seq[Double] = Nil, // histogram bucket upper bounds (+Inf auto)
      limit: Int = 0) {
    def exportName: String = exportAs.getOrElse(name)
  }

  // ---- expressions ----
  sealed trait Expr
  final case class StrLit(v: String) extends Expr
  final case class IntLit(v: Long) extends Expr
  final case class FloatLit(v: Double) extends Expr
  /** `$1` → Capref("1"), `$name` → Capref("name"). */
  final case class Capref(name: String) extends Expr
  /** Read of a metric cell: `connection_time[$pid]` in an expression. */
  final case class MetricRead(metric: String, keys: Seq[Expr]) extends Expr
  /** Binary op: + - * / % ** & | ^ << >> < <= > >= == != && || =~ !~ */
  final case class Binop(op: String, l: Expr, r: Expr) extends Expr
  /** Unary: ! ~ - */
  final case class Unop(op: String, e: Expr) extends Expr
  /** Builtins: strptime settime timestamp len tolower subst strtol
    * getfilename int float string bool
    */
  final case class Call(fn: String, args: Seq[Expr]) extends Expr
  /** `expr =~ /re2/` (negate for !~); also `subst(/re/, …)` first arg. */
  final case class PatternLit(re2: String) extends Expr
  /** a bare `/re2/` inside a condition expression: match the input line
    * (composable: `// + RE && partial == 1 { … }`).
    */
  final case class LineMatch(re2: String, negated: Boolean = false)
      extends Expr

  // ---- conditions ----
  sealed trait Cond
  /** `/re2/ { … }` — match against the input line, binds caprefs. */
  final case class CondPattern(re2: String, negated: Boolean = false)
      extends Cond
  /** relational / match expression condition. */
  final case class CondExpr(e: Expr) extends Cond
  /** `otherwise { … }` — no sibling cond in this scope matched. */
  case object CondOtherwise extends Cond
  /** synthetic always-true wrapper for a multi-statement decorator
    * splice — distinct from a user-written `1 { }`, which the checker
    * rejects like the reference ("Can't interpret Int as a boolean
    * expression here", checker_test.go's int-as-bool case).
    */
  case object CondAlways extends Cond

  // ---- statements ----
  sealed trait Stmt
  final case class CondBlock(cond: Cond, body: Seq[Stmt],
      elseBody: Seq[Stmt] = Nil) extends Stmt
  /** `m[k…]++` / `--` / `+= e` — delta defaults to +1. `addAssign`
    * marks the `+=` form: the reference compiles ADD_ASSIGN as
    * `m = m + e` (codegen.go:359-363 double-emits the lhs), which on a
    * TEXT metric is legal string CONCATENATION, while `++`/`--` (the
    * Inc/Dec opcodes) reject non-Int metrics at compile.
    */
  final case class IncStmt(metric: String, keys: Seq[Expr] = Nil,
      delta: Expr = IntLit(1), addAssign: Boolean = false) extends Stmt
  /** `m[k…] = e` (gauge/timer/text set; histogram observe). */
  final case class SetStmt(metric: String, keys: Seq[Expr], value: Expr)
      extends Stmt
  /** `del m[k…]` / `del m[k…] after 3600s`. */
  final case class DelStmt(metric: String, keys: Seq[Expr],
      afterSeconds: Option[Long] = None) extends Stmt
  /** expression statement — `strptime(...)`, `settime(...)`. */
  final case class ExprStmt(e: Expr) extends Stmt
  case object StopStmt extends Stmt
  /** `next` inside a decorator def — replaced by the decorated block at
    * parse time; never reaches the PlanBuilder.
    */
  case object NextStmt extends Stmt

  final case class Program(name: String, decls: Seq[MetricDecl],
      stmts: Seq[Stmt]) {
    def decl(metric: String): MetricDecl =
      decls.find(_.name == metric).getOrElse(
        throw new IllegalArgumentException(
          s"program $name: undeclared metric $metric"))

    /** String-VALUED metrics updated by `+=` anywhere — their values
      * are running CONCATENATIONS (ADD_ASSIGN@String is Cat,
      * codegen.go:359-363 — for ANY kind, not just `text`: a counter
      * or gauge whose first typed use PINNED String concatenates
      * too), so the streaming store must APPEND a batch's local
      * concat instead of last-write-replacing it (mirrors how counter
      * batches sum). Derived from the inferred value type
      * ([[TypeInfer]]), not the declared kind (ADVICE r18).
      */
    lazy val concatTextMetrics: Set[String] = {
      lazy val inferred = TypeInfer.infer(this)
      val str = decls.filter(d => d.kind match {
        case Text => true
        case Histogram => false
        case _ => inferred.getOrElse(d.name, 'I') == 'S'
      }).map(_.name).toSet
      def walk(ss: Seq[Stmt]): Set[String] = ss.flatMap {
        case IncStmt(m, _, _, _) if str(m) => Seq(m)
        case CondBlock(_, b, e) => walk(b) ++ walk(e)
        case _ => Nil
      }.toSet
      walk(stmts)
    }
  }
}
