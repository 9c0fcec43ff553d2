package graft.plan

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{GoStrptime, RegexExtractStruct}
import graft.mtail.{Ir, Re2}

/** Compiles an [[Ir.Program]] into DataFrame aggregation plans — the
  * replacement for the reference's codegen+VM
  * (`internal/runtime/compiler/codegen/codegen.go`,
  * `internal/runtime/vm/vm.go`): one shared extraction/projection prefix
  * over the line Dataset, then one declarative aggregation branch per
  * exported metric. Catalyst's whole-stage codegen replaces the bytecode
  * interpreter; shuffles on the label tuple replace the shared-memory
  * store.
  *
  * Key semantic mappings (SURVEY.md §2):
  *  - pattern conds → RegexExtractStruct.matched, nested blocks conjoin;
  *  - `otherwise` → static ¬(sibling conds) rewrite (vs the VM's runtime
  *    matched-flag, vm.go:897-902 — equivalent for side-effect-free
  *    conds);
  *  - `stop` → later statements conjoin ¬(stop cond);
  *  - time register → a threaded nullable timestamp Column, updated by
  *    strptime/settime in statement order;
  *  - cross-line metric reads (hidden metrics) → running last-write value
  *    via a window partitioned by the metric key, with same-line
  *    statement order resolved statically (site index);
  *  - counter → sum, gauge/timer/text → max_by(arrival), with the datum
  *    timestamp = time register at the last update (metric.go:151-181);
  *  - `del` → cells whose last operation is a delete are dropped, and a
  *    counter restarts from the delete point (vm.go:778-794);
  *  - histogram → bucket CASE + per-bucket counts, sum and count
  *    (datum/buckets.go:42-57).
  *
  * Scale: the extraction prefix is pure narrow projection (codegen'd);
  * each metric branch shuffles only its label tuple + value; windows for
  * hidden-state reads shuffle by the metric key (high-cardinality in
  * practice: pid, client). Nothing collects to the driver.
  */
final class PlanBuilder(program: Ir.Program, lines: DataFrame,
    defaultYear: Int) {

  import Ir._

  // ---------- phase 0: pattern extraction prefix ----------

  private val patternCols = mutable.LinkedHashMap[String, (String, Re2.Parsed)]()

  private def collectPatterns(stmts: Seq[Stmt]): Unit = stmts.foreach {
    case CondBlock(cond, body, els) =>
      cond match {
        case CondPattern(re2, _) => registerPattern(re2)
        case CondExpr(e) => collectExprPatterns(e)
        case CondOtherwise =>
      }
      collectPatterns(body); collectPatterns(els)
    case IncStmt(_, keys, delta) =>
      keys.foreach(collectExprPatterns); collectExprPatterns(delta)
    case SetStmt(_, keys, v) =>
      keys.foreach(collectExprPatterns); collectExprPatterns(v)
    case DelStmt(_, keys, _) => keys.foreach(collectExprPatterns)
    case ExprStmt(e) => collectExprPatterns(e)
    case StopStmt =>
  }

  private def collectExprPatterns(e: Expr): Unit = e match {
    case Binop("=~" | "!~", l, PatternLit(re2)) =>
      registerPattern(re2); collectExprPatterns(l)
    case Binop(_, l, r) => collectExprPatterns(l); collectExprPatterns(r)
    case Unop(_, x) => collectExprPatterns(x)
    case Call(_, args) => args.foreach(collectExprPatterns)
    case MetricRead(_, keys) => keys.foreach(collectExprPatterns)
    case _ =>
  }

  private def registerPattern(re2: String): Unit =
    if (!patternCols.contains(re2)) {
      val name = s"__m${patternCols.size}"
      patternCols(re2) = (name, Re2.parse(re2))
    }

  collectPatterns(program.stmts)

  /** the lines DF with one struct column per distinct pattern. */
  val df: DataFrame = patternCols.foldLeft(lines) {
    case (d, (re2, (colName, _))) =>
      d.withColumn(colName, RegexExtractStruct(col("line"), re2))
  }

  // ---------- walk state ----------

  private case class Frame(structCol: String, parsed: Re2.Parsed) {
    def resolve(name: String): Option[(Column, DataType)] = {
      val gi = name.toIntOption match {
        case Some(i) => parsed.groups.find(_.index == i)
        case None => parsed.groups.find(_.name.contains(name))
      }
      gi.map { g =>
        val t = Re2.inferCaprefType(parsed, g.index) match {
          case Re2.CapInt => LongType
          case Re2.CapFloat => DoubleType
          case Re2.CapString => StringType
        }
        (col(s"$structCol.g${g.index}"), t)
      }
    }
  }

  sealed trait Op
  case object OpInc extends Op
  case object OpSet extends Op
  case object OpDel extends Op

  /** one metric-update site, with full context captured at walk time. */
  private case class Site(idx: Int, metric: MetricDecl, op: Op,
      cond: Column, keys: Seq[Expr], valueIr: Option[Expr],
      frames: List[Frame], timeReg: Column, afterSeconds: Option[Long])

  private val sites = mutable.ArrayBuffer[Site]()
  private var timeReg: Column = lit(null).cast(TimestampType)
  private var stopGuard: Column = lit(true)

  // ---------- phase 1: walk ----------

  private def condColumn(cond: Cond, frames: List[Frame],
      siblings: Seq[Column]): (Column, List[Frame]) = cond match {
    case CondPattern(re2, negated) =>
      val (colName, parsed) = patternCols(re2)
      val c = col(s"$colName.matched")
      (if (negated) !c else c,
        Frame(colName, parsed) :: frames)
    case CondExpr(e) =>
      val c = exprColumn(e, frames, timeReg, -1)
      val bool = irType(e, frames) match {
        case BooleanType => c
        case StringType => c.isNotNull && c =!= ""
        case _ => c =!= lit(0)
      }
      (bool, frames)
    case CondOtherwise =>
      (siblings.reduceOption(_ || _).map(c => !coalesce(c, lit(false)))
        .getOrElse(lit(true)), frames)
  }

  private def walk(stmts: Seq[Stmt], frames: List[Frame],
      cond: Column): Unit = {
    val siblings = mutable.ArrayBuffer[Column]()
    stmts.foreach {
      case CondBlock(c, body, els) =>
        val (condCol, newFrames) = condColumn(c, frames, siblings.toSeq)
        c match {
          case CondOtherwise =>
          case _ => siblings += (cond && condCol)
        }
        walk(body, newFrames, cond && condCol)
        if (els.nonEmpty) walk(els, frames, cond && !coalesce(condCol, lit(false)))
      case IncStmt(m, keys, delta) =>
        sites += Site(sites.size, program.decl(m), OpInc,
          cond && stopGuard, keys, Some(delta), frames, timeReg, None)
      case SetStmt(m, keys, v) =>
        sites += Site(sites.size, program.decl(m), OpSet,
          cond && stopGuard, keys, Some(v), frames, timeReg, None)
      case DelStmt(m, keys, after) =>
        sites += Site(sites.size, program.decl(m), OpDel,
          cond && stopGuard, keys, None, frames, timeReg, after)
      case ExprStmt(Call("strptime", Seq(arg, StrLit(layout)))) =>
        val parsedTs = GoStrptime(
          exprColumn(arg, frames, timeReg, -1).cast(StringType),
          layout, defaultYear)
        timeReg = when(cond && stopGuard && parsedTs.isNotNull, parsedTs)
          .otherwise(timeReg)
      case ExprStmt(Call("settime", Seq(arg))) =>
        val ts = timestamp_seconds(exprColumn(arg, frames, timeReg, -1))
        timeReg = when(cond && stopGuard && ts.isNotNull, ts)
          .otherwise(timeReg)
      case ExprStmt(e) =>
        // other expression statements have no plan-level effect in batch
        val _ = e
      case StopStmt =>
        stopGuard = stopGuard && !coalesce(cond, lit(false))
    }
  }

  walk(program.stmts, Nil, lit(true))

  // ---------- typing (IR-level, mirrors checker's unification result) ----

  private val metricTypeMemo = mutable.Map[String, DataType]()

  def metricType(name: String): DataType = metricTypeMemo.getOrElseUpdate(name, {
    val decl = program.decl(name)
    decl.kind match {
      case Text => StringType
      case Histogram => DoubleType
      case _ =>
        metricTypeMemo(name) = LongType // cycle guard: default Int
        val ts = sites.filter(s => s.metric.name == name && s.op != OpDel)
          .map(s => irType(s.valueIr.get, s.frames))
        if (ts.contains(StringType)) StringType
        else if (ts.contains(DoubleType)) DoubleType
        else LongType
    }
  })

  private def irType(e: Expr, frames: List[Frame]): DataType = e match {
    case StrLit(_) => StringType
    case IntLit(_) => LongType
    case FloatLit(_) => DoubleType
    case PatternLit(_) => StringType
    case Capref(n) =>
      frames.view.flatMap(_.resolve(n)).headOption.map(_._2)
        .getOrElse(StringType)
    case MetricRead(m, _) => metricType(m)
    case Binop(op, l, r) => op match {
      case "<" | "<=" | ">" | ">=" | "==" | "!=" | "&&" | "||" | "=~" | "!~" =>
        BooleanType
      case "+" if irType(l, frames) == StringType ||
        irType(r, frames) == StringType => StringType
      case _ =>
        if (irType(l, frames) == DoubleType ||
          irType(r, frames) == DoubleType) DoubleType
        else LongType
    }
    case Unop("!", _) => BooleanType
    case Unop(_, x) => irType(x, frames)
    case Call(fn, args) => fn match {
      case "timestamp" | "strtol" | "len" | "int" => LongType
      case "float" => DoubleType
      case "tolower" | "subst" | "string" | "getfilename" => StringType
      case "strptime" | "settime" => TimestampType
      case "bool" => BooleanType
      case _ => if (args.nonEmpty) irType(args.head, frames) else StringType
    }
  }

  // ---------- phase 2: expression lowering ----------

  /** Lower an IR expression to a Column. `siteIdx` bounds same-line
    * metric reads (a read at site i sees same-line writes from sites < i);
    * -1 means "not inside a site" (cond exprs — they see prior lines only).
    */
  private def exprColumn(e: Expr, frames: List[Frame], tReg: Column,
      siteIdx: Int, reading: Set[String] = Set.empty): Column = e match {
    case StrLit(v) => lit(v)
    case IntLit(v) => lit(v)
    case FloatLit(v) => lit(v)
    case PatternLit(_) =>
      throw new IllegalArgumentException("bare pattern in value position")
    case Capref(n) =>
      frames.view.flatMap(_.resolve(n)).headOption match {
        case Some((c, _)) => c
        case None => throw new IllegalArgumentException(
          s"unresolved capref $$$n in ${program.name}")
      }
    case MetricRead(m, keys) => metricReadColumn(m, keys, frames, tReg,
      siteIdx, reading)
    case Binop(op, l, r) =>
      lazy val lc = exprColumn(l, frames, tReg, siteIdx, reading)
      lazy val rc = exprColumn(r, frames, tReg, siteIdx, reading)
      op match {
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => if (irType(e, frames) == LongType) lc.cast(LongType) / rc.cast(LongType) else lc / rc
        case "%" => pmod(lc, rc)
        case "**" =>
          if (irType(e, frames) == LongType) pow(lc, rc).cast(LongType)
          else pow(lc, rc)
        case "&" => lc.bitwiseAND(rc)
        case "|" => lc.bitwiseOR(rc)
        case "^" => lc.bitwiseXOR(rc)
        case "<<" => call_function("shiftleft", lc, rc)
        case ">>" => call_function("shiftright", lc, rc)
        case "<" => lc < rc
        case "<=" => lc <= rc
        case ">" => lc > rc
        case ">=" => lc >= rc
        case "==" => lc === rc
        case "!=" => lc =!= rc
        case "&&" => lc && rc
        case "||" => lc || rc
        case "=~" => r match {
          case PatternLit(re2) => lc.rlike(Re2.parse(re2).java)
          case _ => throw new IllegalArgumentException("=~ needs pattern")
        }
        case "!~" => r match {
          case PatternLit(re2) => !lc.rlike(Re2.parse(re2).java)
          case _ => throw new IllegalArgumentException("!~ needs pattern")
        }
        case other => throw new IllegalArgumentException(s"binop $other")
      }
    case Unop("!", x) => !exprColumn(x, frames, tReg, siteIdx, reading)
    case Unop("-", x) => -exprColumn(x, frames, tReg, siteIdx, reading)
    case Unop("~", x) =>
      exprColumn(x, frames, tReg, siteIdx, reading).bitwiseXOR(lit(-1L))
    case Unop(op, _) => throw new IllegalArgumentException(s"unop $op")
    case Call(fn, args) =>
      def a(i: Int) = exprColumn(args(i), frames, tReg, siteIdx, reading)
      fn match {
        case "timestamp" =>
          coalesce(unix_timestamp(tReg),
            unix_timestamp(current_timestamp()))
        case "len" => length(a(0)).cast(LongType)
        case "tolower" => lower(a(0))
        case "getfilename" => col("filename")
        case "strtol" => args(1) match {
          case IntLit(base) => conv(a(0), base.toInt, 10).cast(LongType)
          case _ => throw new IllegalArgumentException("strtol base literal")
        }
        case "subst" => args(0) match {
          case PatternLit(re2) =>
            // regex subst with LITERAL replacement (vm.go:953)
            regexp_replace(a(2), lit(Re2.parse(re2).java),
              lit(java.util.regex.Matcher
                .quoteReplacement(litString(args(1)))))
          case _ => replaceLiteral(a(2), a(0), a(1))
        }
        case "int" => a(0).cast(LongType)
        case "float" => a(0).cast(DoubleType)
        case "string" => a(0).cast(StringType)
        case other => throw new IllegalArgumentException(s"builtin $other")
      }
  }

  private def litString(e: Expr): String = e match {
    case StrLit(s) => s
    case other => throw new IllegalArgumentException(
      s"expected string literal, got $other")
  }

  private def replaceLiteral(s: Column, oldS: Column, newS: Column): Column =
    org.apache.spark.sql.functions.replace(s, oldS, newS)

  /** Cross-line metric read: running last-written value for this key. */
  private def metricReadColumn(metric: String, keys: Seq[Expr],
      frames: List[Frame], tReg: Column, siteIdx: Int,
      reading: Set[String]): Column = {
    if (reading.contains(metric))
      throw new IllegalArgumentException(
        s"cyclic metric read through $metric")
    val writes = sites.filter(s => s.metric.name == metric)
      .filter(s => s.op == OpSet || s.op == OpDel).toSeq
    if (writes.isEmpty) return zeroOf(metricType(metric))
    if (sites.exists(s => s.metric.name == metric && s.op == OpInc))
      throw new IllegalArgumentException(
        s"reads of '++'-updated metric $metric not supported")

    def writeVal(s: Site): Column = s.op match {
      case OpDel => zeroOf(metricType(metric)) // fresh datum after delete
      case _ => exprColumn(s.valueIr.get, s.frames, s.timeReg, s.idx,
        reading + metric).cast(metricType(metric))
    }
    def whens(ss: Seq[Site]): Option[Column] =
      ss.sortBy(-_.idx).map(s => when(s.cond, writeVal(s)))
        .reduceOption(coalesce(_, _))

    val keyCols = keys.map(k =>
      exprColumn(k, frames, tReg, siteIdx, reading).cast(StringType))
    val w = Window.partitionBy(keyCols: _*).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevRows = whens(writes).map(c =>
      last(c, ignoreNulls = true).over(w))
    val sameLine =
      if (siteIdx < 0) None else whens(writes.filter(_.idx < siteIdx))
    coalesce((sameLine.toSeq ++ prevRows.toSeq :+
      zeroOf(metricType(metric))): _*)
  }

  private def zeroOf(t: DataType): Column = t match {
    case LongType => lit(0L)
    case DoubleType => lit(0.0)
    case _ => lit("")
  }

  // ---------- phase 3: per-metric aggregation ----------

  /** ordKey = global line order refined by site index, so same-line
    * updates resolve in statement order.
    */
  private def ordKey(idx: Int): Column = col("ord") * 1024 + lit(idx)

  def metricFrame(decl: Ir.MetricDecl): DataFrame = {
    val mSites = sites.filter(_.metric.name == decl.name)
    val updates = mSites.filter(_.op != OpDel)
    val dels = mSites.filter(_.op == OpDel).filter(_.afterSeconds.isEmpty)
    val vt = metricType(decl.name)

    def siteFrame(s: Site): DataFrame = {
      val labelCols = s.keys.zipWithIndex.map { case (k, i) =>
        exprColumn(k, s.frames, s.timeReg, s.idx).cast(StringType)
          .as(s"k$i")
      }
      val delta = s.op match {
        case OpInc => exprColumn(s.valueIr.get, s.frames, s.timeReg, s.idx)
          .cast(vt)
        case OpSet => exprColumn(s.valueIr.get, s.frames, s.timeReg, s.idx)
          .cast(vt)
        case OpDel => zeroOf(vt)
      }
      // project BEFORE filtering: delta may contain a cross-line metric
      // read whose window must see every line, not just this site's
      df.select((labelCols :+ delta.as("v") :+
          s.timeReg.as("ts") :+ ordKey(s.idx).as("ordk") :+
          coalesce(s.cond, lit(false)).as("__cond")): _*)
        .filter(col("__cond")).drop("__cond")
        // a null value means a failed capref conversion — the reference
        // aborts the line (vm.go:97-129); drop the update
        .filter(col("v").isNotNull || lit(s.op == OpDel))
    }

    val keyNames = decl.keys.indices.map(i => s"k$i")
    val unioned = updates.map(siteFrame).reduceOption(_ unionAll _)

    val afterDel: Option[DataFrame] = unioned.map { u =>
      if (dels.isEmpty) u
      else {
        val delDf = dels.map(siteFrame).reduce(_ unionAll _)
          .groupBy(keyNames.map(col): _*)
          .agg(max("ordk").as("__del_ord"))
        if (keyNames.isEmpty) {
          u.crossJoin(broadcast(delDf))
            .filter(col("ordk") > col("__del_ord"))
            .drop("__del_ord")
        } else {
          u.join(delDf, keyNames, "left")
            .filter(col("__del_ord").isNull ||
              col("ordk") > col("__del_ord"))
            .drop("__del_ord")
        }
      }
    }

    val agg: Option[DataFrame] = afterDel.map { u =>
      val aggs = decl.kind match {
        case Ir.Counter =>
          Seq(sum("v").as("value"), max_by(col("ts"), col("ordk")).as("ts"))
        case Ir.Histogram =>
          val buckets = decl.buckets
          val bucketCounts = buckets.zipWithIndex.map { case (b, i) =>
            sum(when(col("v") <= b &&
              buckets.take(i).foldLeft(lit(true))((acc, lo) =>
                acc && col("v") > lo), 1L).otherwise(0L)).as(s"bucket_$i")
          }
          bucketCounts ++ Seq(
            sum(when(col("v") > buckets.last, 1L).otherwise(0L))
              .as("bucket_inf"),
            sum("v").as("value"), count(lit(1)).as("obs_count"),
            max_by(col("ts"), col("ordk")).as("ts"))
        case _ => // gauge / timer / text: last write wins by arrival
          Seq(max_by(col("v"), col("ordk")).as("value"),
            max_by(col("ts"), col("ordk")).as("ts"))
      }
      if (keyNames.isEmpty) {
        val g = u.agg(aggs.head, aggs.tail: _*)
        if (decl.kind == Ir.Counter)
          // never-updated scalar counters export 0 @ epoch-0
          // (codegen.go:109-126; golden/reader.go:107-119); an updated
          // counter with an unset time register keeps a null ts (the
          // VM's zero time.Time)
          g.select(
            coalesce(col("value"), lit(0L).cast(vt)).as("value"),
            when(col("value").isNull, timestamp_seconds(lit(0)))
              .otherwise(col("ts")).as("ts"))
        else g.filter(col("value").isNotNull)
      } else {
        u.groupBy(keyNames.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
    }

    agg.getOrElse {
      // metric never updated: scalar counters still export a zero cell
      if (decl.keys.isEmpty && decl.kind == Ir.Counter)
        df.sparkSession.range(1)
          .select(lit(0L).cast(vt).as("value"),
            timestamp_seconds(lit(0)).as("ts"))
      else
        df.sparkSession.emptyDataFrame
    }
  }

  /** Full exported snapshot: one row per metric cell. */
  def snapshot(): DataFrame = {
    val frames = program.decls.filter(!_.hidden).map { decl =>
      val vt = metricType(decl.name)
      val mf = metricFrame(decl)
      if (mf.columns.isEmpty) None
      else Some {
        val labelMap =
          if (decl.keys.isEmpty) typedLit(Map.empty[String, String])
          else map(decl.keys.zipWithIndex.flatMap { case (k, i) =>
            Seq(lit(k), col(s"k$i"))
          }: _*)
        mf.select(
          lit(program.name).as("program"),
          lit(decl.exportName).as("name"),
          lit(kindName(decl.kind)).as("kind"),
          lit(typeName(vt)).as("type"),
          labelMap.as("labels"),
          (if (vt == LongType) col("value") else lit(null).cast(LongType))
            .as("ival"),
          (if (vt == DoubleType) col("value")
           else lit(null).cast(DoubleType)).as("fval"),
          (if (vt == StringType) col("value")
           else lit(null).cast(StringType)).as("sval"),
          // epoch micros as a long: java.sql.Timestamp round-trips
          // pre-1582 dates through the hybrid Julian calendar
          unix_micros(col("ts")).as("ts_micros"))
      }
    }
    frames.flatten.reduceOption(_ unionAll _).getOrElse(
      df.sparkSession.emptyDataFrame)
  }

  private def kindName(k: Ir.Kind): String = k match {
    case Ir.Counter => "counter"
    case Ir.Gauge => "gauge"
    case Ir.Timer => "timer"
    case Ir.Text => "text"
    case Ir.Histogram => "histogram"
  }

  private def typeName(t: DataType): String = t match {
    case LongType => "Int"
    case DoubleType => "Float"
    case _ => "String"
  }
}
