package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.mtail.Re2

/** `RegexExtractStruct(line, pattern)` — one compiled regex, one pass,
  * all capture groups extracted as typed struct fields:
  *
  *   STRUCT<matched BOOLEAN, g1 T1, g2 T2, …>
  *
  * replacing mtail's Match + Capref + fused S2i/S2f opcode sequence
  * (`internal/runtime/vm/vm.go:356-362,610-629,832-871`) with a single
  * codegen'd Catalyst expression. Field types follow the reference's
  * capture-group inference (types.go:539-630, ported in [[Re2]]); numeric
  * fields that fail conversion come back null, mirroring the VM's
  * "log error and abort line" rule (vm.go:97-129) — downstream plans
  * filter on null.
  *
  * Named groups become fields g<i> with the name tracked at plan level
  * (Java named-group syntax rejects underscores, so names never reach the
  * JVM regex). The pattern is translated from RE2 syntax at construction.
  *
  * Codegen: emits a direct Matcher call against a compiled Pattern held in
  * a mutable-state slot — stays inside whole-stage codegen, no fallback.
  */
case class RegexExtractStruct(child: Expression, re2Pattern: String,
    withG0: Boolean = false) extends UnaryExpression {

  @transient private lazy val parsed: Re2.Parsed = Re2.parse(re2Pattern)
  @transient private lazy val pattern: Pattern = Pattern.compile(parsed.java)

  /** `withG0` prepends group 0 (the whole match, `$0` — registered
    * like any capref by the reference checker). Only programs that
    * actually reference $0 pay the per-match whole-string copy.
    */
  // lazy vals, not defs: catalyst calls dataType thousands of times
  // during analysis/planning, and type inference walks the regex AST —
  // recomputing it per call made PLANNING (not execution) the dominant
  // cost of asof-heavy programs
  @transient private lazy val capIdxs: Seq[Int] =
    if (withG0) 0 +: parsed.groups.map(_.index)
    else parsed.groups.map(_.index)

  @transient private lazy val capTypes: Seq[DataType] =
    capIdxs.map(i =>
      Re2.inferCaprefType(parsed, i) match {
        case Re2.CapInt => LongType
        case Re2.CapFloat => DoubleType
        case Re2.CapString => StringType
      })

  @transient override lazy val dataType: DataType = StructType(
    StructField("matched", BooleanType, nullable = false) +:
      capIdxs.zip(capTypes).map {
        case (i, t) => StructField(s"g$i", t, nullable = true)
      })

  override def nullable: Boolean = false

  /** a null subject (e.g. an unmatched optional group fed to `=~`)
    * simply doesn't match — never a null struct, so the output is
    * genuinely non-nullable and parents skip null checks safely.
    */
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) RegexExtractStruct.noMatch(capTypes.length)
    else RegexExtractStruct.evalMatch(
      pattern.matcher(v.asInstanceOf[UTF8String].toString),
      capTypes.toArray, if (withG0) 0 else 1)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", pattern,
      classOf[Pattern].getName)
    val typesRef = ctx.addReferenceObj("types", capTypes.toArray,
      "org.apache.spark.sql.types.DataType[]")
    val childGen = child.genCode(ctx)
    val nullCheck =
      if (child.nullable) s"${childGen.isNull}" else "false"
    val code =
      code"""
         |${childGen.code}
         |InternalRow ${ev.value};
         |if ($nullCheck) {
         |  ${ev.value} = graft.functions.RegexExtractStruct.noMatch(
         |    ((org.apache.spark.sql.types.DataType[]) $typesRef).length);
         |} else {
         |  ${ev.value} = graft.functions.RegexExtractStruct.evalMatch(
         |    ((java.util.regex.Pattern) $patRef)
         |      .matcher(${childGen.value}.toString()),
         |    (org.apache.spark.sql.types.DataType[]) $typesRef,
         |    ${if (withG0) 0 else 1});
         |}
       """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }
}

object RegexExtractStruct {

  /** row for "no match": matched=false, all groups null. */
  def noMatch(nGroups: Int): InternalRow = {
    val values = new Array[Any](nGroups + 1)
    values(0) = false
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  /** Shared by interpreted and codegen paths. Unmatched line → row with
    * matched=false and null groups (the struct itself is never null so
    * enclosing-condition logic stays simple three-valued-safe).
    */
  def evalMatch(m: Matcher, types: Array[DataType],
      base: Int): InternalRow = {
    val n = types.length
    val values = new Array[Any](n + 1)
    if (!m.find()) {
      values(0) = false
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
    } else {
      values(0) = true
      var i = 0
      while (i < n) {
        val s = m.group(base + i) // base 0 ⇒ slot 0 = whole match
        values(i + 1) =
          if (s == null) null
          else types(i) match {
            case LongType =>
              try java.lang.Long.valueOf(java.lang.Long.parseLong(s))
              catch { case _: NumberFormatException => null }
            case DoubleType =>
              try java.lang.Double.valueOf(java.lang.Double.parseDouble(s))
              catch { case _: NumberFormatException => null }
            case _ => UTF8String.fromString(s)
          }
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
    }
  }

  /** Column-level API: extract all groups of an RE2 pattern. */
  def apply(line: Column, re2Pattern: String): Column =
    apply(line, re2Pattern, withG0 = false)

  def apply(line: Column, re2Pattern: String, withG0: Boolean): Column =
    org.apache.spark.sql.GraftBridge.column(
      RegexExtractStruct(
        org.apache.spark.sql.GraftBridge.expression(line), re2Pattern,
        withG0))
}
