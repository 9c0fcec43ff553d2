package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.mtail.GoTime

/** `strptime(s, layout)` with Go layout semantics
  * (`internal/runtime/vm/vm.go:555-589`), returning TimestampType (µs) or
  * null on mismatch — the null then propagates to the plan's "abort this
  * line" filter, mirroring the VM's runtime-error rule (vm.go:97-129).
  *
  * `defaultYear` implements the yearless-syslog current-year patch
  * (vm.go:321-330); it is fixed at plan-build time so batch replays of
  * historical logs are reproducible.
  */
case class GoStrptime(child: Expression, layout: String, defaultYear: Int)
    extends UnaryExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GoTime.parse(layout, input.asInstanceOf[UTF8String].toString, defaultYear)
      .map(java.lang.Long.valueOf).orNull

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val layoutRef = ctx.addReferenceObj("layout", layout, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |scala.Option<Object> r = graft.mtail.GoTime$$.MODULE$$.parse(
         |  (String) $layoutRef, $c.toString(), $defaultYear);
         |if (r.isEmpty()) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) r.get()).longValue(); }
       """.stripMargin
    })
  }
}

object GoStrptime {
  def apply(s: Column, layout: String, defaultYear: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      GoStrptime(org.apache.spark.sql.GraftBridge.expression(s), layout,
        defaultYear))
}
