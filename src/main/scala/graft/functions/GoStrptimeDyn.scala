package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.mtail.GoTime

/** `strptime(s, layout)` where the layout is itself a runtime
  * expression — the VM pops BOTH operands from the stack
  * (`internal/runtime/vm/vm.go:555-589`), so a non-literal layout
  * (a capref, a text metric read) is legal even though the checker can
  * only pre-validate literal ones (checker.go:801-825). Same null-on-
  * mismatch → abort-the-line contract as the literal [[GoStrptime]],
  * which stays the fast path (per-task layout object, compile-time
  * validation).
  */
case class GoStrptimeDyn(left: Expression, right: Expression,
    defaultYear: Int, zoneId: String = "UTC")
    extends BinaryExpression {

  @transient private lazy val zone = java.time.ZoneId.of(zoneId)

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true

  override def nullSafeEval(value: Any, layout: Any): Any =
    GoTime.parse(layout.asInstanceOf[UTF8String].toString,
      value.asInstanceOf[UTF8String].toString, defaultYear, zone)
      .map(java.lang.Long.valueOf).orNull

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val zoneRef = ctx.addReferenceObj("zone", zone, "java.time.ZoneId")
    nullSafeCodeGen(ctx, ev, (v, l) => {
      s"""
         |scala.Option<Object> r = graft.mtail.GoTime$$.MODULE$$.parse(
         |  $l.toString(), $v.toString(), $defaultYear,
         |  (java.time.ZoneId) $zoneRef);
         |if (r.isEmpty()) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) r.get()).longValue(); }
       """.stripMargin
    })
  }
}

object GoStrptimeDyn {
  def apply(value: Column, layout: Column, defaultYear: Int,
      zoneId: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      GoStrptimeDyn(org.apache.spark.sql.GraftBridge.expression(value),
        org.apache.spark.sql.GraftBridge.expression(layout),
        defaultYear, zoneId))
}
