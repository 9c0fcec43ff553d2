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
case class GoStrptime(child: Expression, layout: String, defaultYear: Int,
    zoneId: String = "UTC")
    extends UnaryExpression {

  /** the reference's -override_timezone (options.go:98-109): naive
    * timestamps are interpreted in this zone (vm.go:312-313's
    * ParseInLocation); layouts carrying a zone directive are
    * unaffected. Held as the zone NAME so the expression stays
    * serializable; resolved once per task.
    */
  @transient private lazy val zone = java.time.ZoneId.of(zoneId)

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GoTime.parse(layout, input.asInstanceOf[UTF8String].toString,
      defaultYear, zone)
      .map(java.lang.Long.valueOf).orNull

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val layoutRef = ctx.addReferenceObj("layout", layout, "java.lang.String")
    val zoneRef = ctx.addReferenceObj("zone", zone, "java.time.ZoneId")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |scala.Option<Object> r = graft.mtail.GoTime$$.MODULE$$.parse(
         |  (String) $layoutRef, $c.toString(), $defaultYear,
         |  (java.time.ZoneId) $zoneRef);
         |if (r.isEmpty()) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) r.get()).longValue(); }
       """.stripMargin
    })
  }
}

object GoStrptime {
  // no default here: two overloaded applys (this and the case-class
  // one) may not both carry defaults
  def apply(s: Column, layout: String, defaultYear: Int,
      zoneId: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      GoStrptime(org.apache.spark.sql.GraftBridge.expression(s), layout,
        defaultYear, zoneId))
}
