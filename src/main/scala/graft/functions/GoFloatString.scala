package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.mtail.GoFmt

/** Float→string with the VM's `F2s` semantics: Go shortest `%g`
  * (`internal/runtime/vm/vm.go:889-896`), the conversion codegen emits
  * for `string($f)`, string-unified `+`, and float metric label keys
  * (`internal/runtime/compiler/codegen/codegen.go:273-280,602`). Spark's
  * double→string cast renders Java style ("1000000.0", "1.0E7") where
  * Go says "1e+06", so label values and concatenated strings would
  * diverge from the reference without this.
  */
case class GoFloatString(child: Expression, upper: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(GoFmt.g(input.asInstanceOf[Double], upper))

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.mtail.GoFmt$$.MODULE$$.g($c, $upper));
       """.stripMargin
    })
}

object GoFloatString {
  def apply(c: Column): Column = apply(c, upper = false)

  /** `upper` = the runtime PopString 'G' coercion (text assignment);
    * default is the F2s conversion's lowercase `%g`.
    */
  def apply(c: Column, upper: Boolean): Column =
    org.apache.spark.sql.GraftBridge.column(
      GoFloatString(org.apache.spark.sql.GraftBridge.expression(c),
        upper))
}
