package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd unary expression — the
  * canonical-composition pass every text corpus runs before hashing or
  * deduplicating (the same logical text arrives from the web in both
  * composed and decomposed forms; un-normalized corpora silently
  * under-deduplicate). Spark ships no normalization builtin, so this
  * wraps `java.text.Normalizer` (ICU-equivalent for NFC) in a
  * whole-stage-codegen-friendly node: one static call per row, no UDF
  * serialization, stays inside the fused scan at 100 TB.
  *
  * The common case (already-NFC ASCII or precomposed text) is a cheap
  * `isNormalized` scan that returns the input UTF8String UNCOPIED —
  * normalization only pays the String round-trip on rows that actually
  * change.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.NfcNormalize$$.MODULE$$.nfc($c);
       """.stripMargin
    })
}

object NfcNormalize {
  /** NFC-normalize a UTF8String, returning the input object unchanged
    * when it is already normalized (the overwhelmingly common case).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      NfcNormalize(org.apache.spark.sql.GraftBridge.expression(c)))
}
