package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `MaxTokenRun(text)` — length of the longest run of CONSECUTIVE
  * identical tokens, the stutter signal repetition filters cut on
  * ("buy buy buy buy …" scores high where the modal-token count
  * [[WordStats]] exposes would also fire on benign spread-out
  * repeats). One compiled scan, no arrays materialized: tokens are
  * compared against the previous token in place.
  *
  * Tokenization matches [[WordStats]] (single ASCII spaces, empties
  * dropped); 0 for token-less text.
  */
case class MaxTokenRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    MaxTokenRun.compute(s.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.MaxTokenRun.compute($s);")
}

object MaxTokenRun {

  def compute(s: UTF8String): Long = {
    val str = s.toString
    var best = 0L
    var run = 0L
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    val n = str.length
    while (i < n) {
      var j = str.indexOf(' ', i)
      if (j < 0) j = n
      if (j > i) {
        val same = prevStart >= 0 && (j - i) == (prevEnd - prevStart) &&
          str.regionMatches(i, str, prevStart, j - i)
        run = if (same) run + 1 else 1
        if (run > best) best = run
        prevStart = i
        prevEnd = j
      }
      i = j + 1
    }
    best
  }

  def apply(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      MaxTokenRun(org.apache.spark.sql.GraftBridge.expression(text)))
}
