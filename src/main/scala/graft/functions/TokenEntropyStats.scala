package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `TokenEntropyStats(text)` — the integer inputs of a per-document
  * token-distribution (Shannon) entropy in ONE compiled scan:
  * struct<`tokens`, `distinct_tokens`, `mln_tokens`, `mln_sum`> with
  * every `ln` pre-quantized to milli-micro-nats ([[UnigramLogProb]]'s
  * fixed-point convention, `round(ln(c) * 1e6)` as a long):
  *
  *   H ≈ (mln_tokens − mln_sum / tokens) / 1e6   nats
  *
  * from `H = ln(n) − (Σ_w c_w·ln(c_w)) / n` over per-token counts
  * c_w. Low entropy flags templated/repetitive documents (a stronger
  * cousin of the modal-token share in [[WordStats]]: it sees the
  * WHOLE distribution, not just the mode); it is the standard
  * diversity axis next to the Gopher rules and the unigram-LM score.
  * Quantizing each `ln` keeps every cross-engine and cross-partition
  * aggregate integer-exact — the final division is one deterministic
  * double op on exact integers, so oracles reproduce it bit-for-bit.
  *
  * Tokenization matches [[WordStats]] (single ASCII spaces, empties
  * dropped). `mln_sum` is bounded by `tokens · mln(tokens)` (≈1.2e13
  * for a million-token document) — far inside both the long range and
  * the double-exact integer range the downstream division relies on.
  */
case class TokenEntropyStats(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("tokens", LongType, nullable = false),
    StructField("distinct_tokens", LongType, nullable = false),
    StructField("mln_tokens", LongType, nullable = false),
    StructField("mln_sum", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    TokenEntropyStats.compute(s.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenEntropyStats.compute($s);")
}

object TokenEntropyStats {

  /** shared by interpreted and codegen paths. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[String, Array[Long]](64)
    var tokens = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      var j = str.indexOf(' ', i)
      if (j < 0) j = n
      if (j > i) {
        tokens += 1
        val tok = str.substring(i, j)
        val c = counts.get(tok)
        if (c == null) counts.put(tok, Array(1L)) else c(0) += 1
      }
      i = j + 1
    }
    var mlnSum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      mlnSum += c * UnigramLogProb.mln(c)
    }
    val mlnTokens = if (tokens == 0L) 0L else UnigramLogProb.mln(tokens)
    new GenericInternalRow(
      Array[Any](tokens, counts.size.toLong, mlnTokens, mlnSum))
  }

  /** Column-level API. */
  def apply(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      TokenEntropyStats(
        org.apache.spark.sql.GraftBridge.expression(text)))
}
