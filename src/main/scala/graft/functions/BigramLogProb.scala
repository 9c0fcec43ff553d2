package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `BigramLogProb(text, pairVocab, leftVocab)` — per-document bigram
  * conditional language-model score in ONE compiled token scan:
  * struct<`pairs`, `mln_sum`> where `mln_sum` =
  * Σ_adjacent-pairs (mln(count(w1 w2)) − mln(count(w1 as left))) over
  * FIXED-POINT vocabularies (milli-micro-nats, the
  * [[UnigramLogProb.mln]] quantization). This is the conditional
  * ln P(w2|w1) = ln c(w1,w2) − ln c(w1·) structure of the KenLM-style
  * quality filters, at bigram order; out-of-vocabulary terms score
  * ln(1) = 0 INDEPENDENTLY on each side (the count-1 floor), so the
  * score is a pure lookup-sum and integer-exact everywhere.
  *
  * Tokenization matches [[WordStats]] (single ASCII spaces, empties
  * dropped). No arrays materialize: the scan keeps only the previous
  * token's offsets.
  */
case class BigramLogProb(child: Expression,
    pairVocab: java.util.HashMap[String, java.lang.Long],
    leftVocab: java.util.HashMap[String, java.lang.Long])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("pairs", LongType, nullable = false),
    StructField("mln_sum", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    BigramLogProb.compute(s.asInstanceOf[UTF8String], pairVocab,
      leftVocab)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pvRef = ctx.addReferenceObj("pairVocab", pairVocab,
      "java.util.HashMap")
    val lvRef = ctx.addReferenceObj("leftVocab", leftVocab,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BigramLogProb.compute($s, " +
        s"$pvRef, $lvRef);")
  }
}

object BigramLogProb {

  def compute(s: UTF8String,
      pairVocab: java.util.HashMap[String, java.lang.Long],
      leftVocab: java.util.HashMap[String, java.lang.Long])
      : InternalRow = {
    val str = s.toString
    var pairs = 0L
    var sum = 0L
    var prev: String = null
    var i = 0
    val n = str.length
    while (i < n) {
      var j = str.indexOf(' ', i)
      if (j < 0) j = n
      if (j > i) {
        val tok = str.substring(i, j)
        if (prev != null) {
          pairs += 1
          val p = pairVocab.get(prev + " " + tok)
          if (p != null) sum += p.longValue()
          val l = leftVocab.get(prev)
          if (l != null) sum -= l.longValue()
        }
        prev = tok
      }
      i = j + 1
    }
    new GenericInternalRow(Array[Any](pairs, sum))
  }

  /** Column-level API: vocabs map token(s) → quantized ln(count). */
  def apply(text: Column, pairVocab: Map[String, Long],
      leftVocab: Map[String, Long]): Column =
    org.apache.spark.sql.GraftBridge.column(
      BigramLogProb(
        org.apache.spark.sql.GraftBridge.expression(text),
        UnigramLogProb.toJava(pairVocab),
        UnigramLogProb.toJava(leftVocab)))
}
