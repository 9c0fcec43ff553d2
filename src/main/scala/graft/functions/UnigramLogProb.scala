package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `UnigramLogProb(text, vocab)` — per-document unigram language-model
  * score in ONE compiled token scan: struct<`words`, `mln_sum`> where
  * `mln_sum` = Σ_tokens mln(token) over a FIXED-POINT vocabulary
  * (milli-micro-nats: `round(ln(count) * 1e6)` as a long). The
  * CCNet-style quality signal: a document's per-token log-probability
  * under the corpus unigram LM is
  * `(mln_sum − words * round(ln(total)*1e6)) / (words * 1e6)`.
  *
  * The LM is QUANTIZED to integers at build time, so every downstream
  * aggregate (per-doc score, per-source sums, threshold flags) is
  * integer-exact — no float-summation-order divergence between
  * engines, executors, or partitionings; external engines reproduce
  * the score bit-for-bit from the same counts. Out-of-vocabulary
  * tokens score `ln(1) = 0`, i.e. the count-1 floor.
  *
  * Tokenization matches [[WordStats]] (single ASCII spaces, empties
  * dropped) so one corpus contract serves every text statistic.
  */
case class UnigramLogProb(child: Expression,
    vocab: java.util.HashMap[String, java.lang.Long])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("words", LongType, nullable = false),
    StructField("mln_sum", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    UnigramLogProb.compute(s.asInstanceOf[UTF8String], vocab)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocab", vocab,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnigramLogProb.compute($s, " +
        s"$vocabRef);")
  }
}

object UnigramLogProb {

  /** fixed-point scale: 1e6 units per nat. */
  val Scale: Double = 1e6

  /** quantize a raw token count to milli-micro-nats (`ln` is ≥ 0 for
    * counts ≥ 1, so half-up rounding here equals DuckDB's
    * half-away-from-zero).
    */
  def mln(count: Long): Long = math.round(math.log(count.toDouble) * Scale)

  def compute(s: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Long]): InternalRow = {
    val str = s.toString
    var words = 0L
    var sum = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      var j = str.indexOf(' ', i)
      if (j < 0) j = n
      if (j > i) {
        words += 1
        val v = vocab.get(str.substring(i, j))
        if (v != null) sum += v.longValue()
      }
      i = j + 1
    }
    new GenericInternalRow(Array[Any](words, sum))
  }

  /** Map → pre-sized boxed HashMap, shared with [[BigramLogProb]]. */
  private[functions] def toJava(m: Map[String, Long])
      : java.util.HashMap[String, java.lang.Long] = {
    val hm = new java.util.HashMap[String, java.lang.Long](m.size * 2)
    m.foreach { case (k, v) => hm.put(k, java.lang.Long.valueOf(v)) }
    hm
  }

  /** Column-level API: `vocab` maps token → quantized ln(count). */
  def apply(text: Column, vocab: Map[String, Long]): Column =
    org.apache.spark.sql.GraftBridge.column(
      UnigramLogProb(
        org.apache.spark.sql.GraftBridge.expression(text),
        toJava(vocab)))
}
