package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `WordStats(text)` — one-pass per-document token statistics as a
  * single struct: `words` (non-empty space-separated tokens),
  * `distinct_words`, `top_count` (highest single-token frequency —
  * the Gopher-style repetition signal), and `char_sum` (total token
  * characters, for mean word length).
  *
  * One compact node instead of the `split` → `array_distinct` →
  * `transform`/`filter` Column pipeline for the same numbers: the
  * higher-order-function route is O(words²) through interpreted
  * lambda calls (Spark's HOF expressions are CodegenFallback) and
  * materializes three intermediate arrays per row; this node computes
  * all four statistics in one compiled token scan with a single hash
  * map, keeping the quality-filter stage map-side and codegen-clean
  * at corpus scale. Shared subexpression elimination folds the
  * repeated `getField` accesses into one evaluation per row.
  *
  * Tokenization contract (what the DuckDB oracle mirrors with
  * `list_filter(string_split(text, ' '), x -> x <> '')`): split on
  * single ASCII spaces, drop empty tokens, length in UTF-16 chars
  * (identical to codepoints and bytes for ASCII corpora).
  */
case class WordStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("words", LongType, nullable = false),
    StructField("distinct_words", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    WordStats.compute(s.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WordStats.compute($s);")
}

object WordStats {

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[String, java.lang.Long]()
    var words = 0L
    var chars = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      var j = str.indexOf(' ', i)
      if (j < 0) j = n
      if (j > i) {
        val tok = str.substring(i, j)
        words += 1
        chars += tok.length
        val prev = counts.get(tok)
        counts.put(tok, if (prev == null) 1L else prev + 1L)
      }
      i = j + 1
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val v = it.next()
      if (v > top) top = v
    }
    new GenericInternalRow(
      Array[Any](words, counts.size.toLong, top, chars))
  }

  /** Column-level API. */
  def apply(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      WordStats(org.apache.spark.sql.GraftBridge.expression(text)))
}
