package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `PosGramHashes(text, n)` — POSITIONAL word n-gram hashes of a
  * document in one pass: ARRAY<BIGINT> with element i =
  * xxhash64("w_i w_i+1 … w_i+n-1", seed 42), one per window, ALL
  * positions kept (no distinct, no empty-gram drop) — `posexplode`
  * over the result yields the (pos, gh) stream the span-level dedup
  * operators consume, where position and multiplicity ARE the signal.
  *
  * The [[GramHashes]] sibling serves the SET pipelines (distinct
  * grams); this one replaces the Column chain
  * `posexplode(transform(sequence(…), i → xxhash64(concat_ws(" ",
  * slice(words, i, n)))))`, whose higher-order functions evaluate
  * interpreted and allocate a sliced array plus a gram string per
  * window — measured 24× slower than the compiled one-pass walk on
  * the sf0.1 battery. Tokenization parity with the chain (and the
  * DuckDB oracle CTEs): `\s+` split with Java limit -1, single-space
  * join, all-empty grams KEPT (they occupy positions and can be
  * duplicated), hash equal to Spark's `xxhash64` (XXH64, seed 42).
  */
case class PosGramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PosGramHashes.compute(v.asInstanceOf[UTF8String].toString, n)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.PosGramHashes.compute(
         |  $c.toString(), $n);
         |""".stripMargin)
}

object PosGramHashes {

  /** shared by interpreted and codegen paths. */
  def compute(text: String, n: Int): GenericArrayData = {
    val words = text.split("\\s+", -1)
    if (words.length < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](words.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val bytes = sb.toString.getBytes(StandardCharsets.UTF_8)
      out(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API. */
  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      PosGramHashes(
        org.apache.spark.sql.GraftBridge.expression(text), n))
}
