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

/** `GramHashes(text, n)` — distinct word n-gram hashes of a document in
  * one pass: ARRAY<BIGINT> of xxhash64("w1 w2 … wn", seed 42) per
  * distinct window, first-occurrence order.
  *
  * Replaces the Column chain `explode(array_distinct(transform(
  * sequence(…), i → concat_ws(" ", slice(words, i, n)))))` +
  * `xxhash64(gram)`, which dominated the dedup pipelines: the chain
  * allocates a sliced array and a gram string per window per pass, and
  * the pair pipelines scan the gram relation three times (set sizes +
  * both join sides) — ~3 s per scan at sf0.1. This node tokenizes
  * once, reuses one StringBuilder for the window bytes, and hashes
  * directly, so regeneration per scan is cheap.
  *
  * Parity: tokens come from the same `\s+` split with Java limit -1
  * (Spark's split keeps trailing empty tokens), windows join with a
  * single space, the all-empty gram is dropped, and the hash equals
  * Spark's `xxhash64` column function (XXH64, seed 42) — so results
  * are interchangeable with the replaced formulation.
  */
case class GramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else GramHashes.compute(v.asInstanceOf[UTF8String].toString, n)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GramHashes.compute(
         |  $c.toString(), $n);
         |""".stripMargin)
}

object GramHashes {

  /** shared by interpreted and codegen paths. */
  def compute(text: String, n: Int): GenericArrayData = {
    val words = text.split("\\s+", -1)
    if (words.length < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](words.length - n + 1)
    var m = 0
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
      if (sb.length > 0) { // drop the all-empty gram
        val bytes = sb.toString.getBytes(StandardCharsets.UTF_8)
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 42L)
        if (seen.add(h)) { out(m) = h; m += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Column-level API. */
  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      GramHashes(
        org.apache.spark.sql.GraftBridge.expression(text), n))
}
