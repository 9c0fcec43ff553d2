package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `MinHashSigs(text, n, k)` — the document's full k-permutation
  * MinHash signature in ONE pass: ARRAY<BIGINT> of length k, or NULL
  * for a document with no n-grams (which the Column formulation
  * dropped at its groupBy).
  *
  * Replaces explode([[GramHashes]]) → groupBy(id).agg(k × min(
  * xxhash64(i, gh))): that shape shuffles one row per GRAM and runs k
  * min-aggregates per document, making signature generation the
  * pipeline's widest shuffle. This node reuses [[GramHashes.compute]]
  * for the gram hashes and folds the k minima in a tight loop —
  * signatures now cost one map-side scan; the banded candidate join
  * is the only shuffle left in minhashLshPairs.
  *
  * Hash parity: family member i of gram hash g is exactly Spark's
  * `xxhash64(lit(i), g)` — XXH64.hashLong(g, XXH64.hashInt(i, 42)) —
  * and min is the same signed-long minimum, so signatures (and
  * therefore candidate sets and the oracle-checked output) are
  * bit-identical to the replaced formulation.
  */
case class MinHashSigs(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1 && k >= 1, "need n-gram size >= 1 and k >= 1")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashSigs.compute(v.asInstanceOf[UTF8String].toString, n, k)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sigs")
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.functions.MinHashSigs.compute($c.toString(), $n, $k);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
         |""".stripMargin)
  }
}

object MinHashSigs {

  /** shared by interpreted and codegen paths; null = no grams. */
  def compute(text: String, n: Int, k: Int): GenericArrayData = {
    val ghs = GramHashes.compute(text, n)
    val m = ghs.numElements()
    if (m == 0) return null
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seed = XXH64.hashInt(i, 42L)
      var best = Long.MaxValue
      var g = 0
      while (g < m) {
        val h = XXH64.hashLong(ghs.getLong(g), seed)
        if (h < best) best = h
        g += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API. */
  def apply(text: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinHashSigs(
        org.apache.spark.sql.GraftBridge.expression(text), n, k))
}
