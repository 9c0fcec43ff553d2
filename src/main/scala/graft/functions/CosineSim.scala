package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `CosineSim(a, b, dim)` — cosine similarity over the first `dim`
  * elements of two embedding arrays, as ONE compact expression node.
  *
  * Same plan-size rationale as [[HyperplaneSigs]]/[[SqDists]], plus a
  * harder constraint this node exists for: the unrolled
  * `Σ a[i]·b[i] / (√Σa[i]² · √Σb[i]²)` Column tree (3 × dim element_at
  * terms) inlined into a BroadcastNestedLoopJoin condition makes the
  * generated `bnlj_doConsume` method exceed the JVM's 64 KB bytecode
  * limit at dim ≥ ~48 — janino fails, Spark silently falls back to
  * INTERPRETED evaluation of the whole join, and the pair join runs
  * ~10× slower (measured 31 s vs 3 s on 2 000 × 64-dim rows at sf0.1).
  * A real 768-dim corpus could never compile the unrolled form at all.
  * This node loops in compiled code: O(1) plan tree, O(dim) bytecode.
  *
  * Float math parity with the unrolled form and the DuckDB oracle's
  * `list_sum`: all three accumulators start at 0.0 and add terms in
  * ascending index order — bit-identical to the left-associated chains
  * (0.0 + x == x). Reading float arrays directly (element-wise
  * `(double)` widening) equals the old `cast(arr AS array<double>)`
  * element values without materializing a converted array per pair.
  *
  * NULL parity with the unrolled element_at form under non-ANSI SQL:
  * either array NULL, shorter than dim, or with a NULL element in the
  * prefix → NULL (null propagation through + and *); zero denominator →
  * NULL (Spark's `Divide` returns NULL on a zero divisor for doubles).
  */
case class CosineSim(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  require(dim > 0, "dim must be positive")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"CosineSim needs array<float|double>, got $other")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], dim, isFloat(left), isFloat(right))

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left)
    val rf = isFloat(right)
    val boxed = ctx.freshName("cos")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double $boxed = graft.functions.CosineSim.compute(
         |  $a, $b, $dim, $lf, $rf);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
         |""".stripMargin)
  }
}

object CosineSim {

  /** shared by interpreted and codegen paths; ascending-index
    * left-fold per accumulator (see class doc for why the order
    * matters).
    */
  def compute(a: ArrayData, b: ArrayData, dim: Int, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    if (a.numElements() < dim || b.numElements() < dim) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = Math.sqrt(na) * Math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  /** Column-level API. */
  def apply(a: Column, b: Column, dim: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      CosineSim(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b), dim))
}
