package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `SqDists(embedding, cents)` — squared-L2 distance from an embedding
  * to each of k constant centroids, as ONE compact expression node
  * returning ARRAY<DOUBLE> of length k.
  *
  * Same plan-size rationale as [[HyperplaneSigs]]: the unrolled k × dim
  * `(e[i]-c[i])²` Column tree is cheap to RUN but catastrophic to
  * PLAN — a filter on the argmin cell pulls the whole tree into
  * predicate pushdown and the optimizer re-canonicalizes ~30k-node
  * predicates per rule (measured 18 s of DRIVER time per IVF query at
  * k=8, dim=64, on 2 000 rows). This node carries the codebook as one
  * constant reference and loops in compiled code: O(1) plan tree,
  * same arithmetic.
  *
  * Float parity with the DuckDB oracle: per centroid the accumulator
  * starts at 0.0 and adds `(e_i - c_i)²` in ascending index order —
  * identical to the left-associated unrolled chain (0.0 + x == x) and
  * to DuckDB's sequential list_sum fold.
  *
  * Ragged rows (fewer than dim elements) or rows with a null element
  * in the prefix yield an all-NULL distance array — exactly the NULL
  * the unrolled element_at chain (and the oracle's list_sum over
  * out-of-bounds NULLs) produces, so argmin CASE chains fall through
  * to their ELSE arm identically on both engines.
  */
case class SqDists(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.length == cents(0).length),
    "all centroid rows must share one dimension")

  private def elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"SqDists needs array<float|double>, got $other")
  }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = true)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else SqDists.compute(v.asInstanceOf[ArrayData], cents,
      elementIsFloat)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.SqDists.compute(
         |  $c, (double[][]) $centsRef, $elementIsFloat);
         |""".stripMargin)
  }
}

object SqDists {

  /** shared by interpreted and codegen paths; ascending-index 0-seeded
    * left fold per centroid (see class doc for why the order matters).
    */
  def compute(arr: ArrayData, cents: Array[Array[Double]],
      elementIsFloat: Boolean): GenericArrayData = {
    val k = cents.length
    val dim = cents(0).length
    if (arr.numElements() < dim)
      return new GenericArrayData(new Array[Any](k))
    var chk = 0
    while (chk < dim) {
      if (arr.isNullAt(chk))
        return new GenericArrayData(new Array[Any](k))
      chk += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      val c = cents(j)
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val v =
          if (elementIsFloat) arr.getFloat(d).toDouble
          else arr.getDouble(d)
        val diff = v - c(d)
        acc += diff * diff
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API. */
  def apply(emb: Column, cents: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftBridge.column(
      SqDists(org.apache.spark.sql.GraftBridge.expression(emb), cents))
}
