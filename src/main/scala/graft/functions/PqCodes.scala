package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `PqCodes(embedding, books)` — the whole product-quantization encode
  * as ONE compact expression node: for each of m subspaces, the
  * first-wins argmin over that subspace's k codebook entries (squared
  * L2 on index window j·sub .. (j+1)·sub−1). Returns ARRAY<LONG> of
  * length m.
  *
  * Same plan-size rationale as [[SqDists]], but the stakes are higher:
  * composing the encode from m SqDists-on-slice nodes plus m unrolled
  * argmin CASE chains (k·(k−1)/2 comparisons each, the subtrees
  * duplicated per comparison) generates code janino refuses to compile
  * at m=8, k=16 — caught by PlanCheckSpec's codegen-fallback-off
  * sweep. One node, one reference object, compiled loops.
  *
  * Float/NULL parity with the DuckDB oracle: per subspace the
  * accumulator is 0-seeded and folds ascending (list_sum order); a
  * subspace whose index window runs past the array or contains a NULL
  * element codes to k−1, exactly where the oracle's NULL distances
  * drive its CASE chain's ELSE arm. First-wins tie-break: the argmin
  * keeps the LOWEST code index among equal minima, like the oracle's
  * `d_j <= d_m` chain.
  */
case class PqCodes(child: Expression,
    books: Array[Array[Array[Double]]]) extends UnaryExpression {

  require(books.nonEmpty && books.forall(_.length == books(0).length)
    && books.forall(_.forall(_.length == books(0)(0).length)),
    "books must be [m][k][sub] with uniform k and sub")

  private def elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"PqCodes needs array<float|double>, got $other")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PqCodes.compute(v.asInstanceOf[ArrayData], books,
      elementIsFloat)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.PqCodes.compute(
         |  $c, (double[][][]) $booksRef, $elementIsFloat);
         |""".stripMargin)
  }
}

object PqCodes {

  /** shared by interpreted and codegen paths. */
  def compute(arr: ArrayData, books: Array[Array[Array[Double]]],
      elementIsFloat: Boolean): GenericArrayData = {
    val m = books.length
    val k = books(0).length
    val sub = books(0)(0).length
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      out(j) = (k - 1).toLong // ragged/NULL-window default (ELSE arm)
      if (arr.numElements() >= base + sub) {
        var chk = 0
        while (chk < sub && !arr.isNullAt(base + chk)) chk += 1
        if (chk == sub) {
          val book = books(j)
          var best = Double.PositiveInfinity
          var idx = 0
          var c = 0
          while (c < k) {
            val entry = book(c)
            var acc = 0.0
            var d = 0
            while (d < sub) {
              val v =
                if (elementIsFloat) arr.getFloat(base + d).toDouble
                else arr.getDouble(base + d)
              val diff = v - entry(d)
              acc += diff * diff
              d += 1
            }
            if (acc < best) { best = acc; idx = c }
            c += 1
          }
          out(j) = idx.toLong
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API. */
  def apply(emb: Column, books: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftBridge.column(
      PqCodes(org.apache.spark.sql.GraftBridge.expression(emb), books))
}
