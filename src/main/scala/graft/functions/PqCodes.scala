package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  * Float/NULL parity with the DuckDB oracle (the SQL twin builds each
  * subspace distance as `list_sum(list_transform(range(...), i ->
  * (e[i]-c[i])²))` and picks the code through a `d_a <= d_b` CASE
  * chain whose ELSE arm is k−1):
  *  - the accumulator is 0-seeded and folds ascending (list_sum order);
  *  - an element that is NULL or past the array's end contributes
  *    NOTHING to the sum — DuckDB's out-of-range subscript yields NULL
  *    and `list_sum` SKIPS NULLs, so a partial window still produces a
  *    finite partial distance and a genuine argmin code;
  *  - only a window with NO live element (array NULL, window entirely
  *    past the end, or all-NULL elements) has every distance NULL on
  *    the oracle side, where the CASE conditions all fail and the ELSE
  *    arm codes k−1 — mirrored here, including for a NULL input array
  *    (this node is non-nullable: a NULL embedding codes to all k−1,
  *    never to a NULL code array, so its finite lookup distance ranks
  *    it like the oracle instead of NULLS-FIRST polluting a top-k);
  *  - first-wins tie-break: the argmin keeps the LOWEST code index
  *    among equal minima, like the oracle's `d_a <= d_b` chain.
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

  /** a NULL embedding codes to all k−1 (oracle ELSE arm), not NULL. */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) PqCodes.nullCodes(books)
    else PqCodes.compute(v.asInstanceOf[ArrayData], books,
      elementIsFloat)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NOT nullSafeCodeGen: a NULL child must still produce the all-
    // (k−1) code array, so the null check routes to nullCodes instead
    // of propagating
    val booksRef = ctx.addReferenceObj("books", books, "double[][][]")
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      |${childGen.code}
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
      |  ${childGen.isNull}
      |    ? graft.functions.PqCodes.nullCodes((double[][][]) $booksRef)
      |    : graft.functions.PqCodes.compute(${childGen.value},
      |        (double[][][]) $booksRef, $elementIsFloat);
      |""".stripMargin, isNull = FalseLiteral)
  }
}

object PqCodes {

  /** the oracle's ELSE arm for every subspace: all codes = k−1. */
  def nullCodes(books: Array[Array[Array[Double]]]): GenericArrayData = {
    val last = (books(0).length - 1).toLong
    new GenericArrayData(
      Array.fill[Any](books.length)(last))
  }

  /** shared by interpreted and codegen paths. */
  def compute(arr: ArrayData, books: Array[Array[Array[Double]]],
      elementIsFloat: Boolean): GenericArrayData = {
    val m = books.length
    val k = books(0).length
    val sub = books(0)(0).length
    val n = arr.numElements()
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      // window positions past the array's end or holding NULL skip the
      // accumulation, like list_sum over NULL-holed list_transform
      val limit = math.min(sub, math.max(0, n - base))
      var anyLive = false
      var probe = 0
      while (probe < limit && !anyLive) {
        if (!arr.isNullAt(base + probe)) anyLive = true
        probe += 1
      }
      if (!anyLive) out(j) = (k - 1).toLong // all-NULL window: ELSE arm
      else {
        val book = books(j)
        var best = Double.PositiveInfinity
        var idx = 0
        var c = 0
        while (c < k) {
          val entry = book(c)
          var acc = 0.0
          var d = 0
          while (d < limit) {
            if (!arr.isNullAt(base + d)) {
              val v =
                if (elementIsFloat) arr.getFloat(base + d).toDouble
                else arr.getDouble(base + d)
              val diff = v - entry(d)
              acc += diff * diff
            }
            d += 1
          }
          if (acc < best) { best = acc; idx = c }
          c += 1
        }
        out(j) = idx.toLong
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
