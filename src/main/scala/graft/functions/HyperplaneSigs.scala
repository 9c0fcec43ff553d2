package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `HyperplaneSigs(embedding, signs, bitsPerTable)` — all hyperplane-LSH
  * table signatures of an embedding in ONE compact expression node.
  *
  * The naive formulation (an unrolled Column tree of nTables ×
  * bitsPerTable × dim ±element_at terms) is catastrophically expensive
  * to PLAN, not to run: a 4096-term tree duplicated through the
  * candidate self-join gives the optimizer ~100k-node trees to rewrite
  * per rule per iteration — tens of seconds of driver time and
  * multi-MB task binaries. This node carries the ±1 sign matrix as one
  * constant reference and loops in compiled code, so the plan tree is
  * O(1), codegen stays tiny, and the JIT'd loop outruns the unrolled
  * form.
  *
  * Float math parity (for the DuckDB oracle): the accumulator starts
  * at 0.0 and adds ±element in ascending index order — bit-identical
  * to the left-associated chain `(±e1) + (±e2) + …` (0.0 + x == x) and
  * to DuckDB's sequential list_sum fold.
  *
  * Output: ARRAY<BIGINT> of length signs.length / bitsPerTable; bit p
  * of table t is the sign of plane (t·bitsPerTable + p)'s projection.
  */
case class HyperplaneSigs(child: Expression, signs: Array[Array[Int]],
    bitsPerTable: Int) extends UnaryExpression {

  require(signs.nonEmpty && signs.length % bitsPerTable == 0,
    "signs rows must be nTables * bitsPerTable")
  require(bitsPerTable <= 63, "table signature must fit a long")
  // the bounds/null pre-check in compute() uses signs(0).length as THE
  // dimension; a ragged matrix with a longer later row would read past
  // the checked prefix
  require(signs.forall(_.length == signs(0).length),
    "all hyperplane rows must share one dimension")

  private def elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"HyperplaneSigs needs array<float|double>, got $other")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else HyperplaneSigs.compute(v.asInstanceOf[ArrayData], signs,
      bitsPerTable, elementIsFloat)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "int[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HyperplaneSigs.compute(
         |  $c, (int[][]) $signsRef, $bitsPerTable, $elementIsFloat);
         |""".stripMargin)
  }
}

object HyperplaneSigs {

  /** shared by interpreted and codegen paths; ascending-index
    * left-fold per plane (see class doc for why the order matters).
    */
  def compute(arr: ArrayData, signs: Array[Array[Int]],
      bitsPerTable: Int, elementIsFloat: Boolean): GenericArrayData = {
    val nTables = signs.length / bitsPerTable
    val out = new Array[Long](nTables)
    // ragged or null-element rows: the unrolled element_at form (and
    // the DuckDB oracle's e[i]) yields a NULL projection sum for such
    // rows, which the `CASE WHEN proj > 0` lowers to bit 0 — match
    // that by emitting all-zero signatures instead of reading out of
    // bounds
    val dim = signs(0).length
    if (arr.numElements() < dim) return new GenericArrayData(out)
    var chk = 0
    while (chk < dim) {
      if (arr.isNullAt(chk)) return new GenericArrayData(out)
      chk += 1
    }
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var p = 0
      while (p < bitsPerTable) {
        val row = signs(t * bitsPerTable + p)
        var acc = 0.0
        var d = 0
        val dim = row.length
        while (d < dim) {
          val v =
            if (elementIsFloat) arr.getFloat(d).toDouble
            else arr.getDouble(d)
          acc += (if (row(d) > 0) v else -v)
          d += 1
        }
        if (acc > 0) sig |= 1L << p
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API. */
  def apply(emb: Column, signs: Array[Array[Int]],
      bitsPerTable: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      HyperplaneSigs(
        org.apache.spark.sql.GraftBridge.expression(emb), signs,
        bitsPerTable))
}
