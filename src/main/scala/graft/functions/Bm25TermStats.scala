package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `Bm25TermStats(text, terms)` — the per-document inputs of a BM25
  * ranking pass in ONE compiled token scan: struct<`dl`, `tfs`> where
  * `dl` is the document length in tokens and `tfs[i]` is the term
  * frequency of query term i. The query terms ride along as a plan
  * reference object (like [[UnigramLogProb]]'s vocabulary), so the
  * scan stays map-side and whole-stage-codegen'd: no token explode,
  * no per-term regex, no array materialization.
  *
  * Tokenization matches [[WordStats]] / [[UnigramLogProb]] (single
  * ASCII spaces, empties dropped) so the retrieval scan shares the
  * corpus tokenization contract of every other text statistic; terms
  * are matched case-sensitively by exact token equality
  * (`regionMatches` in place — the token is never copied out).
  */
case class Bm25TermStats(child: Expression, terms: Array[String])
    extends UnaryExpression {

  require(terms.nonEmpty && terms.forall(_.nonEmpty),
    "BM25 query terms must be non-empty")

  override def dataType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("tfs", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    Bm25TermStats.compute(s.asInstanceOf[UTF8String], terms)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("bm25Terms", terms,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Bm25TermStats.compute($s, " +
        s"$termsRef);")
  }
}

object Bm25TermStats {

  /** shared by interpreted and codegen paths. */
  def compute(s: UTF8String, terms: Array[String]): InternalRow = {
    val str = s.toString
    val tfs = new Array[Long](terms.length)
    var dl = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      var j = str.indexOf(' ', i)
      if (j < 0) j = n
      if (j > i) {
        dl += 1
        val len = j - i
        var t = 0
        while (t < terms.length) {
          val term = terms(t)
          if (term.length == len && str.regionMatches(i, term, 0, len))
            tfs(t) += 1
          t += 1
        }
      }
      i = j + 1
    }
    new GenericInternalRow(Array[Any](dl, new GenericArrayData(tfs)))
  }

  /** Column-level API. */
  def apply(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.column(
      Bm25TermStats(
        org.apache.spark.sql.GraftBridge.expression(text),
        terms.toArray))
}
