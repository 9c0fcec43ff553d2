package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `SimHashBands(text)` — the document's 4 × 16-bit SimHash bands in
  * ONE pass over the text: ARRAY<BIGINT> of length 4, or NULL for a
  * document with no nonempty tokens (which the Column formulation
  * dropped at its groupBy).
  *
  * Replaces explode(split) → 4 md5-derived hash columns → a 64-column
  * bit-majority groupBy: that shape shuffles one row per TOKEN and
  * aggregates 64 sums per document, so fingerprinting was the
  * pipeline's only non-map-side stage. This node tokenizes, hashes,
  * and majority-votes inside the projection — fingerprints now cost
  * one scan with NO shuffle at any corpus size (the only remaining
  * shuffle in simhashPairs is the banded candidate join itself).
  *
  * Parity (pinned by the DuckDB oracle, which recomputes the same
  * family in SQL): tokens are Spark's `\s+` split with limit -1,
  * empty tokens dropped; band b's token sub-hash is hex chars
  * [4b, 4b+4) of lowercase md5 — identical to
  * `conv(substr(md5(tok), 1+4b, 4), 16, 10)`; bit j of band b is set
  * iff Σ_tokens (±1 per bit j of the band-b sub-hash) > 0. Duplicate
  * tokens vote once each, exactly like the exploded rows did.
  */
case class SimHashBands(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else SimHashBands.compute(v.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("bands")
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.functions.SimHashBands.compute($c.toString());
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
         |""".stripMargin)
  }
}

object SimHashBands {

  /** per-task digest instance: getInstance does a JCA provider lookup
    * per call, which the hot fingerprint path should pay once, not
    * once per document.
    */
  private val localMd =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  /** shared by interpreted and codegen paths; null = no tokens. */
  def compute(text: String): GenericArrayData = {
    val toks = text.split("\\s+", -1)
    val sums = new Array[Int](64) // [band*16 + bit]
    val md = localMd.get()
    var any = false
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        any = true
        md.reset()
        val dig = md.digest(tok.getBytes(StandardCharsets.UTF_8))
        var b = 0
        while (b < 4) {
          // hex chars [4b, 4b+4) = bytes [2b, 2b+2) of the digest
          val h = ((dig(2 * b) & 0xff) << 8) | (dig(2 * b + 1) & 0xff)
          var j = 0
          while (j < 16) {
            sums(b * 16 + j) += (if (((h >> j) & 1) == 1) 1 else -1)
            j += 1
          }
          b += 1
        }
      }
      t += 1
    }
    if (!any) return null
    val out = new Array[Long](4)
    var b = 0
    while (b < 4) {
      var band = 0L
      var j = 0
      while (j < 16) {
        if (sums(b * 16 + j) > 0) band |= (1L << j)
        j += 1
      }
      out(b) = band
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API. */
  def apply(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHashBands(org.apache.spark.sql.GraftBridge.expression(text)))
}
