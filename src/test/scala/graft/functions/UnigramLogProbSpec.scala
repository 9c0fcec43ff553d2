package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class UnigramLogProbSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Map("the" -> UnigramLogProb.mln(100L),
    "cat" -> UnigramLogProb.mln(7L))

  private def one(text: String): (Long, Long) = {
    val st = UnigramLogProb(col("text"), vocab)
    Seq(Tuple1(text)).toDF("text")
      .select(st.getField("words"), st.getField("mln_sum"))
      .as[(Long, Long)].head()
  }

  test("sums quantized vocab entries; OOV scores ln(1) = 0") {
    val lnThe = UnigramLogProb.mln(100L) // round(ln(100)*1e6)
    val lnCat = UnigramLogProb.mln(7L)
    assert(one("the cat") == (2L, lnThe + lnCat))
    assert(one("the unknown cat") == (3L, lnThe + lnCat)) // OOV adds 0
    assert(one("zz qq") == (2L, 0L))
  }

  test("tokenizes like WordStats: single spaces, empties dropped") {
    assert(one("  the   cat  ") ==
      (2L, UnigramLogProb.mln(100L) + UnigramLogProb.mln(7L)))
    assert(one("") == (0L, 0L))
  }

  test("quantization is half-up on non-negative ln") {
    assert(UnigramLogProb.mln(1L) == 0L)
    assert(UnigramLogProb.mln(100L) ==
      math.round(math.log(100.0) * 1e6))
  }

  test("null text propagates") {
    val r = Seq(Tuple1(null: String)).toDF("text")
      .select(UnigramLogProb(col("text"), vocab)).head()
    assert(r.isNullAt(0))
  }

  test("compiles under codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val st = UnigramLogProb(col("text"), vocab)
      val got = Seq("the cat", "x").toDF("text")
        .select(st.getField("mln_sum")).as[Long].collect().toSeq
      assert(got ==
        Seq(UnigramLogProb.mln(100L) + UnigramLogProb.mln(7L), 0L))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("report flags exactly the docs below the per-token threshold " +
      "and its scoring pass is map-side") {
    // corpus: 'a' x9 + 'b' -> vocab counts a=18, b=2 over two docs
    val docs = Seq(
      ("s0", "a a a a a a a a a b"), // mixed: higher avg logprob
      ("s1", "b b a a a a a a a a")  // same multiset -> same score
    ).toDF("source", "text")
    // both docs have identical token multisets? no: doc1 has 9a+1b,
    // doc2 has 2b+8a -> different scores; flag between them
    val total = 20L
    def score(na: Long, nb: Long): Long = {
      val sum = na * UnigramLogProb.mln(17L) +
        nb * UnigramLogProb.mln(3L)
      sum - (na + nb) * UnigramLogProb.mln(total)
    }
    // counts: a appears 9+8=17, b appears 1+2=3
    val s1 = score(9, 1) // doc 1
    val s2 = score(8, 2) // doc 2: more rare tokens -> lower score
    assert(s2 < s1)
    val perTok1 = s1 / 10L
    val thresh = (s1 + s2) / 20L // between the two per-token scores
    val out = graft.operators.Pipeline.unigramLogProbReport(
      docs, "text", "source", topV = 10, flagMlnPerToken = thresh)
    // sum_score_mln is DECIMAL(38,0) (overflow-proof at corpus scale)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getDecimal(3).longValueExact(), r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("s0", 1L, 10L, s1, 0L), ("s1", 1L, 10L, s2, 1L)))
    assert(perTok1 > thresh)
  }
}
