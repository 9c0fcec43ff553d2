package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BigramLogProbSpec extends SparkSpec {
  import spark.implicits._

  private val pv = Map(
    "the cat" -> UnigramLogProb.mln(6L),
    "cat sat" -> UnigramLogProb.mln(4L))
  private val lv = Map(
    "the" -> UnigramLogProb.mln(10L),
    "cat" -> UnigramLogProb.mln(4L))

  private def one(text: String): (Long, Long) = {
    val st = BigramLogProb(col("text"), pv, lv)
    Seq(Tuple1(text)).toDF("text")
      .select(st.getField("pairs"), st.getField("mln_sum"))
      .as[(Long, Long)].head()
  }

  test("sums conditional pair scores: mln(pair) - mln(left)") {
    val exp = (UnigramLogProb.mln(6L) - UnigramLogProb.mln(10L)) +
      (UnigramLogProb.mln(4L) - UnigramLogProb.mln(4L))
    assert(one("the cat sat") == (2L, exp))
  }

  test("OOV scores zero independently per side") {
    // pair OOV, left in vocab: 0 - mln(left)
    assert(one("the dog") == (1L, -UnigramLogProb.mln(10L)))
    // pair and left both OOV: 0
    assert(one("dog runs") == (1L, 0L))
    // no pairs at all
    assert(one("solo") == (0L, 0L))
    assert(one("") == (0L, 0L))
  }

  test("tokenizes like WordStats: extra spaces do not create pairs") {
    val exp = UnigramLogProb.mln(6L) - UnigramLogProb.mln(10L)
    assert(one("  the   cat  ") == (1L, exp))
  }

  test("null propagates; codegen with fallback disabled") {
    assert(Seq(Tuple1(null: String)).toDF("text")
      .select(BigramLogProb(col("text"), pv, lv)).head().isNullAt(0))
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val st = BigramLogProb(col("text"), pv, lv)
      val got = Seq("the cat", "x").toDF("text")
        .select(st.getField("mln_sum")).as[Long].collect().toSeq
      assert(got ==
        Seq(UnigramLogProb.mln(6L) - UnigramLogProb.mln(10L), 0L))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("report builds the left marginals from the pair counts and " +
      "flags below the per-pair threshold") {
    // corpus: "a b a b", "a c" -> pairs: a b (x2), b a (x1), a c (x1)
    // left marginals: a -> 3, b -> 1
    val docs = Seq(("s0", "a b a b"), ("s1", "a c"))
      .toDF("source", "text")
    val mln = UnigramLogProb.mln _
    val s0 = 2 * (mln(2) - mln(3)) + (mln(1) - mln(1)) // a b, b a, a b
    val s1 = mln(1) - mln(3) // a c
    // threshold between the two per-pair scores (s0/3 vs s1/1)
    assert(s1 < s0 / 3)
    val thresh = (s0 / 3 + s1) / 2
    val rows = graft.operators.Pipeline.bigramLogProbReport(
        docs, "text", "source", topV = 10, flagMlnPerPair = thresh)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).longValueExact(), r.getLong(4)))
    assert(rows.toSeq == Seq(("s0", 1L, 3L, s0, 0L),
      ("s1", 1L, 1L, s1, 1L)))
  }
}
