package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

class WordStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(s: String): (Long, Long, Long, Long) = {
    val r = WordStats.compute(UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("one-pass token statistics") {
    assert(stats("a b a c a") == (5L, 3L, 3L, 5L))
    assert(stats("hello world") == (2L, 2L, 1L, 10L))
    // empty tokens (leading / trailing / doubled spaces) are dropped
    assert(stats("  x  y x ") == (3L, 2L, 2L, 3L))
    assert(stats("") == (0L, 0L, 0L, 0L))
    assert(stats("   ") == (0L, 0L, 0L, 0L))
    assert(stats("solo") == (1L, 1L, 1L, 4L))
  }

  test("property: one-pass scan equals the naive split-based " +
      "reference on random token streams") {
    val gen = {
      import org.scalacheck.Gen
      val tok = Gen.oneOf(Gen.oneOf("a", "bb", "the", "Ω≈", "x1"),
        Gen.alphaNumStr.map(_.take(6)))
      Gen.listOf(Gen.oneOf(tok, Gen.const(""), Gen.const(" ")))
        .map(_.mkString(" "))
    }
    val seed0 = org.scalacheck.rng.Seed(20260814L)
    var seed = seed0
    (1 to 500).foreach { i =>
      val s = gen.pureApply(org.scalacheck.Gen.Parameters.default, seed)
      seed = seed.next
      val toks = s.split(" ", -1).filter(_.nonEmpty).toSeq
      val naive = (toks.length.toLong,
        toks.distinct.length.toLong,
        if (toks.isEmpty) 0L
        else toks.groupBy(identity).values.map(_.length).max.toLong,
        toks.map(_.length.toLong).sum)
      assert(stats(s) == naive, s"iter $i input=${s.take(80)}")
    }
  }

  test("codegen and interpreted paths agree; null propagates") {
    val df = Seq(Some("a bb a"), Some(""), None).toDF("text")
      .select(WordStats(col("text")).as("s"))
    val rows = df.select("s.words", "s.distinct_words", "s.top_count",
      "s.char_sum").collect()
    assert(rows(0).toSeq == Seq(3L, 2L, 2L, 4L))
    assert(rows(1).toSeq == Seq(0L, 0L, 0L, 0L))
    assert(rows(2).toSeq == Seq(null, null, null, null))
  }
}
