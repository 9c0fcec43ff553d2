package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaxTokenRunSpec extends SparkSpec {
  import spark.implicits._

  private def run(s: String): Long =
    Seq(Tuple1(s)).toDF("t")
      .select(MaxTokenRun(col("t")).as("r")).as[Long].head()

  test("counts the longest consecutive identical-token run") {
    assert(run("buy buy buy buy now") == 4L)
    assert(run("a b a b a") == 1L)
    assert(run("x x y y y x") == 3L)
    assert(run("solo") == 1L)
  }

  test("runs are consecutive, not corpus-wide frequency") {
    // 'a' appears 4 times but never twice in a row
    assert(run("a b a b a b a") == 1L)
  }

  test("token boundaries: prefixes are not equal tokens") {
    assert(run("ab ab a") == 2L)
    assert(run("ab a ab") == 1L)
  }

  test("WordStats tokenization: multiple spaces, empties dropped") {
    assert(run("x  x   x") == 3L)
    assert(run("  ") == 0L)
    assert(run("") == 0L)
  }

  test("matches a naive reference on 500 random token sequences") {
    val rnd = new scala.util.Random(20260815L)
    def naive(s: String): Long = {
      val toks = s.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) 0L
      else {
        var best = 1; var run = 1
        for (i <- 1 until toks.length) {
          run = if (toks(i) == toks(i - 1)) run + 1 else 1
          if (run > best) best = run
        }
        best.toLong
      }
    }
    val texts = Seq.fill(500) {
      val n = rnd.nextInt(30)
      Seq.fill(n)(s"t${rnd.nextInt(3)}").mkString(" ")
    }
    val got = texts.zipWithIndex.toDF("t", "i")
      .select(col("i"), MaxTokenRun(col("t")).as("r"))
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got == texts.map(naive))
  }

  test("null propagates; codegen path with fallback disabled") {
    assert(Seq(Tuple1(null: String)).toDF("t")
      .select(MaxTokenRun(col("t"))).head().isNullAt(0))
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      assert(Seq("q q q", "a b").toDF("t")
        .select(MaxTokenRun(col("t")).as("r"))
        .as[Long].collect().toSeq == Seq(3L, 1L))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
