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
