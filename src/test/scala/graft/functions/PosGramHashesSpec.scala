package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PosGramHashesSpec extends SparkSpec {
  import spark.implicits._

  test("hash- and position-equal to the xxhash64 Column chain") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "  leading whitespace two words"), // leading empty token
      (3L, "trailing space here "), // trailing empty token
      (4L, "dup dup dup dup"), // repeated grams KEPT (positional)
      (5L, "two words"), // under n words → no grams
      (6L, "")).toDF("id", "text")
    val words = split(col("text"), "\\s+")
    val grams = when(size(words) >= 3,
      transform(sequence(lit(0), size(words) - 3),
        i => xxhash64(concat_ws(" ", slice(words, i + 1, lit(3))))))
      .otherwise(array().cast("array<bigint>"))
    val old = docs.select(col("id"),
      posexplode(grams).as(Seq("pos", "gh")))
    val neu = docs.select(col("id"),
      posexplode(PosGramHashes(col("text"), 3)).as(Seq("pos", "gh")))
    assert(old.exceptAll(neu).isEmpty && neu.exceptAll(old).isEmpty)
    // multiplicity check: doc 4's repeated gram appears at BOTH
    // positions (unlike GramHashes' distinct set)
    assert(neu.filter($"id" === 4L).count() == 2)
  }

  test("stays in whole-stage codegen") {
    val df = spark.range(3)
      .select(concat(lit("a b c d e f"), col("id")).as("text"))
      .select(PosGramHashes(col("text"), 3).as("ghs"))
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("*(1) Project"),
      s"expected codegen'd Project in:\n$plan")
    assert(df.count() == 3)
  }

  test("null text yields null; short docs yield empty arrays") {
    val df = Seq((1L, Some("a b")), (2L, None)).toDF("id", "text")
      .select(col("id"), PosGramHashes(col("text"), 3).as("ghs"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None
      else Some(r.getSeq[Long](1).size))).toMap
    assert(rows(1L).contains(0))
    assert(rows(2L).isEmpty)
  }
}
