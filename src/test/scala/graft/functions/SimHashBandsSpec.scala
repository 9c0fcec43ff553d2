package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimHashBandsSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the md5-band Column formulation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "  leading and   multiple   spaces here"),
      (3L, "trailing space "),
      (4L, "dup dup dup dup"), // duplicate tokens vote once each
      (5L, "unicode tökensählen ümlauts"),
      (6L, "x"),
      (7L, ""), // no tokens → dropped like the groupBy dropped it
      (8L, "   ")).toDF("doc_id", "text")

    // the replaced formulation, verbatim
    def tokenBandHash(tok: org.apache.spark.sql.Column, b: Int) =
      conv(substring(md5(tok), 1 + 4 * b, 4), 16, 10).cast("long")
    val toks = docs.select(col("doc_id").as("id"),
      explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val withH = toks.select(col("id") +: (0 until 4).map(b =>
      tokenBandHash(col("tok"), b).as(s"h$b")): _*)
    val bitSums = for { b <- 0 until 4; j <- 0 until 16 } yield
      sum(when(shiftright(col(s"h$b"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s_${b}_$j")
    val summed = withH.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val old = summed.select(col("id") +: (0 until 4).map { b =>
      (0 until 16).map { j =>
        when(col(s"s_${b}_$j") > 0, lit(1L << j)).otherwise(0L)
      }.reduceLeft(_ + _).as(s"band_$b")
    }: _*)

    val neu = graft.operators.Dedup.simhashBands(docs, "doc_id", "text")
    assert(old.exceptAll(neu).isEmpty && neu.exceptAll(old).isEmpty)
    // token-less docs are absent, fingerprinted docs all present
    assert(neu.count() == 6)
  }

  test("stays in whole-stage codegen with no shuffle") {
    val df = graft.operators.Dedup.simhashBands(
      spark.range(3).select(col("id").as("doc_id"),
        concat(lit("some words here "), col("id")).as("text")),
      "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*("), plan)
  }
}
