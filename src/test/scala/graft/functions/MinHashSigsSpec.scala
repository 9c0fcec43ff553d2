package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashSigsSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the explode + k-min groupBy formulation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text about spark planning"),
      (4L, "two words"), // under n → no grams → dropped
      (5L, "")).toDF("doc_id", "text")
    val (n, k) = (3, 16)

    // the replaced formulation, verbatim: per-gram rows, k min-aggs
    val grams = docs.select(col("doc_id").as("id"),
      explode(GramHashes(col("text"), n)).as("gh"))
    val mins = (0 until k).map(i =>
      min(xxhash64(lit(i), col("gh"))).as(s"sig_$i"))
    val old = grams.groupBy("id").agg(mins.head, mins.tail: _*)

    val neu = graft.operators.Dedup.minhashSignatures(
      docs, "doc_id", "text", n, k)
    assert(old.exceptAll(neu).isEmpty && neu.exceptAll(old).isEmpty)
    assert(neu.count() == 3) // gram-less docs dropped like the groupBy
  }

  test("stays in whole-stage codegen with no shuffle") {
    val df = graft.operators.Dedup.minhashSignatures(
      spark.range(3).select(col("id").as("doc_id"),
        concat(lit("alpha beta gamma delta "), col("id")).as("text")),
      "doc_id", "text", 3, 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*("), plan)
  }
}
