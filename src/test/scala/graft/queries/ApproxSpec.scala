package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The documented scale path for distinct cardinalities: the oracle
  * keeps exact countDistinct bit-stable, and at 100 TB
  * approx_count_distinct (HLL++) swaps in. This pins the swap's two
  * claims: the estimate tracks exact within the requested rsd, and the
  * plan is a genuinely single-pass aggregate (no Expand — exact
  * distinct plans an Expand + second shuffle keyed on the distinct
  * column, which is the part that hurts at scale).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct tracks exact and plans without Expand") {
    val e = graft.Tables(spark, sf("sf0.01"), "events")
    val exact = e.agg(countDistinct(col("user_id"))).head().getLong(0)
    val approxDf = e.agg(approx_count_distinct("user_id", 0.02))
    val approx = approxDf.head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
    val pApprox = approxDf.queryExecution.executedPlan.toString
    assert(!pApprox.contains("Expand"), pApprox)
    val pExact = e.agg(countDistinct(col("user_id")))
      .queryExecution.executedPlan.toString
    assert(pExact.contains("Expand") || pExact.contains("distinct"),
      pExact)
  }
}
