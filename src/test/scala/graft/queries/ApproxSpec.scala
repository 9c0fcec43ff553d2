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

  test("percentile_approx tracks exact rank and plans two-phase " +
      "without the exact buffer") {
    val e = graft.Tables(spark, sf("sf0.01"), "events")
    // sketch p95 must land between exact p94 and p96 (accuracy 100 ⇒
    // rank error ≤ 1%) — the same claim the driver hashes per group in
    // agg_value_percentile_approx
    val r = e.agg(
      percentile_approx(col("value"), lit(0.95), lit(100)).as("a"),
      expr("percentile(value, 0.94)").as("lo"),
      expr("percentile(value, 0.96)").as("hi")).head()
    val (a, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(a >= lo && a <= hi, s"approx $a outside [$lo, $hi]")
    // the sketch-only plan (the 100 TB deployment drops the exact
    // twin) is a two-phase agg carrying the mergeable sketch, not the
    // exact percentile's full value buffer
    val p = e.groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.95), lit(100)))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_percentile_approx"), p)
    assert(!p.toLowerCase.contains("partial_percentile(value"), p)
  }
}
