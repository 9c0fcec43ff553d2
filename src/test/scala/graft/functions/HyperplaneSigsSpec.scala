package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Ann

class HyperplaneSigsSpec extends SparkSpec {
  import spark.implicits._

  private def signs(nPlanes: Int, dim: Int): Array[Array[Int]] =
    Array.tabulate(nPlanes)(p => Array.tabulate(dim)(d =>
      Ann.planeSign(p, d)))

  test("matches the unrolled ±element_at formulation bit-for-bit") {
    val vecs = Seq(
      (0L, Array(0.25f, -1.5f, 3.0f, 0.125f)),
      (1L, Array(-0.1f, 0.2f, -0.3f, 0.4f)),
      (2L, Array(1e-30f, -1e-30f, 1e30f, -1e30f)))
      .toDF("id", "emb")
    val sg = signs(8, 4)
    val viaExpr = vecs.select(col("id"),
      HyperplaneSigs(col("emb"), sg, 4).as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    // reference formulation: explicit left-assoc chain per plane
    val viaChain = vecs.select(col("id"),
      array((0 until 2).map { t =>
        (0 until 4).map { p =>
          val proj = (1 to 4).map { d =>
            val e = element_at(col("emb"), d).cast("double")
            if (sg(t * 4 + p)(d - 1) > 0) e else -e
          }.reduceLeft(_ + _)
          when(proj > 0, lit(1L << p)).otherwise(0L)
        }.reduceLeft(_ + _)
      }: _*).as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr == viaChain)
  }

  test("stays in whole-stage codegen") {
    val df = spark.range(3)
      .select(array((0 until 4).map(i =>
        (col("id") + i).cast("float")): _*).as("emb"))
      .select(HyperplaneSigs(col("emb"), signs(8, 4), 4).as("sigs"))
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("*(1) Project"),
      s"expected codegen'd Project in:\n$plan")
    assert(df.count() == 3)
  }

  test("ragged rows yield all-zero signatures like the null-sum form") {
    // a row shorter than dim would make the unrolled element_at form
    // (and the oracle's e[i]) produce a null projection → bit 0
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(9.0f))) // ragged
      .toDF("id", "emb")
      .select(col("id"),
        HyperplaneSigs(col("emb"), signs(8, 4), 4).as("sigs"))
    val rows = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) == Seq(0L, 0L))
    assert(rows(0L).exists(_ != 0L))
  }

  test("null embedding yields null signatures") {
    val df = Seq((0L, Some(Array(1.0f, 2.0f))), (1L, None))
      .toDF("id", "emb")
      .select(col("id"), HyperplaneSigs(col("emb"), signs(4, 2), 4)
        .as("sigs"))
    val rows = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(0L) && rows(1L))
  }
}
