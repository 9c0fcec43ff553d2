package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[CosineSim]] — value parity with the historical unrolled
  * element_at formulation (the DuckDB oracle's shape), NULL semantics,
  * and the 64 KB codegen regression that motivated the node.
  */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the unrolled element_at formulation") {
    val dim = 7
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1),
        Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val ac = col("a").cast("array<double>")
    val bc = col("b").cast("array<double>")
    val dot = (1 to dim).map(i => element_at(ac, i) * element_at(bc, i))
      .reduceLeft(_ + _)
    def nrm(c: org.apache.spark.sql.Column) =
      sqrt((1 to dim).map(i => element_at(c, i) * element_at(c, i))
        .reduceLeft(_ + _))
    val got = df.select(
        CosineSim(col("a"), col("b"), dim).as("fast"),
        (dot / (nrm(ac) * nrm(bc))).as("slow"))
      .as[(Double, Double)].collect()
    got.foreach { case (fast, slow) =>
      // exact double equality: same left-assoc IEEE fold order
      assert(java.lang.Double.compare(fast, slow) == 0, (fast, slow))
    }
  }

  test("NULL parity: null array, ragged, null element, zero norm") {
    val df = Seq[(Long, Array[java.lang.Float], Array[java.lang.Float])](
      (0L, null, Array[java.lang.Float](1f, 2f, 3f)),
      (1L, Array[java.lang.Float](1f, 2f), Array[java.lang.Float](1f, 2f, 3f)),
      (2L, Array[java.lang.Float](1f, null, 3f), Array[java.lang.Float](1f, 2f, 3f)),
      (3L, Array[java.lang.Float](0f, 0f, 0f), Array[java.lang.Float](1f, 2f, 3f)),
      (4L, Array[java.lang.Float](1f, 2f, 3f, 9f), Array[java.lang.Float](1f, 2f, 3f))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        CosineSim(col("a"), col("b"), 3).as("cos"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(0L).isEmpty)   // null array
    assert(got(1L).isEmpty)   // shorter than dim
    assert(got(2L).isEmpty)   // null element in prefix
    assert(got(3L).isEmpty)   // zero denominator -> NULL like Divide
    assert(got(4L).exists(c => math.abs(c - 1.0) < 1e-12)) // dim-prefix
  }

  test("double-array literal query operand (cosineTopK path)") {
    val df = Seq((0L, Array(3.0f, 4.0f))).toDF("id", "emb")
    val q = Array(3.0, 4.0)
    val c = df.select(CosineSim(col("emb"), lit(q), 2)).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("pair-join codegen compiles at dim 64 (no silent fallback)") {
    // the unrolled formulation blew the JVM 64 KB method limit inside
    // bnlj_doConsume at dim >= ~48 and Spark fell back to interpreted
    // execution; with fallback disabled this would throw
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val e = graft.Tables(spark, sf("sf0.001"), "embeddings")
      val n = graft.operators.Ann
        .exactNearDupPairs(e, "embedding", "vec_id", 0.4).count()
      assert(n > 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
