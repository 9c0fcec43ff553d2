package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[PqCodes]] NULL/ragged parity with the DuckDB oracle's shape:
  * `list_sum(list_transform(...))` SKIPS null elements (partial finite
  * distance, genuine argmin), and only a window with NO live element —
  * including a NULL input array — reaches the CASE chain's ELSE arm
  * (code k−1). A NULL array must code to all k−1, never to NULL, or
  * its NULL ADC distance would NULLS-FIRST pollute an ascending top-k.
  */
class PqCodesSpec extends SparkSpec {
  import spark.implicits._

  // m=2 subspaces, k=2 entries, sub=2: entry 0 at the origin, entry 1
  // at (10,10) — far enough apart that every partial-sum argmin is
  // unambiguous
  private val books: Array[Array[Array[Double]]] = Array(
    Array(Array(0.0, 0.0), Array(10.0, 10.0)),
    Array(Array(0.0, 0.0), Array(10.0, 10.0)))

  test("null array, null elements, ragged windows match list_sum") {
    val rows = Seq[(Long, Seq[Option[Double]])](
      // clean row: window 0 near entry 0, window 1 near entry 1
      (0L, Seq(Some(1.0), Some(1.0), Some(9.0), Some(9.0))),
      // null elements skip: window 0 sees only 9.0 → d0=81, d1=1 →
      // code 1; window 1 sees only 1.0 → d0=1, d1=81 → code 0
      (2L, Seq(Some(9.0), None, Some(1.0), None)),
      // ragged: window 0 partial (one live element → argmin), window 1
      // entirely past the end → ELSE arm k−1
      (3L, Seq(Some(1.0))),
      // all-null elements: every window NULL-sums → all k−1
      (4L, Seq(None, None, None, None)))
    val withNull = rows.toDF("id", "embedding")
      .unionByName(Seq(1L).toDF("id")
        .withColumn("embedding",
          lit(null).cast("array<double>")))
    val got = withNull
      .select($"id", PqCodes($"embedding", books).as("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(0L) == Seq(0L, 1L))
    assert(got(1L) == Seq(1L, 1L), s"NULL array: ${got(1L)}")
    assert(got(2L) == Seq(1L, 0L))
    assert(got(3L) == Seq(0L, 1L))
    assert(got(4L) == Seq(1L, 1L))
  }

  test("non-nullable output survives codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = Seq((1L, Seq[Option[Double]](None, None, None, None)))
        .toDF("id", "embedding")
        .select(PqCodes($"embedding", books).as("codes"))
        .as[Seq[Long]].head()
      assert(got == Seq(1L, 1L))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
