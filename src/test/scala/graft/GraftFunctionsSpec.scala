package graft

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("SQL surface: every registered function runs from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT word_stats('a b a').top_count AS t,
        |  round(cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |        array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), 2), 4) AS c,
        |  size(gram_hashes('a b c d', 2)) AS g,
        |  size(minhash_sigs('a b c d e', 2, 4)) AS m,
        |  size(simhash_bands('x y z')) AS s,
        |  go_strptime('2021/01/15 12:00:00', '2006/01/02 15:04:05') AS ts,
        |  go_float_string(CAST(2000000.0 AS DOUBLE)) AS f,
        |  regex_extract('get 42', '(?P<op>\\w+) (?P<n>\\d+)').g2 AS n
        |""".stripMargin).head()
    assert(r.getAs[Long]("t") == 2L)
    assert(r.getAs[Double]("c") == 1.0)
    assert(r.getAs[Int]("g") == 3)
    assert(r.getAs[Int]("m") == 4)
    assert(r.getAs[Int]("s") == 4)
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant.getEpochSecond
      == 1610712000L) // 2021-01-15T12:00:00Z
    assert(r.getAs[String]("f") == "2e+06") // Go %g, not 2000000.0
    assert(r.getAs[Long]("n") == 42L) // typed capture: \d+ infers Int
  }

  test("static parameters must be literals; arity is checked") {
    GraftFunctions.register(spark)
    // a FOLDABLE expression is fine (constant-folds to a literal)…
    assert(spark.sql(
      "SELECT cosine_sim(array(1.0F), array(1.0F), size(array(1)))")
      .head().getDouble(0) == 1.0)
    // …a genuinely non-constant dim is rejected at plan time
    val e1 = intercept[Exception](
      spark.sql("SELECT cosine_sim(array(1.0F), array(1.0F), " +
        "CAST(rand() * 10 AS INT))").head())
    assert(e1.getMessage.contains("integer literal"),
      e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT word_stats('a', 'b')").head())
    assert(e2.getMessage.contains("1 argument"), e2.getMessage)
    // a Long literal that overflows Int is rejected, not truncated
    val e3 = intercept[Exception](
      spark.sql("SELECT cosine_sim(array(1.0F), array(1.0F), " +
        "5000000000)").head())
    assert(e3.getMessage.contains("32-bit"), e3.getMessage)
  }

  test("DESCRIBE FUNCTION surfaces the usage strings") {
    GraftFunctions.register(spark)
    val desc = spark.sql("DESCRIBE FUNCTION cosine_sim")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("cosine similarity"), desc)
  }

  test("the extensions class injects the same builder table") {
    // the injection path shares GraftFunctions.all verbatim, so
    // applying it must enumerate every name without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws on any malformed row
    assert(GraftFunctions.all.map(_._1).distinct.size ==
      GraftFunctions.all.size)
  }
}
