package graft

class SmokeSpec extends SparkSpec {
  test("all testdata tables readable at sf0.001") {
    Tables.names.foreach { n =>
      val df = Tables(spark, sf("sf0.001"), n)
      val c = df.count()
      info(s"$n: $c rows :: ${df.schema.simpleString}")
      assert(c > 0, s"table $n empty")
    }
  }
}
