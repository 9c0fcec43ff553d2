package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RegexExtractStructSpec extends SparkSpec {
  import spark.implicits._

  test("typed struct extraction over a line column") {
    val df = Seq(
      "2011/02/22 21:50:30 [8203] connect from host (1.2.3.4)",
      "no match here",
      "2011/02/23 05:54:10 [99] bytes 1234"
    ).toDF("line")

    val re = """^(?P<date>\d+/\d+/\d+ \d+:\d+:\d+) \[(?P<pid>\d+)\] """
    val out = df.select(
      RegexExtractStruct(col("line"), re).as("m"))
      .select($"m.matched", $"m.g1", $"m.g2")
      .collect()

    assert(out(0).getBoolean(0))
    assert(out(0).getString(1) == "2011/02/22 21:50:30")
    assert(out(0).getLong(2) == 8203L) // pid inferred Int → LongType
    assert(!out(1).getBoolean(0))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).getLong(2) == 99L)
  }

  test("float and unmatched-optional groups") {
    val df = Seq("v=3.25 q=7", "v=bad").toDF("line")
    val re = """v=(?P<v>\d+\.\d+)(?: q=(?P<q>\d+))?"""
    val rows = df.select(RegexExtractStruct(col("line"), re).as("m"))
      .select($"m.matched", $"m.g1", $"m.g2").collect()
    assert(rows(0).getBoolean(0) && rows(0).getDouble(1) == 3.25 &&
      rows(0).getLong(2) == 7L)
    assert(!rows(1).getBoolean(0))
  }

  test("stays in whole-stage codegen") {
    // spark.range keeps a real physical scan (a local Seq would be
    // constant-folded into LocalTableScan before codegen)
    val df = spark.range(3)
      .select(concat(lit("x="), col("id")).as("line"))
      .select(RegexExtractStruct(col("line"), """x=(\d+)""").as("m"))
    val plan = df.queryExecution.executedPlan
    // the `*(n)` prefix marks operators fused into WholeStageCodegen
    assert(plan.toString.contains("*(1) Project"),
      s"expected codegen'd Project in:\n$plan")
    assert(df.select($"m.g1").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L))
  }
}
