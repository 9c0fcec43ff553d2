package graft.plan

import graft.SparkSpec
import graft.mtail.{Frontend, LogLines, Snapshot}
import graft.mtail.Snapshot.VInt
import graft.streaming.Exporters

class LimitHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("limit N keeps the N newest cells by datum timestamp") {
    val prog = Frontend.parse(
      """counter hits by page limit 2
        |/^(?P<ts>\d+) (?P<page>\w+)$/ {
        |  settime($ts)
        |  hits[$page]++
        |}
        |""".stripMargin, "limit_test")
    val lines = LogLines.fromLines(
      Seq("100 a", "200 b", "300 c", "400 b").toDF("line"), "line")
    val cells = Snapshot.collect(
      new PlanBuilder(prog, lines, 0).snapshot())
    // cells: a@100, b@400, c@300 → limit 2 keeps b and c
    assert(cells.map(c => c.labels("page")).toSet == Set("b", "c"))
    assert(cells.find(_.labels("page") == "b").get.value == VInt(2))
  }

  test("histogram observe + cumulative prometheus export") {
    val prog = Frontend.parse(
      """histogram lat buckets 1, 2, 4
        |/^v=(?P<v>\d+)$/ {
        |  lat = $v
        |}
        |""".stripMargin, "hist_test")
    val lines = LogLines.fromLines(
      Seq("v=1", "v=2", "v=3", "v=5", "v=1").toDF("line"), "line")
    val cells = Snapshot.collect(
      new PlanBuilder(prog, lines, 0).snapshot())
    assert(cells.size == 1)
    val c = cells.head
    // (min,max] buckets: v=1,1 → le=1; v=2 → le=2; v=3 → le=4; v=5 → +Inf
    assert(c.buckets.get == Map("1" -> 2L, "2" -> 1L, "4" -> 1L,
      "+Inf" -> 1L, "count" -> 5L))

    val prom = Exporters.prometheus(cells, "hist_test")
    assert(prom.contains("""lat_bucket{prog="hist_test",le="1"} 2"""))
    assert(prom.contains("""lat_bucket{prog="hist_test",le="2"} 3"""))
    assert(prom.contains("""lat_bucket{prog="hist_test",le="4"} 4"""))
    assert(prom.contains("""lat_bucket{prog="hist_test",le="+Inf"} 5"""))
    assert(prom.contains("""lat_count{prog="hist_test"} 5"""))
  }
}
