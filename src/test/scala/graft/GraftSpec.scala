package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.streaming.Trigger

class GraftSpec extends SparkSpec {

  private val src =
    """counter lines_total
      |counter by_op by op
      |/^(?P<op>\w+) \d+$/ {
      |  lines_total++
      |  by_op[$op]++
      |}
      |""".stripMargin

  test("oneShot: compile + run over files, snapshot out") {
    val dir = Files.createTempDirectory("graftone")
    Files.write(dir.resolve("a.log"),
      "get 1\nput 2\nget 3\n".getBytes(UTF_8))
    val snap = Graft.oneShot(spark, src, "facade.mtail",
      Seq(s"$dir/*.log"))
    val cells = snap.collect().map(r =>
      (r.getAs[String]("name"),
        Option(r.getAs[Map[String, String]]("labels"))
          .getOrElse(Map.empty)) -> r.getAs[Long]("ival")).toMap
    assert(cells(("lines_total", Map.empty)) == 3L)
    assert(cells(("by_op", Map("op" -> "get"))) == 2L)
  }

  test("oneShotExport renders json and prometheus formats") {
    val dir = Files.createTempDirectory("graftfmt")
    Files.write(dir.resolve("a.log"),
      "get 1\nput 2\nget 3\n".getBytes(UTF_8))
    val json = Graft.oneShotExport(spark, src, "facade.mtail",
      Seq(s"$dir/*.log"), format = "json")
    assert(json.contains("\"Name\": \"lines_total\"") &&
      json.contains("\"Value\": 3"))
    val prom = Graft.oneShotExport(spark, src, "facade.mtail",
      Seq(s"$dir/*.log"), format = "prometheus")
    assert(prom.contains("# TYPE by_op counter") &&
      prom.contains("""by_op{op="get",prog="facade.mtail"} 2"""))
    intercept[IllegalArgumentException] {
      Graft.oneShotExport(spark, src, "f", Seq(), format = "varz")
    }
  }

  test("oneShot honors -override_timezone for naive strptime times") {
    val tzSrc =
      """gauge last_seen
        |/^(?P<d>\d+\/\d+\/\d+ \d+:\d+:\d+) x$/ {
        |  strptime($d, "2006/01/02 15:04:05")
        |  last_seen = timestamp()
        |}
        |""".stripMargin
    val dir = Files.createTempDirectory("grafttz")
    Files.write(dir.resolve("a.log"),
      "2021/01/15 12:00:00 x\n".getBytes(UTF_8))
    def lastSeen(zone: String): Long =
      Graft.oneShot(spark, tzSrc, "tz.mtail", Seq(s"$dir/*.log"),
          overrideZone = zone)
        .filter(org.apache.spark.sql.functions.col("name") ===
          "last_seen")
        .head().getAs[Long]("ival")
    // noon naive: UTC reads it as 12:00Z; New York (EST) as 17:00Z
    assert(lastSeen("America/New_York") - lastSeen("UTC") == 5 * 3600L)
  }

  test("tail: a multi-MB burst fans out across byte-range partitions " +
      "and keeps last-write-wins line order") {
    val dir = Files.createTempDirectory("graftburst")
    val n = 120000
    val sb = new StringBuilder
    (1 to n).foreach(i => sb.append(s"v $i padpadpadpadpadpad\n"))
    // written BEFORE start: the whole ~2.6 MB burst lands in one
    // micro-batch, which the source must split (>= 2 chunks at the
    // 1 MB floor) — `last` is only correct if the fold still orders
    // by byte offset across the split partitions
    Files.write(dir.resolve("b.log"), sb.toString.getBytes(UTF_8))
    val burstSrc =
      """gauge last
        |counter n
        |/^v (?P<x>\d+) / {
        |  last = $x
        |  n++
        |}
        |""".stripMargin
    val t = Graft.tail(spark, burstSrc, "burst.mtail", s"$dir/*.log",
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      def cell(name: String): Option[Long] =
        t.runner.store.snapshot().find(_.name == name)
          .map(_.value).collect {
            case graft.mtail.Snapshot.VInt(v) => v
          }
      val deadline = System.currentTimeMillis() + 60000
      while (!cell("n").contains(n.toLong) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cell("n").contains(n.toLong), s"ingested ${cell("n")}")
      assert(cell("last").contains(n.toLong),
        "last-write-wins broke across split partitions")
    } finally t.stop()
  }

  test("tail: daemon mode serves /metrics and reloads") {
    val dir = Files.createTempDirectory("grafttail")
    Files.write(dir.resolve("t.log"), "get 1\n".getBytes(UTF_8))
    val t = Graft.tail(spark, src, "facade.mtail", s"$dir/*.log",
      trigger = Trigger.ProcessingTime("200 milliseconds"))
    try {
      def metrics(): String = {
        val url = new java.net.URI(
          s"http://localhost:${t.port}/metrics").toURL
        scala.io.Source.fromInputStream(url.openStream()).mkString
      }
      val deadline = System.currentTimeMillis() + 30000
      while (!metrics().contains("by_op{op=\"get\"")
        && System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(metrics().contains("""by_op{op="get",prog="facade.mtail"} 1"""))
      // internal metrics appear beside program metrics
      assert(metrics().contains("lines_total"))

      // live reload: v2 introduces a new metric, proving the swap
      t.reload(
        """counter reloaded_total
          |/^put/ {
          |  reloaded_total++
          |}
          |""".stripMargin, "facade.mtail")
      Files.write(dir.resolve("t.log"),
        "put 9\n".getBytes(UTF_8),
        java.nio.file.StandardOpenOption.APPEND)
      val d2 = System.currentTimeMillis() + 30000
      while (!metrics().contains("reloaded_total")
        && System.currentTimeMillis() < d2) Thread.sleep(250)
      assert(metrics().contains("reloaded_total"))
    } finally t.stop()
  }

  test("comma-separated -logs list tails every pattern") {
    // the reference's -logs flag splits on commas (main.go:30-36);
    // one source string carries the whole list, streams unioned
    val dirA = Files.createTempDirectory("graftlogsA")
    val dirB = Files.createTempDirectory("graftlogsB")
    Files.write(dirA.resolve("a.log"), "get 1\n".getBytes(UTF_8))
    Files.write(dirB.resolve("b.log"),
      "get 2\nget 3\n".getBytes(UTF_8))
    val t = Graft.tail(spark, src, "facade.mtail",
      s"$dirA/*.log,$dirB/*.log",
      trigger = Trigger.ProcessingTime("200 milliseconds"))
    try {
      def metrics(): String = {
        val url = new java.net.URI(
          s"http://localhost:${t.port}/metrics").toURL
        scala.io.Source.fromInputStream(url.openStream()).mkString
      }
      val deadline = System.currentTimeMillis() + 30000
      while (!metrics().contains("""by_op{op="get",prog="facade.mtail"} 3""")
        && System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(metrics().contains(
        """by_op{op="get",prog="facade.mtail"} 3"""))
    } finally t.stop()
  }
}
