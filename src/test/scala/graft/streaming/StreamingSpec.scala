package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.mtail.{Frontend, Snapshot}
import graft.mtail.Snapshot.{Cell, VInt}

class StreamingSpec extends SparkSpec {

  private val prog = Frontend.parse(
    """counter lines_total
      |counter by_op by operation
      |gauge last_size
      |/^(?P<op>\w+) (?P<size>\d+)$/ {
      |  lines_total++
      |  by_op[$op]++
      |  last_size = $size
      |}
      |""".stripMargin, "stream_test")

  test("microbatches merge like a continuous run") {
    val runner = new StreamRunner(prog, spark, 0)
    import spark.implicits._
    // two batches arriving over time
    runner.processBatch(Seq("get 10", "put 20").toDF("line"), 0)
    runner.processBatch(Seq("get 30", "bad line", "get 5").toDF("line"), 1)

    val cells = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(cells(("lines_total", Map.empty)) == VInt(4))
    assert(cells(("by_op", Map("operation" -> "get"))) == VInt(3))
    assert(cells(("by_op", Map("operation" -> "put"))) == VInt(1))
    // gauge: last write across batches wins
    assert(cells(("last_size", Map.empty)) == VInt(5))
  }

  test("zero-init cells publish at load, before any data") {
    // the reference registers metrics in the store at LOAD time
    // (runtime.go:173-184): a just-constructed runner must already
    // export its declared scalar counters as 0 @ epoch-0 — round 8's
    // TailProgsSpec race was exactly a freshly dropped program whose
    // only log line was consumed before its first batch, leaving it
    // invisible to scrapes forever
    val runner = new StreamRunner(
      Frontend.parse("counter all_lines\n// {\n  all_lines++\n}\n",
        "zeroinit"), spark, 0)
    val cells0 = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(cells0(("all_lines", Map.empty)) == VInt(0))

    // a reload that ADDS a counter publishes the new zero cell too,
    // and leaves live cells untouched (merge of 0 is a no-op)
    import spark.implicits._
    runner.processBatch(Seq("x").toDF("line"), 0)
    runner.reload(Frontend.parse(
      "counter all_lines\ncounter evens\n/^.[02468]$/ {\n  evens++\n}\n" +
        "// {\n  all_lines++\n}\n", "zeroinit"))
    val cells1 = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(cells1(("all_lines", Map.empty)) == VInt(1))
    assert(cells1(("evens", Map.empty)) == VInt(0))
  }

  test("structured streaming end-to-end via MemoryStream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[String]
    val runner = new StreamRunner(prog, spark, 0)
    val q = runner.start(ms.toDF().select(col("value").as("line")),
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    ms.addData("get 1", "put 2", "get 3")
    q.awaitTermination(30000)
    val cells = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(cells(("lines_total", Map.empty)) == VInt(3))
    assert(cells(("by_op", Map("operation" -> "get"))) == VInt(2))
  }

  test("cross-batch hidden-metric state: session spans two batches") {
    import spark.implicits._
    val prog = Frontend.parse(
      """hidden gauge start by id
        |counter session_time
        |counter sessions
        |/^(?P<ts>\d+) open (?P<id>\w+)$/ {
        |  settime($ts)
        |  start[$id] = timestamp()
        |}
        |/^(?P<ts>\d+) close (?P<id>\w+)$/ {
        |  settime($ts)
        |  session_time += timestamp() - start[$id]
        |  sessions++
        |  del start[$id]
        |}
        |""".stripMargin, "xbatch")
    val runner = new StreamRunner(prog, spark, 0)
    runner.processBatch(Seq("100 open a", "150 open b").toDF("line"), 0)
    runner.processBatch(Seq("160 close b").toDF("line"), 1)
    runner.processBatch(Seq("200 close a", "300 close a").toDF("line"), 2)

    val cells = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    // b: 160-150=10 (cross-batch); a: 200-100=100; second close of a
    // reads the freshly deleted state → 300-0=300
    assert(cells(("sessions", Map.empty)) == VInt(3))
    assert(cells(("session_time", Map.empty)) == VInt(10 + 100 + 300))
  }

  test("cross-batch state is a distributed join, not a plan literal") {
    import spark.implicits._
    val prog = Frontend.parse(
      """hidden gauge start by id
        |counter session_time
        |/^(?P<ts>\d+) open (?P<id>\w+)$/ {
        |  settime($ts)
        |  start[$id] = timestamp()
        |}
        |/^(?P<ts>\d+) close (?P<id>\w+)$/ {
        |  settime($ts)
        |  session_time += timestamp() - start[$id]
        |  del start[$id]
        |}
        |""".stripMargin, "bigstate")
    val runner = new StreamRunner(prog, spark, 0)
    val n = 100000
    // batch 1: open 1e5 sessions (1e5 in-flight keys)
    runner.processBatch(
      spark.range(n).select(concat(lit("100 open k"), col("id"))
        .as("line")), 0)
    // batch 2: close 3 of them — the plan must look up carried state
    // via a JOIN against the state relation; embedding 1e5 keys as a
    // typedLit map literal would be a plan-size bomb at scale
    runner.processBatch(
      Seq("200 close k0", "250 close k77777", "300 close k99999")
        .toDF("line"), 1)

    val cells = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(cells(("session_time", Map.empty)) ==
      VInt((200 - 100) + (250 - 100) + (300 - 100)))

    // plan-size guard: rebuild batch 2's plan directly and check it
    // stays O(1) in state cardinality and carries no map literal
    val state = runner.carriedStateForTest
    assert(state("start").count() == n - 3)
    val lines2 = Seq("400 close k5").toDF("line")
      .withColumn("filename", lit(""))
      .withColumn("ord", monotonically_increasing_id())
    val pb = new graft.plan.PlanBuilder(prog, lines2, 0, state)
    val plan = pb.snapshot().queryExecution.optimizedPlan.toString
    // no state key may appear as a literal in the plan tree
    assert(!plan.contains("k77777"), "state keys embedded in plan")
    assert(plan.length < 200000, s"plan blew up: ${plan.length} chars")
    assert(plan.contains("Join"), "carried state should be a join")
  }

  test("fan-out: one source batch feeds every program") {
    import spark.implicits._
    val p1 = Frontend.parse(
      """counter gets
        |/^get/ {
        |  gets++
        |}
        |""".stripMargin, "p1")
    val p2 = Frontend.parse(
      """counter all_lines
        |// {
        |  all_lines++
        |}
        |""".stripMargin, "p2")
    val multi = new MultiRunner(Seq(p1, p2), spark, 0)
    multi.processBatch(Seq("get a", "put b", "get c").toDF("line"), 0)
    val c1 = multi.runners("p1").store.snapshot()
      .map(c => c.name -> c.value).toMap
    val c2 = multi.runners("p2").store.snapshot()
      .map(c => c.name -> c.value).toMap
    assert(c1("gets") == VInt(2))
    assert(c2("all_lines") == VInt(3))
  }

  test("live reload swaps the program; bad programs are rejected") {
    import spark.implicits._
    val v1 = Frontend.parse(
      """counter hits
        |/^hit/ {
        |  hits++
        |}
        |""".stripMargin, "reload_test")
    val runner = new StreamRunner(v1, spark, 0)
    runner.processBatch(Seq("hit a", "miss").toDF("line"), 0)
    // v2 adds a labelled counter; `hits` keeps cumulating in the store
    val v2 = Frontend.parse(
      """counter hits
        |counter by_kind by k
        |/^hit (?P<k>\w+)/ {
        |  hits++
        |  by_kind[$k]++
        |}
        |""".stripMargin, "reload_test")
    runner.reload(v2)
    runner.processBatch(Seq("hit a", "hit b").toDF("line"), 1)
    val cells = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(cells(("hits", Map.empty)) == VInt(3))
    assert(cells(("by_kind", Map("k" -> "a"))) == VInt(1))
    // a broken program is rejected at reload; the old one keeps running
    intercept[Exception] {
      runner.reload(Frontend.parse(
        """counter c
          |/^(?P<d>.*)$/ {
          |  strptime($d)
          |  c++
          |}
          |""".stripMargin, "reload_bad"))
    }
    runner.processBatch(Seq("hit c").toDF("line"), 2)
    val after = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(after(("hits", Map.empty)) == VInt(4)) // v2 still active
  }

  test("self-instrumentation: lines_total and runtime error counts") {
    import spark.implicits._
    val prog = Frontend.parse(
      """counter c
        |/^(?P<d>\S+) x$/ {
        |  strptime($d, "2006-01-02")
        |  c++
        |}
        |""".stripMargin, "instr_test")
    val runner = new StreamRunner(prog, spark, 0)
    // 4 lines: 2 good, 1 strptime runtime error (aborts the line, so
    // c++ is skipped), 1 not matching at all (not an error)
    runner.processBatch(Seq("2020-01-02 x", "nope x", "2020-01-03 x",
      "zzz").toDF("line"), 0)
    runner.processBatch(Seq("bad x").toDF("line"), 1)

    val cells = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(cells(("c", Map.empty)) == VInt(2))
    val internal = runner.internalStore.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(internal(("lines_total", Map.empty)) == VInt(5))
    assert(internal(("log_lines_total", Map("logfile" -> ""))) == VInt(5))
    assert(internal(("prog_runtime_errors_total",
      Map("prog" -> "instr_test"))) == VInt(2))

    // exported beside program metrics on /metrics
    val srv = ExportServer.single(runner.store, "instr_test", () => Map.empty,
      internal = Some(runner.internalStore))
    val port = srv.start()
    try {
      val url = new java.net.URI(s"http://localhost:$port/metrics").toURL
      val body = scala.io.Source.fromInputStream(url.openStream()).mkString
      assert(body.contains("prog_runtime_errors_total"))
      assert(body.contains("lines_total"))
    } finally srv.stop()
  }

  test("batch processing-duration histogram on /internalz") {
    import spark.implicits._
    val prog = Frontend.parse(
      """counter n
        |/x/ { n++ }
        |""".stripMargin, "dur_test")
    val runner = new StreamRunner(prog, spark, 0)
    runner.processBatch(Seq("x", "y", "x").toDF("line"), 0)
    runner.processBatch(Seq("x").toDF("line"), 1)

    val hist = runner.internalStore.snapshot().find(
      _.name == "mtail_vm_line_processing_duration_seconds").get
    assert(hist.kind == "histogram" &&
      hist.labels == Map("prog" -> "dur_test"))
    val bs = hist.buckets.get
    // weight = lines: 3 + 1 across the two batches
    assert(bs("count") == 4L)
    assert((bs - "count").values.sum == 4L)
    // sum accumulates true batch seconds, so sum/count is the real
    // mean per-line processing time
    val Snapshot.VFloat(sum) = hist.value: @unchecked
    assert(sum > 0.0)

    val srv = ExportServer.single(runner.store, "dur_test", () => Map.empty,
      internal = Some(runner.internalStore))
    val port = srv.start()
    try {
      val url = new java.net.URI(
        s"http://localhost:$port/internalz").toURL
      val body = scala.io.Source.fromInputStream(url.openStream())
        .mkString
      // reference-identical le bounds (vm.go:35-41), cumulative counts
      assert(body.contains("mtail_vm_line_processing_duration_seconds" +
        "_bucket{prog=\"dur_test\",le=\"2e-05\"}"))
      assert(body.contains("le=\"+Inf\"} 4"))
      assert(body.contains("_count{prog=\"dur_test\"} 4"))
    } finally srv.stop()
  }

  test("del-after TTL expires store cells in stream time") {
    import spark.implicits._
    val prog = Frontend.parse(
      """gauge seen by ip
        |/^(?P<ts>\d+) hit (?P<ip>\S+)$/ {
        |  settime($ts)
        |  seen[$ip] = timestamp()
        |  del seen[$ip] after 2m
        |}
        |""".stripMargin, "ttl_test")
    val runner = new StreamRunner(prog, spark, 0)
    runner.processBatch(Seq("100 hit a").toDF("line"), 0)
    runner.processBatch(Seq("150 hit b").toDF("line"), 1)
    runner.processBatch(Seq("300 hit c").toDF("line"), 2)
    // stream time 300: a (100+120 ≤ 300) and b (150+120 ≤ 300) have
    // lapsed their 2m TTL; c survives
    val ips = runner.store.snapshot().filter(_.name == "seen")
      .map(_.labels("ip")).toSet
    assert(ips == Set("c"))
  }

  test("del-after TTL bounds carried hidden state; expired reads zero") {
    import spark.implicits._
    val prog = Frontend.parse(
      """hidden gauge start by id
        |counter session_time
        |/^(?P<ts>\d+) open (?P<id>\w+)$/ {
        |  settime($ts)
        |  start[$id] = timestamp()
        |  del start[$id] after 2m
        |}
        |/^(?P<ts>\d+) close (?P<id>\w+)$/ {
        |  settime($ts)
        |  session_time += timestamp() - start[$id]
        |}
        |""".stripMargin, "ttl_state")
    val runner = new StreamRunner(prog, spark, 0)
    runner.processBatch(Seq("100 open a").toDF("line"), 0)
    runner.processBatch(Seq("400 open b").toDF("line"), 1)
    // a's state (ts 100) lapsed its TTL at stream time 400
    assert(runner.carriedStateForTest("start")
      .select("k").collect().map(_.getString(0)).toSet == Set("b"))
    // a close on the expired key reads a fresh zero datum, like the
    // reference after ExpireDatum removal
    runner.processBatch(Seq("450 close a").toDF("line"), 2)
    val cells = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(cells(("session_time", Map.empty)) == VInt(450))
  }

  test("limit N holds the newest N cells across batches") {
    import spark.implicits._
    val prog = Frontend.parse(
      """counter hits by page limit 2
        |/^(?P<ts>\d+) (?P<page>\w+)$/ {
        |  settime($ts)
        |  hits[$page]++
        |}
        |""".stripMargin, "limit_stream")
    val runner = new StreamRunner(prog, spark, 0)
    runner.processBatch(Seq("100 alpha").toDF("line"), 0)
    runner.processBatch(Seq("200 beta").toDF("line"), 1)
    runner.processBatch(Seq("300 gamma").toDF("line"), 2)
    val pages = runner.store.snapshot().filter(_.name == "hits")
      .map(_.labels("page")).toSet
    assert(pages == Set("beta", "gamma")) // newest 2 by datum ts
  }

  test("histogram buckets accumulate across batches") {
    import spark.implicits._
    val hprog = Frontend.parse(
      """histogram lat buckets 1, 2, 4
        |/^v=(?P<v>\d+)$/ {
        |  lat = $v
        |}
        |""".stripMargin, "hist_stream")
    val runner = new StreamRunner(hprog, spark, 0)
    runner.processBatch(Seq("v=1", "v=3").toDF("line"), 0)
    runner.processBatch(Seq("v=2", "v=5", "v=1").toDF("line"), 1)

    val c = runner.store.snapshot().find(_.name == "lat").get
    // datum.Buckets accumulates over the whole stream
    // (datum/buckets.go:42-57): batch 2 must not overwrite batch 1
    assert(c.buckets.get == Map("1" -> 2L, "2" -> 1L, "4" -> 1L,
      "+Inf" -> 1L, "count" -> 5L))
    assert(c.value == VInt(12) || c.value == Snapshot.VFloat(12.0))
  }

  test("exporter formats") {
    val cells = Seq(
      Cell("counter", "bytes_total", Map("operation" -> "sent"),
        VInt(62793673), Some(1298440450L)),
      Cell("counter", "connections_total", Map.empty, VInt(52),
        Some(1298411653L)),
      Cell("gauge", "last_size", Map.empty, VInt(7), None))

    val prom = Exporters.prometheus(cells, "rsyncd.mtail")
    assert(prom.contains("# TYPE bytes_total counter"))
    assert(prom.contains(
      """bytes_total{operation="sent",prog="rsyncd.mtail"} 62793673"""))
    assert(prom.contains("# TYPE last_size gauge"))

    // emitTimestamp (prometheus.go:89-93): opt-in per-sample stamps in
    // milliseconds; zero datum time → epoch 0 like time.Time zero
    val stamped = Exporters.prometheus(cells, "rsyncd.mtail",
      emitTimestamp = true)
    assert(stamped.contains("""bytes_total{operation="sent",""" +
      """prog="rsyncd.mtail"} 62793673 1298440450000"""))
    assert(stamped.contains("""last_size{prog="rsyncd.mtail"} 7 0"""))
    // default stays unstamped (the reference's recommendation)
    assert(!prom.contains("62793673 1298440450000"))

    val varz = Exporters.varz(cells, "rsyncd.mtail", "host1")
    assert(varz.contains(
      "bytes_total{operation=sent,prog=rsyncd.mtail,instance=host1} 62793673"))

    // float specials render Go-style (Fdiv/Fmod can legitimately
    // record them); Java's "Infinity" would break a Prometheus scrape
    val specials = Exporters.prometheus(Seq(
      Cell("gauge", "nan_g", Map.empty, Snapshot.VFloat(Double.NaN), None),
      Cell("gauge", "pinf_g", Map.empty,
        Snapshot.VFloat(Double.PositiveInfinity), None),
      Cell("gauge", "ninf_g", Map.empty,
        Snapshot.VFloat(Double.NegativeInfinity), None)), "t")
    assert(specials.contains("""nan_g{prog="t"} NaN"""))
    assert(specials.contains("""pinf_g{prog="t"} +Inf"""))
    assert(specials.contains("""ninf_g{prog="t"} -Inf"""))

    val graphite = Exporters.graphite(cells, "rsyncd.mtail")
    assert(graphite.contains(
      "rsyncd.mtail.bytes_total.operation.sent 62793673 1298440450"))

    val statsd = Exporters.statsd(cells, "rsyncd.mtail")
    assert(statsd.contains(
      "rsyncd.mtail.bytes_total.operation.sent:62793673|c"))
    assert(statsd.contains("rsyncd.mtail.last_size:7|g"))

    val collectd = Exporters.collectd(cells, "rsyncd.mtail", "host1")
    assert(collectd.contains("PUTVAL \"host1/mtail-rsyncd.mtail/" +
      "counter-bytes_total-operation-sent\" interval=60 " +
      "1298440450:62793673"))

    val json = Exporters.json(cells, "rsyncd.mtail",
      Map("bytes_total" -> Seq("operation")))
    assert(json.contains(""""Name": "bytes_total""""))
    assert(json.contains(""""Kind": 1"""))
    assert(json.contains(""""Labels": ["sent"]"""))
  }

  test("emit_prog_label=false drops prog from prometheus and varz only") {
    // -emit_prog_label=false reaches exactly the prometheus and varz
    // formats (exporter/prometheus.go:55, varz.go:52); graphite/statsd/
    // collectd paths keep the program component
    // (TestWritePrometheus's fixtures render `foo 1` with no labels)
    val cells = Seq(
      Cell("counter", "foo", Map.empty, VInt(1), Some(0L)),
      Cell("counter", "bar", Map("a" -> "x"), VInt(2), Some(0L)))

    val prom = Exporters.prometheus(cells, "test", omitProgLabel = true)
    assert(prom.contains("\nfoo 1\n"), prom)
    assert(prom.contains("""bar{a="x"} 2"""), prom)
    assert(!prom.contains("prog="), prom)

    val varz = Exporters.varz(cells, "test", "gunstar",
      omitProgLabel = true)
    assert(varz.contains("foo{instance=gunstar} 1"), varz)
    assert(!varz.contains("prog="), varz)

    // the program path survives in the push formats regardless
    assert(Exporters.graphite(cells, "test").contains("test.foo 1"))
    assert(Exporters.statsd(cells, "test").contains("test.foo:1|c"))

    // and through the server: /metrics + /varz lose prog, /json keeps
    // its Program field (the store dump always carries it)
    val store = new MetricsStore
    store.merge(cells)
    val srv = ExportServer.single(store, "test", () => Map.empty,
      omitProgLabel = true)
    val port = srv.start()
    try {
      def get(path: String): String = {
        val url = new java.net.URI(s"http://localhost:$port$path").toURL
        scala.io.Source.fromInputStream(url.openStream()).mkString
      }
      assert(!get("/metrics").contains("prog="))
      assert(!get("/varz").contains("prog="))
      assert(get("/json").contains(""""Program": "test""""))
    } finally srv.stop()
  }

  test("unix-socket listener serves the same routes; /debug/vars is expvar-shaped") {
    // the reference's -unix_socket bind (cmd/mtail/main.go:43,
    // unix_socket_export_integration_test.go): dial the socket, speak
    // plain HTTP, get the same /metrics body the TCP port serves
    val store = new MetricsStore
    store.merge(Seq(Cell("counter", "c_total", Map.empty, VInt(9),
      Some(100L))))
    val internal = new MetricsStore
    internal.merge(Seq(
      Cell("counter", "lines_total", Map.empty, VInt(7), None),
      Cell("counter", "log_lines_total", Map("logfile" -> "a.log"),
        VInt(7), None)))
    val sock = Files.createTempDirectory("graft-uds")
      .resolve("export.sock")
    // unix-only mode must not bind the TCP port as a construction
    // side effect: two servers built on the SAME fixed port can both
    // serve unix sockets (an eager HttpServer.create would throw
    // BindException on the second)
    val srv = ExportServer.single(store, "p.mtail", () => Map.empty,
      port = 39915, internal = Some(internal))
    val srv2 = ExportServer.single(store, "p.mtail", () => Map.empty,
      port = 39915)
    val sock2 = sock.getParent.resolve("export2.sock")
    srv2.startUnix(sock2.toString)
    srv2.stop()
    srv.startUnix(sock.toString)
    try {
      def get(path: String): String = {
        val ch = java.nio.channels.SocketChannel.open(
          java.net.UnixDomainSocketAddress.of(sock))
        try {
          val req = java.nio.ByteBuffer.wrap(
            s"GET $path HTTP/1.0\r\nHost: graft\r\n\r\n"
              .getBytes("ISO-8859-1"))
          while (req.hasRemaining) ch.write(req)
          val sb = new StringBuilder
          val buf = java.nio.ByteBuffer.allocate(65536)
          while (ch.read(buf) >= 0) {
            buf.flip()
            sb.append(new String(buf.array(), 0, buf.limit(), "UTF-8"))
            buf.clear()
          }
          sb.toString
        } finally ch.close()
      }
      val metrics = get("/metrics")
      assert(metrics.startsWith("HTTP/1.0 200 OK\r\n"), metrics)
      assert(metrics.contains("""c_total{prog="p.mtail"} 9"""), metrics)
      assert(get("/nope").startsWith("HTTP/1.0 404"))

      // /debug/vars: keyless internals as numbers, labelled ones as a
      // label-keyed object (the Go expvar rendering mtail publishes)
      val vars = get("/debug/vars")
      assert(vars.contains(""""lines_total": 7"""), vars)
      assert(vars.contains(""""log_lines_total": {"logfile=a.log": 7}"""),
        vars)
    } finally {
      srv.stop()
      assert(!Files.exists(sock)) // stop() removes the socket file
      Files.deleteIfExists(sock.getParent)
    }
  }

  test("export server serves endpoints") {
    val store = new MetricsStore
    store.merge(Seq(Cell("counter", "c_total", Map.empty, VInt(9),
      Some(100L))))
    val srv = ExportServer.single(store, "p.mtail", () => Map.empty)
    val port = srv.start()
    try {
      def get(path: String): String = {
        val url = new java.net.URI(s"http://localhost:$port$path").toURL
        scala.io.Source.fromInputStream(url.openStream()).mkString
      }
      assert(get("/metrics").contains("c_total"))
      assert(get("/json").contains("\"c_total\""))
      assert(get("/varz").contains("c_total{"))
    } finally srv.stop()
  }

  test("/metrics never emits duplicate TYPE blocks for name collisions") {
    val store = new MetricsStore
    // the program legitimately declares its own lines_total
    store.merge(Seq(Cell("counter", "lines_total", Map.empty, VInt(7),
      Some(100L))))
    val internal = new MetricsStore
    internal.merge(Seq(
      Cell("counter", "lines_total", Map.empty, VInt(99), None),
      Cell("counter", "prog_runtime_errors_total",
        Map("prog" -> "p.mtail"), VInt(1), None)))
    val srv = ExportServer.single(store, "p.mtail", () => Map.empty,
      internal = Some(internal))
    val port = srv.start()
    try {
      def get(path: String): String = {
        val url = new java.net.URI(s"http://localhost:$port$path").toURL
        scala.io.Source.fromInputStream(url.openStream()).mkString
      }
      val m = get("/metrics")
      // one TYPE block per name: the colliding internal cell is
      // excluded from /metrics (still on /internalz)
      assert("# TYPE lines_total".r.findAllIn(m).size == 1)
      assert(m.contains("""lines_total{prog="p.mtail"} 7"""))
      assert(m.contains("prog_runtime_errors_total"))
      assert(get("/internalz").contains("lines_total 99"))
    } finally srv.stop()
  }

  test("-expired_metrics_gc_interval paces the store GC tick " +
      "(main.go:67)") {
    import spark.implicits._
    def mk(gcMs: Long) = new StreamRunner(Frontend.parse(
      """counter hits by page limit 2
        |/^(?P<ts>\d+) (?P<page>\w+)$/ {
        |  settime($ts)
        |  hits[$page]++
        |}
        |""".stripMargin, "gc_tick"), spark, 0, gcIntervalMs = gcMs)
    // a one-hour interval: the limit trim never fires inside the test
    // window, so all three pages survive in the store...
    val slow = mk(3600L * 1000)
    slow.processBatch(Seq("100 alpha").toDF("line"), 0)
    slow.processBatch(Seq("200 beta").toDF("line"), 1)
    slow.processBatch(Seq("300 gamma").toDF("line"), 2)
    assert(slow.store.snapshot().count(_.name == "hits") == 3)
    // ...while the every-batch default trims to the declared limit
    val fast = mk(0)
    fast.processBatch(Seq("100 alpha").toDF("line"), 0)
    fast.processBatch(Seq("200 beta").toDF("line"), 1)
    fast.processBatch(Seq("300 gamma").toDF("line"), 2)
    assert(fast.store.snapshot().count(_.name == "hits") == 2)
  }

  test("-vm_logs_runtime_errors gates the standard-log error line " +
      "(main.go:62)") {
    import spark.implicits._
    def run(log: Boolean): String = {
      val runner = new StreamRunner(Frontend.parse(
        """counter c
          |/^(?P<d>\S+) x$/ {
          |  strptime($d, "2006-01-02")
          |  c++
          |}
          |""".stripMargin, "errlog"), spark, 0,
        logRuntimeErrors = log)
      val buf = new java.io.ByteArrayOutputStream()
      val prev = System.err
      try {
        System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
        // one strptime runtime error (aborts the line), one good line
        runner.processBatch(Seq("nope x", "2020-01-03 x").toDF("line"),
          0)
      } finally System.setErr(prev)
      new String(buf.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8)
    }
    assert(run(log = true).contains(
      "prog errlog: 1 runtime error(s) this batch"))
    assert(!run(log = false).contains("runtime error"))
  }

  test("-http_debugging_endpoint / -http_info_endpoint gate their " +
      "route families (main.go:75-76)") {
    val store = new MetricsStore
    store.merge(Seq(Cell("counter", "c_total", Map.empty, VInt(1),
      None)))
    def status(port: Int, path: String): Int = {
      val conn = new java.net.URI(s"http://localhost:$port$path")
        .toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try conn.getResponseCode finally conn.disconnect()
    }
    val gated = ExportServer.single(store, "t", () => Map.empty,
      debugEndpoints = false, infoEndpoints = false)
    val p1 = gated.start()
    try {
      assert(status(p1, "/metrics") == 200) // never gated
      assert(status(p1, "/json") == 200)
      assert(status(p1, "/debug/vars") == 404)
      assert(status(p1, "/internalz") == 404)
      assert(status(p1, "/varz") == 404)
      assert(status(p1, "/progz") == 404)
    } finally gated.stop()
    val open = ExportServer.single(store, "t", () => Map.empty)
    val p2 = open.start()
    try {
      assert(status(p2, "/debug/vars") == 200)
      assert(status(p2, "/varz") == 200)
      assert(status(p2, "/progz") == 200)
    } finally open.stop()
  }

  test("a String-PINNED counter's += appends across batches like " +
      "text (ADD_ASSIGN is Cat for any kind)") {
    // first typed use pins `parts` String (TypeInfer); the VM's datum
    // is one growing string, so batch N+1's local concat must APPEND
    // at the store merge — pre-r19 the counter add arm's (VStr,VStr)
    // merge replaced, dropping batch N's suffix (ADVICE r18)
    val p = Frontend.parse(
      """counter parts by k
        |/^w (?P<s>[a-z]+)$/ { parts["x"] += $s }
        |""".stripMargin, "strpin_concat")
    val runner = new StreamRunner(p, spark, 0)
    import spark.implicits._
    runner.processBatch(Seq("w aa", "w bb").toDF("line"), 0)
    runner.processBatch(Seq("w cc").toDF("line"), 1)
    val cells = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(cells(("parts", Map("k" -> "x"))) ==
      Snapshot.VStr("aabbcc"))
  }

  test("Expire existence carries across batches: created-in-batch-1 " +
      "cells survive batch-2 TTL dels, missing keys abort, tombstones " +
      "carry") {
    // the equivalence fuzz deliberately excludes TTL shapes (stream
    // time expires state), so the carried $ex$ relations
    // (finalReadStateDfs -> initialState) need a directed pin:
    //  batch 1 writes seen[a] and creates seen[r] via a read, then
    //  plain-dels seen[d] after writing it (tombstone);
    //  batch 2 TTL-dels each key: a (write-carried, ok), r
    //  (read-creation-carried, ok), d (tombstoned, abort), m
    //  (never seen, abort). ok++ after the del counts survivors.
    val p = Frontend.parse(
      """counter seen by k
        |counter probe by k
        |counter ok
        |/^w (?P<s>[a-z]+)$/ { seen[$s]++ }
        |/^r (?P<s>[a-z]+)$/ { probe[$s] = seen[$s] }
        |/^x (?P<s>[a-z]+)$/ { seen[$s]++
        |del seen[$s] }
        |/^e (?P<s>[a-z]+)$/ { del seen[$s] after 1h
        |ok++ }
        |""".stripMargin, "ttl_exist_carry")
    val runner = new StreamRunner(p, spark, 0)
    import spark.implicits._
    runner.processBatch(Seq("w aa", "r rr", "x dd").toDF("line"), 0)
    runner.processBatch(Seq("e aa", "e rr", "e dd", "e mm")
      .toDF("line"), 1)
    val cells = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    // aa: write-carried; rr: created by batch 1's READ (zero cell in
    // the carried state); dd/mm: abort -> ok not incremented
    assert(cells(("ok", Map.empty)) == VInt(2), cells.toString)
  }

  test("stream-time TTL expiry removes existence in lockstep: an " +
      "Expire on a GC'd cell aborts like the reference's " +
      "removed-datum error") {
    // `del ... after 1h` gives `seen` a 1h state TTL; the runner's
    // GC-analogue filter drops carried keys older than stream time
    // minus TTL at each batch boundary, and (r19) filters the $ex$
    // existence relation in lockstep - so a later Expire on the
    // expired key aborts, exactly like ExpireDatum erroring on a cell
    // the reference's hourly Gc already removed
    val p = Frontend.parse(
      """counter seen by k
        |counter ok
        |/^w (?P<s>[a-z]+) (?P<t>\d+)$/ { settime($t)
        |seen[$s]++ }
        |/^e (?P<s>[a-z]+) (?P<t>\d+)$/ { settime($t)
        |del seen[$s] after 1h
        |ok++ }
        |""".stripMargin, "ttl_exist_expire")
    val runner = new StreamRunner(p, spark, 0)
    import spark.implicits._
    runner.processBatch(Seq("w aa 1000").toDF("line"), 0)
    // advance stream time 2h+ past aa's last write; bb stays fresh
    runner.processBatch(Seq("w bb 9000").toDF("line"), 1)
    // aa expired (1000 < 9000-3600) -> abort; bb alive -> ok
    runner.processBatch(Seq("e aa 9100", "e bb 9100")
      .toDF("line"), 2)
    val cells = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(cells(("ok", Map.empty)) == VInt(1), cells.toString)
  }
}
