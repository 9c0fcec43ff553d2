package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** CLI surface (`cmd/mtail/main.go:40-83`): flag parsing with Go flag
  * semantics, -compile_only mirroring the reference's
  * `compile_only_integration_test.go` (a bad program reports "compile
  * failed", a good set reports nothing), and -one_shot reproducing the
  * rsyncd golden run end-to-end through the Main code path.
  */
class MainSpec extends SparkSpec {

  private val ref = "/root/reference"

  private def withDir(f: Path => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-main")
    try f(dir)
    finally {
      val s = Files.list(dir)
      try s.iterator().forEachRemaining(p => Files.deleteIfExists(p))
      finally s.close()
      Files.deleteIfExists(dir)
    }
  }

  test("flag parsing: Go syntax, repeats, commas, bools, errors") {
    val cfg = Main.parseArgs(Seq(
      "--progs", "/p", "-logs", "/a.log,/b.log", "--logs=/c.log",
      "-one_shot", "--one_shot_format=prometheus", "-port", "1234",
      "--override_timezone", "America/New_York",
      "-emit_prog_label=false", "--emit_metric_timestamp",
      "-poll_interval", "1s", "--metric_push_interval=1h30m",
      "-graphite_host_port", "gr:2003",
      "-address", "127.0.0.1", "-unix_socket", "/tmp/g.sock")).toOption.get
    assert(cfg.progs == "/p")
    assert(cfg.logs == Seq("/a.log", "/b.log", "/c.log"))
    assert(cfg.oneShot && cfg.oneShotFormat == "prometheus")
    assert(cfg.port == 1234)
    assert(cfg.overrideTimezone == "America/New_York")
    assert(!cfg.emitProgLabel && cfg.emitMetricTimestamp)
    assert(cfg.pollIntervalMs == 1000)
    assert(cfg.metricPushIntervalMs == 90 * 60 * 1000)
    assert(cfg.graphiteHostPort.contains("gr:2003"))
    assert(cfg.address == "127.0.0.1")
    assert(cfg.unixSocket.contains("/tmp/g.sock"))

    // the reference's own exit messages for the two required flags
    assert(Main.parseArgs(Seq("-logs", "/a")).swap.toOption.get
      .contains("-progs"))
    assert(Main.parseArgs(Seq("-progs", "/p")).swap.toOption.get
      .contains("-logs"))
    // -compile_only needs no logs (main.go:140-144)
    assert(Main.parseArgs(Seq("-progs", "/p", "-compile_only")).isRight)
    assert(Main.parseArgs(Seq("-bogus_flag")).isLeft)
    // deprecated flags (main.go:83-85) parse as warn-only no-ops: a
    // legacy invocation still starts and the config is unchanged
    val dep = Main.parseArgs(Seq("-progs", "/p", "-logs", "/a",
      "-disable_fsnotify", "--metric_push_interval_seconds=60",
      "-stale_log_gc_interval", "1h")).toOption.get
    assert(dep == Main.parseArgs(Seq("-progs", "/p", "-logs", "/a"))
      .toOption.get)
    assert(Main.parseArgs(Seq("-progs", "/p", "-logs", "/a",
      "-one_shot_format", "csv")).isLeft)
    assert(Main.parseArgs(Seq("positional")).isLeft)
    // malformed push targets are usage errors at parse time, not a
    // NumberFormatException after the daemon is up
    assert(Main.parseArgs(Seq("-progs", "/p", "-logs", "/a",
      "-graphite_host_port", "gr:abc")).isLeft)
    assert(Main.parseArgs(Seq("-progs", "/p", "-logs", "/a",
      "-statsd_hostport", "nocolon")).isLeft)
    // -version/-help parse without the required flags
    assert(Main.parseArgs(Seq("-version")).toOption
      .exists(_.showVersion))
    assert(Main.parseArgs(Seq("--help")).toOption.exists(_.showHelp))
  }

  test("-logs split is brace-aware in both modes") {
    // "*.{err,out}" is ONE glob; the comma inside braces must not
    // split it (previously one_shot got the broken halves while the
    // daemon path accidentally repaired them)
    val cfg = Main.parseArgs(Seq("-progs", "/p",
      "-logs", "/var/log/app.{err,out},/var/log/b.log")).toOption.get
    assert(cfg.logs == Seq("/var/log/app.{err,out}", "/var/log/b.log"))
  }

  test("config-granularity flags parse: poll_log_interval, " +
      "expired_metrics_gc_interval, vm_logs_runtime_errors, " +
      "http endpoints (main.go:62,66-67,75-76)") {
    val cfg = Main.parseArgs(Seq("-progs", "/p", "-logs", "/a",
      "-poll_log_interval", "0",
      "-expired_metrics_gc_interval", "30m",
      "-vm_logs_runtime_errors=false",
      "-http_debugging_endpoint=false",
      "-http_info_endpoint=false")).toOption.get
    assert(cfg.pollLogIntervalMs == 0)
    assert(cfg.expiredMetricsGcIntervalMs == 30L * 60 * 1000)
    assert(!cfg.vmLogsRuntimeErrors)
    assert(!cfg.httpDebugEndpoints && !cfg.httpInfoEndpoints)
    // defaults mirror the reference's
    val d = Main.parseArgs(Seq("-progs", "/p", "-logs", "/a"))
      .toOption.get
    assert(d.pollLogIntervalMs == 250)
    assert(d.expiredMetricsGcIntervalMs == 3600L * 1000)
    assert(d.vmLogsRuntimeErrors && d.httpDebugEndpoints &&
      d.httpInfoEndpoints)
    // bad duration is a usage error
    assert(Main.parseArgs(Seq("-progs", "/p", "-logs", "/a",
      "-poll_log_interval", "250")).isLeft) // Go durations need units
  }

  test("-max_regexp_length / -max_recursion_depth reach the compiler") {
    val cfg = Main.parseArgs(Seq("-progs", "/p", "-logs", "/a",
      "-max_regexp_length", "64",
      "--max_recursion_depth=10")).toOption.get
    assert(cfg.maxRegexpLength == 64 && cfg.maxRecursionDepth == 10)
    assert(Main.parseArgs(Seq("-progs", "/p", "-logs", "/a",
      "-max_regexp_length", "abc")).isLeft)
    withDir { dir =>
      // 70-char regex: fine under the 1024 default, over a 64 cap
      Files.write(dir.resolve("long.mtail"),
        ("counter c\n/" + "x" * 70 + "/ {\n  c++\n}\n")
          .getBytes(StandardCharsets.UTF_8))
      assert(Main.compileAll(dir.toString)
        .forall(_._2.isEmpty), "under the default cap: compiles")
      val errs = Main.compileAll(dir.toString, maxRegexpLength = 64)
        .collect { case (n, Some(e)) => n -> e }
      assert(errs.size == 1 && errs.head._2.contains(
        "maximum regular expression pattern length of 64"))
    }
  }

  test("-dump_ast / -dump_ast_types / -dump_bytecode emit the " +
      "compile-stage artifacts (main.go:53-55)") {
    withDir { dir =>
      Files.write(dir.resolve("d.mtail"),
        """counter lines by op
          |/(?P<op>\w+) (?P<n>\d+)/ {
          |  lines[$op] += $n
          |}
          |""".stripMargin.getBytes(StandardCharsets.UTF_8))
      val base = Main.parseArgs(Seq("-progs", dir.toString,
        "-logs", "/dev/null", "-dump_ast", "-dump_ast_types",
        "-dump_bytecode")).toOption.get
      assert(base.dumpAst && base.dumpAstTypes && base.dumpBytecode)
      val dumps = Main.dumpPrograms(base, () => spark)
      assert(dumps.size == 3)
      // parsed IR
      assert(dumps(0).startsWith("d.mtail AST:"))
      assert(dumps(0).contains("program d.mtail") &&
        dumps(0).contains("decl ") && dumps(0).contains("stmt "))
      // typed IR: capture groups with inferred types
      assert(dumps(1).startsWith("d.mtail AST with Type Annotation:"))
      assert(dumps(1).contains("$op (1): String"))
      assert(dumps(1).contains("$n (2): Int"))
      // "bytecode" = the optimized Catalyst plan
      assert(dumps(2).startsWith("d.mtail plan:"))
      assert(dumps(2).contains("Aggregate") ||
        dumps(2).contains("Project"), s"no plan nodes in: ${dumps(2)}")
      // no flags → no dumps
      assert(Main.dumpPrograms(base.copy(dumpAst = false,
        dumpAstTypes = false, dumpBytecode = false),
        () => spark).isEmpty)
    }
  }

  test("-compile_only -dump_ast_types drives the argv → stderr " +
      "wiring end to end (mtail.go:41-52)") {
    withDir { dir =>
      Files.write(dir.resolve("d.mtail"),
        """counter lines by op
          |/(?P<op>\w+) (?P<n>\d+)/ {
          |  lines[$op] += $n
          |}
          |""".stripMargin.getBytes(StandardCharsets.UTF_8))
      val cfg = Main.parseArgs(Seq("-compile_only", "-dump_ast_types",
        "-progs", dir.toString)).toOption.get
      val buf = new java.io.ByteArrayOutputStream()
      val prevErr = System.err
      val rc =
        try {
          System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
          Main.compileOnlyRun(cfg, () => spark)
        } finally System.setErr(prevErr)
      val err = new String(buf.toByteArray, StandardCharsets.UTF_8)
      assert(rc == 0)
      assert(err.contains("d.mtail AST with Type Annotation:"))
      assert(err.contains("$op (1): String") &&
        err.contains("$n (2): Int"))
      // a broken program flips the exit code and reports on stderr
      Files.write(dir.resolve("bad.mtail"),
        "asdfasdf\n".getBytes(StandardCharsets.UTF_8))
      val buf2 = new java.io.ByteArrayOutputStream()
      val rc2 =
        try {
          System.setErr(new java.io.PrintStream(buf2, true, "UTF-8"))
          Main.compileOnlyRun(cfg, () => spark)
        } finally System.setErr(prevErr)
      assert(rc2 == 1)
      assert(new String(buf2.toByteArray, StandardCharsets.UTF_8)
        .contains("compile failed for bad.mtail"))
    }
  }

  test("host:port validation accepts bracketed IPv6") {
    assert(Main.splitHostPort("[::1]:2003").contains(("::1", 2003)))
    assert(Main.splitHostPort("host:2003").contains(("host", 2003)))
    assert(Main.splitHostPort("1.2.3.4:80").contains(("1.2.3.4", 80)))
    // unbracketed IPv6 = "too many colons" (Go net.SplitHostPort)
    assert(Main.splitHostPort("::1:2003").isEmpty)
    assert(Main.splitHostPort("noport").isEmpty)
    assert(Main.splitHostPort("[::1]2003").isEmpty)
    assert(Main.parseArgs(Seq("-progs", "/p", "-logs", "/a",
      "-graphite_host_port", "[::1]:2003")).isRight)
  }

  test("Go duration parsing") {
    assert(Main.parseDurationMs("250ms") == 250)
    assert(Main.parseDurationMs("1h30m") == 90 * 60 * 1000)
    assert(Main.parseDurationMs("1.5s") == 1500)
    // ParseDuration's special case: bare "0" is legal (no unit needed)
    assert(Main.parseDurationMs("0") == 0)
    assert(Main.parseDurationMs("-1s") == -1000)
    intercept[IllegalArgumentException](Main.parseDurationMs("250"))
    intercept[IllegalArgumentException](Main.parseDurationMs("abc"))
  }

  test("compile_only: bad program reports compile failed, good is clean") {
    // TestBadProgramFailsCompilation
    // (internal/mtail/compile_only_integration_test.go:18-34)
    withDir { dir =>
      Files.write(dir.resolve("bad.mtail"),
        "asdfasdf\n".getBytes(StandardCharsets.UTF_8))
      Files.write(dir.resolve("good.mtail"),
        "counter c\n/x/ {\n  c++\n}\n".getBytes(StandardCharsets.UTF_8))
      // hidden + non-.mtail files are skipped (runtime.go:104-112)
      Files.write(dir.resolve(".hidden.mtail"),
        "also garbage\n".getBytes(StandardCharsets.UTF_8))
      Files.write(dir.resolve("notes.txt"),
        "not a program\n".getBytes(StandardCharsets.UTF_8))
      val results = Main.compileAll(dir.toString).toMap
      assert(results.keySet == Set("bad.mtail", "good.mtail"))
      assert(results("bad.mtail").isDefined)
      assert(results("good.mtail").isEmpty)
    }
  }

  test("one_shot reproduces the rsyncd golden through the CLI path") {
    withDir { progs =>
      Files.copy(java.nio.file.Paths.get(s"$ref/examples/rsyncd.mtail"),
        progs.resolve("rsyncd.mtail"))
      val cfg = Main.parseArgs(Seq("-progs", progs.toString,
        "-logs", s"$ref/internal/mtail/testdata/rsyncd.log",
        "-one_shot", "-one_shot_format", "prometheus",
        // golden timestamps are naive 2011 dates; year patching off
        "-syslog_use_current_year=false")).toOption.get
      val prom = Main.oneShot(spark, cfg)
      // values straight from rsyncd.golden:1-3
      assert(prom.contains("""bytes_total{operation="sent",""" +
        """prog="rsyncd.mtail"} 62793673"""), prom)
      assert(prom.contains(
        """connections_total{prog="rsyncd.mtail"} 52"""), prom)

      val json = Main.oneShot(spark,
        cfg.copy(oneShotFormat = "json"))
      assert(json.contains(""""Name": "bytes_total""""), json)
      assert(json.contains(""""Program": "rsyncd.mtail""""), json)

      // a bad program aborts the run (OneShot => ErrorsAbort,
      // options.go:148-153)
      Files.write(progs.resolve("bad.mtail"),
        "asdfasdf\n".getBytes(StandardCharsets.UTF_8))
      val e = intercept[RuntimeException](Main.oneShot(spark, cfg))
      assert(e.getMessage.contains("compile failed for bad.mtail"))
    }
  }
}
