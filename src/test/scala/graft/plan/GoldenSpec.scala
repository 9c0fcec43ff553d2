package graft.plan

import graft.SparkSpec
import graft.mtail.{Ir, LogLines, Snapshot}
import graft.mtail.Ir._

/** Golden end-to-end tests: run a program over the reference's sample log
  * in batch one-shot mode and compare the exported store against the
  * `.golden` file (mirrors
  * `internal/mtail/examples_integration_test.go:26-126`).
  *
  * Programs here are hand-built IR equivalents of the `.mtail` sources;
  * the DSL frontend replaces these with parsed programs (same IR) and
  * these stay as frontend-independent plan tests.
  */
class GoldenSpec extends SparkSpec {

  private val testdata = "/root/reference/internal/mtail/testdata"

  def runGolden(program: Ir.Program, log: String, golden: String): Unit = {
    val lines = LogLines.batch(spark, log)
    val pb = new PlanBuilder(program, lines, defaultYear = 0)
    val actual = Snapshot.collect(pb.snapshot())
    val expected = Snapshot.readGolden(
      scala.io.Source.fromFile(golden).getLines())
    val d = Snapshot.diff(expected, actual)
    assert(d.isEmpty, s"\n$d")
  }

  test("linecount: /$/ { lines_total++ }") {
    // examples/linecount.mtail over rsyncd.log — 235 lines
    val program = Program("linecount.mtail",
      Seq(MetricDecl(Counter, "lines_total")),
      Seq(CondBlock(CondPattern("$"), Seq(IncStmt("lines_total")))))
    val lines = LogLines.batch(spark, s"$testdata/rsyncd.log")
    val pb = new PlanBuilder(program, lines, 0)
    val cells = Snapshot.collect(pb.snapshot()).map(_.copy(wasSet = None))
    assert(cells == Seq(Snapshot.Cell("counter", "lines_total", Map.empty,
      Snapshot.VInt(235), None)))
  }

  test("rsyncd.mtail golden") {
    // examples/rsyncd.mtail:1-50
    val program = Program("rsyncd.mtail",
      Seq(
        MetricDecl(Counter, "bytes_total", Seq("operation")),
        MetricDecl(Counter, "connections_total"),
        MetricDecl(Counter, "connection_time_total",
          exportAs = Some("connection-time_total")),
        MetricDecl(Counter, "transfers_total", Seq("operation", "module")),
        MetricDecl(Gauge, "connection_time", Seq("pid"), hidden = true)),
      Seq(CondBlock(
        CondPattern("""^(?P<date>\d+/\d+/\d+ \d+:\d+:\d+) \[(?P<pid>\d+)\] """),
        Seq(
          ExprStmt(Call("strptime",
            Seq(Capref("date"), StrLit("2006/01/02 15:04:05")))),
          CondBlock(
            CondPattern("""(?P<operation>\S+) (\S+) \[\S+\] (?P<module>\S+) \(\S*\) \S+ (?P<bytes>\d+)"""),
            Seq(IncStmt("transfers_total",
              Seq(Capref("operation"), Capref("module"))))),
          CondBlock(
            CondPattern("""connect from \S+ \(\d+\.\d+\.\d+\.\d+\)"""),
            Seq(
              IncStmt("connections_total"),
              SetStmt("connection_time", Seq(Capref("pid")),
                Call("timestamp", Nil)))),
          CondBlock(
            CondPattern("""sent (?P<sent>\d+) bytes  received (?P<received>\d+) bytes  total size \d+"""),
            Seq(
              IncStmt("bytes_total", Seq(StrLit("sent")),
                Capref("sent")),
              IncStmt("bytes_total", Seq(StrLit("received")),
                Capref("received")),
              IncStmt("connection_time_total", Nil,
                Binop("-", Call("timestamp", Nil),
                  MetricRead("connection_time", Seq(Capref("pid"))))),
              DelStmt("connection_time", Seq(Capref("pid")))))))))
    runGolden(program, s"$testdata/rsyncd.log", s"$testdata/rsyncd.golden")
  }

  test("sftp.mtail golden (yearless syslog, nested cond exprs)") {
    val program = Program("sftp.mtail",
      Seq(
        MetricDecl(Counter, "login_count", Seq("username")),
        MetricDecl(Counter, "logout_count", Seq("username")),
        MetricDecl(Counter, "bytes_read"),
        MetricDecl(Counter, "files_read"),
        MetricDecl(Counter, "bytes_written"),
        MetricDecl(Counter, "files_written"),
        MetricDecl(Counter, "user_bytes_read", Seq("username")),
        MetricDecl(Counter, "user_files_read", Seq("username")),
        MetricDecl(Counter, "user_bytes_written", Seq("username")),
        MetricDecl(Counter, "user_files_written", Seq("username"))),
      Seq(CondBlock(
        CondPattern("""^(?P<date>\w+\s+\d+\s+\d+:\d+:\d+)\s+[\w\.-]+\s+sftp-server"""),
        Seq(
          ExprStmt(Call("strptime",
            Seq(Capref("date"), StrLit("Jan _2 15:04:05")))),
          CondBlock(
            CondPattern("""session opened for local user (?P<username>\w+)"""),
            Seq(IncStmt("login_count", Seq(Capref("username"))))),
          CondBlock(
            CondPattern("""session closed for local user (?P<username>\w+)"""),
            Seq(IncStmt("logout_count", Seq(Capref("username"))))),
          CondBlock(
            CondPattern("""close "[^"]+" bytes read (?P<read>\d+) written (?P<written>\d+)"""),
            Seq(
              CondBlock(CondExpr(Binop("!=", Capref("read"), IntLit(0))),
                Seq(IncStmt("bytes_read", Nil, Capref("read")),
                  IncStmt("files_read"))),
              CondBlock(CondExpr(Binop("!=", Capref("written"), IntLit(0))),
                Seq(IncStmt("bytes_written", Nil, Capref("written")),
                  IncStmt("files_written"))),
              CondBlock(
                CondPattern("""close "/home/(?P<username>[^/]+)/[^"]+""""),
                Seq(
                  CondBlock(CondExpr(Binop("!=", Capref("read"), IntLit(0))),
                    Seq(IncStmt("user_bytes_read", Seq(Capref("username")),
                      Capref("read")),
                      IncStmt("user_files_read", Seq(Capref("username"))))),
                  CondBlock(CondExpr(Binop("!=", Capref("written"),
                    IntLit(0))),
                    Seq(IncStmt("user_bytes_written",
                      Seq(Capref("username")), Capref("written")),
                      IncStmt("user_files_written",
                        Seq(Capref("username")))))))))))))
    runGolden(program, s"$testdata/sftp_chroot.log",
      s"$testdata/sftp_chroot.golden")
  }
}
