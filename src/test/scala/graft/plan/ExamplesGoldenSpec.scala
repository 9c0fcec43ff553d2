package graft.plan

import graft.SparkSpec
import graft.mtail.{Frontend, LogLines, Snapshot}

/** The reference's own golden end-to-end table
  * (`internal/mtail/examples_integration_test.go:26-86`), driven through
  * the real DSL frontend: parse the shipped `.mtail` program, run it over
  * the sample log in batch one-shot mode, compare the exported store
  * against the `.golden` file. The dhcpd input log is absent from the
  * repo (FIXTURES.md §3) so dhcpd stays compile-only.
  */
class ExamplesGoldenSpec extends SparkSpec {

  private val ref = "/root/reference"
  private val testdata = s"$ref/internal/mtail/testdata"

  private val triples = Seq(
    ("rsyncd.mtail", "rsyncd.log", "rsyncd.golden"),
    ("sftp.mtail", "sftp_chroot.log", "sftp_chroot.golden"),
    ("ntpd.mtail", "ntp4", "ntp4.golden"),
    ("ntpd_peerstats.mtail", "xntp3_peerstats", "xntp3_peerstats.golden"),
    ("apache_combined.mtail", "apache-combined.log",
      "apache-combined.golden"),
    ("apache_common.mtail", "apache-common.log", "apache-common.golden"),
    ("vsftpd.mtail", "vsftpd_log", "vsftpd_log.golden"),
    ("vsftpd.mtail", "vsftpd_xferlog", "vsftpd_xferlog.golden"),
    ("lighttpd.mtail", "lighttpd_access.log", "lighttpd_accesslog.golden"),
    ("mysql_slowqueries.mtail", "mysql_slowqueries.log",
      "mysql_slowqueries.golden"))

  triples.foreach { case (prog, log, golden) =>
    test(s"$prog on $log") {
      val src = scala.io.Source.fromFile(s"$ref/examples/$prog").mkString
      val program = Frontend.parse(src, prog)
      val lines = LogLines.batch(spark, s"$testdata/$log")
      val pb = new PlanBuilder(program, lines, defaultYear = 0)
      // the production lifecycle (Graft.oneShot, StreamRunner): probe
      // joins build against the cached extraction and the aggregation
      // branches scan the checkpointed leaf — without this, every
      // branch replans the full join chain
      pb.materializeExtraction()
      val actual =
        try Snapshot.collect(pb.snapshot())
        finally pb.unpersistExtraction()
      val expected = Snapshot.readGolden(
        scala.io.Source.fromFile(s"$testdata/$golden").getLines())
      val d = Snapshot.diff(expected, actual)
      assert(d.isEmpty, s"\n$d")
    }
  }

  test("dhcpd.mtail compiles to a plan (input log not in repo)") {
    val src = scala.io.Source
      .fromFile(s"$ref/examples/dhcpd.mtail").mkString
    val program = Frontend.parse(src, "dhcpd.mtail")
    val lines = LogLines.batch(spark, s"$testdata/rsyncd.log")
    val pb = new PlanBuilder(program, lines, defaultYear = 0)
    assert(pb.snapshot().columns.nonEmpty)
  }

  test("every example program compiles to a runnable plan") {
    // beyond the golden set: histogram, timer, rails, postfix,
    // apache_metrics, … must parse, plan, and execute over sample lines
    val dir = new java.io.File(s"$ref/examples")
    val lines = LogLines.batch(spark, s"$testdata/rsyncd.log")
    dir.listFiles().filter(_.getName.endsWith(".mtail")).sorted
      .foreach { f =>
        val program = Frontend.parse(
          scala.io.Source.fromFile(f).mkString, f.getName)
        val pb = new PlanBuilder(program, lines, defaultYear = 0)
        pb.materializeExtraction()
        val n =
          try pb.snapshot().count() // execute, not just plan
          finally pb.unpersistExtraction()
        info(s"${f.getName}: $n exported cells")
      }
  }
}
