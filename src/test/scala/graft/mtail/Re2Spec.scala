package graft.mtail

import org.scalatest.funsuite.AnyFunSuite

class Re2Spec extends AnyFunSuite {
  import Re2._

  test("named group translation strips names") {
    val p = parse("""^(?P<date>\d+/\d+/\d+ \d+:\d+:\d+) \[(?P<pid>\d+)\] """)
    assert(p.groups.map(_.name) == Seq(Some("date"), Some("pid")))
    assert(p.groups.map(_.index) == Seq(1, 2))
    assert(!p.java.contains("?P<"))
    val m = java.util.regex.Pattern.compile(p.java)
      .matcher("2011/02/22 21:50:30 [8203] rsyncd version 2.6.9 starting")
    assert(m.find())
    assert(m.group(1) == "2011/02/22 21:50:30")
    assert(m.group(2) == "8203")
  }

  test("type inference: digits-plus is Int, bare class is String (quirk)") {
    val p1 = parse("""(\d+)""")
    assert(inferCaprefType(p1, 1) == CapInt)
    val p2 = parse("""(\d)""") // bare char class at top → String
    assert(inferCaprefType(p2, 1) == CapString)
    val p3 = parse("""([0-9]+)""")
    assert(inferCaprefType(p3, 1) == CapInt)
    val p4 = parse("""(-?\d+\.\d+)""")
    assert(inferCaprefType(p4, 1) == CapFloat)
    val p5 = parse("""(\d+\.\d+\.\d+\.\d+)""") // two+ dots → String
    assert(inferCaprefType(p5, 1) == CapString)
    val p6 = parse("""(\S+)""")
    assert(inferCaprefType(p6, 1) == CapString)
    val p7 = parse("""([+-])""")
    assert(inferCaprefType(p7, 1) == CapString)
    val p8 = parse("""(\d+(?:\.\d+)?)""")
    assert(inferCaprefType(p8, 1) == CapFloat)
  }

  test("nested and non-capturing groups number like RE2") {
    val p = parse("""(a(b(?:c)(d)))(e)""")
    assert(p.groups.map(_.index) == Seq(1, 2, 3, 4))
    val m = java.util.regex.Pattern.compile(p.java).matcher("abcde")
    assert(m.find() && m.group(3) == "d" && m.group(4) == "e")
  }

  test("posix classes translate") {
    val p = parse("""([^[:print:]]+)""")
    val pat = java.util.regex.Pattern.compile(p.java)
    val m = pat.matcher("abcd")
    assert(m.find() && m.group(1) == "")
  }

  test("alternate group type is LUB of branches") {
    val p = parse("""(\d+|\d+\.\d+)""")
    assert(inferCaprefType(p, 1) == CapFloat)
    val p2 = parse("""(\d+|\w+)""")
    assert(inferCaprefType(p2, 1) == CapString)
  }

  test("escaped slash and metachars survive") {
    val p = parse("""GET (\S+) HTTP/(\d+\.\d+)""")
    val m = java.util.regex.Pattern.compile(p.java)
      .matcher("GET /index.html HTTP/1.1")
    assert(m.find() && m.group(1) == "/index.html" && m.group(2) == "1.1")
  }

  test("representative example program patterns parse and compile") {
    // verbatim patterns from the reference's shipped examples (a full
    // sweep happens via the DSL frontend once the lexer knows pattern
    // boundaries; this covers the distinctive syntax)
    val patterns = Seq(
      // rsyncd.mtail
      """^(?P<date>\d+/\d+/\d+ \d+:\d+:\d+) \[(?P<pid>\d+)\] """,
      """(?P<operation>\S+) (\S+) \[\S+\] (?P<module>\S+) \(\S*\) \S+ (?P<bytes>\d+)""",
      """connect from \S+ \(\d+\.\d+\.\d+\.\d+\)""",
      """sent (?P<sent>\d+) bytes  received (?P<received>\d+) bytes  total size \d+""",
      // apache_combined.mtail
      """^(?P<hostname>\S+) (?P<remote_logname>\S+) (?P<remote_username>\S+) \[(?P<timestamp>\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} (\+|-)\d{4})\] "(?P<request_method>[A-Z]+) (?P<URI>\S+) (?P<http_version>HTTP/[0-9\.]+)" (?P<status_code>\d{3}) ((?P<response_size>\d+)|-) "(?P<referer>\S+)" "(?P<user_agent>[[:print:]]+)"$""",
      // dhcpd-style alternation with nested named groups
      """(?P<date>(?P<legacy_date>\w+\s+\d+\s+\d+:\d+:\d+)|(?P<rfc3339_date>\d{4}-\d{2}-\d{2}T\d+:\d+:\d+[\.\d]*[+-]\d{2}:\d{2}))\s+(?:\w+@)?(?P<hostname>[\w\.-]+)\s+(?P<application>[\w\.-]+)(?:\[(?P<pid>\d+)\])?:\s+(?P<message>.*)""",
      // sftp.mtail
      """sent (?P<sent>\d+) bytes\s+received (?P<received>\d+) bytes\s+total size (?P<total>\d+)""",
      // mysql_slowqueries.mtail
      """^# Query_time: (?P<query_time>\d+)(?:\.(?P<query_time_frac>\d+))?\s+Lock_time: (?P<lock_time>\d+)(?:\.(?P<lock_time_frac>\d+))?\s+Rows_sent: (?P<rows_sent>\d+)\s+Rows_examined: (?P<rows_examined>\d+)"""
    )
    patterns.foreach { re2 =>
      val parsed = parse(re2)
      java.util.regex.Pattern.compile(parsed.java)
    }
    info(s"translated ${patterns.size} representative patterns")
  }
}
