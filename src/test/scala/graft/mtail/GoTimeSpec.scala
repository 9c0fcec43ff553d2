package graft.mtail

import org.scalatest.funsuite.AnyFunSuite

class GoTimeSpec extends AnyFunSuite {

  private def utc(s: String): Long =
    java.time.Instant.parse(s).toEpochMilli * 1000L

  test("rsyncd layout 2006/01/02 15:04:05") {
    assert(GoTime.parse("2006/01/02 15:04:05", "2011/02/22 21:50:30", 0)
      .contains(utc("2011-02-22T21:50:30Z")))
  }

  test("syslog layout Jan _2 15:04:05 — space-padded day, yearless") {
    assert(GoTime.parse("Jan _2 15:04:05", "Aug 19 02:14:38", 2019)
      .contains(utc("2019-08-19T02:14:38Z")))
    assert(GoTime.parse("Jan _2 15:04:05", "Aug  9 02:14:38", 2019)
      .contains(utc("2019-08-09T02:14:38Z")))
  }

  test("apache layout 02/Jan/2006:15:04:05 -0700") {
    assert(GoTime.parse("02/Jan/2006:15:04:05 -0700",
      "23/Mar/2018:12:31:01 +0000", 0)
      .contains(utc("2018-03-23T12:31:01Z")))
    assert(GoTime.parse("02/Jan/2006:15:04:05 -0700",
      "21/Feb/2011:05:42:23 -0800", 0)
      .contains(utc("2011-02-21T13:42:23Z")))
  }

  test("rfc3339-ish layout with 12-hour field quirk") {
    // Go keeps a bare 12-hour value as-is when no AM/PM in layout
    assert(GoTime.parse("2006-01-02T03:04:05-0700",
      "2018-03-23T10:31:01+0000", 0)
      .contains(utc("2018-03-23T10:31:01Z")))
    // hour 13 overflows the 12-hour field → parse failure, like Go
    assert(GoTime.parse("2006-01-02T03:04:05-0700",
      "2018-03-23T13:31:01+0000", 0).isEmpty)
  }

  test("mysql layout 060102 with 2-digit year and space-run matching") {
    // the real mysql_slowqueries layout: two spaces + 12-hour '3'
    assert(GoTime.parse("060102  3:04:05", "070228 12:01:02", 0)
      .contains(utc("2007-02-28T12:01:02Z")))
    assert(GoTime.parse("060102  3:04:05", "070228  2:01:02", 0)
      .contains(utc("2007-02-28T02:01:02Z")))
  }

  test("year-with-layout Jan _2 15:04:05 2006") {
    assert(GoTime.parse("Jan _2 15:04:05 2006", "Feb 13 23:31:30 2009", 0)
      .contains(utc("2009-02-13T23:31:30Z")))
  }

  test("seconds >= 60 are rejected like Go's range check") {
    // Go time.Parse: "second out of range" — leap-second :60 included
    assert(GoTime.parse("2006/01/02 15:04:05", "2011/02/22 21:50:60", 0)
      .isEmpty)
    assert(GoTime.parse("2006/01/02 15:04:05", "2011/02/22 21:50:61", 0)
      .isEmpty)
    assert(GoTime.parse("060102  3:04:05", "070228 12:01:60", 0).isEmpty)
  }

  test("mismatch returns None") {
    assert(GoTime.parse("2006/01/02", "not-a-date", 0).isEmpty)
    assert(GoTime.parse("2006/01/02 15:04:05", "2011/02/22", 0).isEmpty)
    assert(GoTime.parse("01/02", "13/22", 0).isEmpty) // month 13
  }

  test("override zone: naive timestamps use ParseInLocation semantics") {
    val ny = java.time.ZoneId.of("America/New_York")
    // winter (EST, -05:00) and summer (EDT, -04:00) — DST-aware
    assert(GoTime.parse("2006/01/02 15:04:05", "2021/01/15 12:00:00", 0,
      ny).contains(utc("2021-01-15T17:00:00Z")))
    assert(GoTime.parse("2006/01/02 15:04:05", "2021/07/15 12:00:00", 0,
      ny).contains(utc("2021-07-15T16:00:00Z")))
    // a layout WITH a zone directive keeps its parsed offset — the
    // override only applies to naive timestamps (vm.go:312-313)
    assert(GoTime.parse("2006-01-02T15:04:05-07:00",
      "2021-01-15T12:00:00+02:00", 0, ny)
      .contains(utc("2021-01-15T10:00:00Z")))
    // named-zone layout (MST) consumes a name: still counts as a zone
    // indicator, offset 0 like Go when the name is unknown…
    assert(GoTime.parse("Jan _2 15:04:05 MST", "Jul 15 12:00:00 XYZ",
      2021, ny).contains(utc("2021-07-15T12:00:00Z")))
    // …but an abbreviation the override location USES resolves to its
    // offset, like Go's lookupName inside ParseInLocation
    assert(GoTime.parse("Jan _2 15:04:05 MST", "Jan 15 12:00:00 EST",
      2021, ny).contains(utc("2021-01-15T17:00:00Z")))
    assert(GoTime.parse("Jan _2 15:04:05 MST", "Jul 15 12:00:00 EDT",
      2021, ny).contains(utc("2021-07-15T16:00:00Z")))
    // without an override, abbreviations parse as offset 0 (plain
    // time.Parse with a non-local name)
    assert(GoTime.parse("Jan _2 15:04:05 MST", "Jan 15 12:00:00 EST",
      2021).contains(utc("2021-01-15T12:00:00Z")))
  }

  test("abbreviation offsets use the zone rules of the PARSED era") {
    // Europe/Moscow was UTC+4 from 2011-03-27 to 2014-10-26 and UTC+3
    // since; resolving via present-day rawOffset would be an hour off
    // for 2013 logs
    val msk = java.time.ZoneId.of("Europe/Moscow")
    assert(GoTime.parse("Jan _2 15:04:05 MST", "Jul 15 12:00:00 MSK",
      2013, msk).contains(utc("2013-07-15T08:00:00Z")))
    assert(GoTime.parse("Jan _2 15:04:05 MST", "Jul 15 12:00:00 MSK",
      2021, msk).contains(utc("2021-07-15T09:00:00Z")))
  }
}
