package graft.mtail

import java.time.{LocalDateTime, ZoneOffset}

/** Go `time.Parse` layout engine (the subset mtail programs use).
  *
  * Java's DateTimeFormatter cannot reproduce several Go behaviours mtail
  * depends on — `_2` space-padded days, a bare 12-hour `3` kept as-is when
  * the layout has no AM/PM, yearless layouts parsing to year 0 with the
  * "syslog current year" patch applied afterwards
  * (`internal/runtime/vm/vm.go:308-330`) — so this is a direct
  * implementation of the layout→fields scan, mirroring Go's
  * `nextStdChunk`/`Parse` pair for the std elements:
  * 2006 06 January Jan 01 1 Monday Mon 02 2 _2 15 03 3 04 4 05 5
  * PM pm MST -0700 -07:00 -07 Z0700 Z07:00 .000… .999…
  *
  * Named zones other than UTC/GMT parse as offset 0, matching Go's
  * behaviour when the name is not the local zone's.
  */
object GoTime {

  /** Parse `value` with Go layout `layout`.
    * @param defaultYear year substituted when the layout has no year
    *        (mtail's yearless-syslog patch adds the current year).
    * @param zone the reference's -override_timezone
    *        (`internal/mtail/options.go:98-109` → ParseInLocation,
    *        vm.go:312-313): a timestamp WITHOUT any zone indicator in
    *        its layout is interpreted in this zone (DST-aware); UTC by
    *        default like Go's plain time.Parse. Layouts that carry a
    *        zone directive keep their parsed offset.
    * @return epoch MICROSECONDS (UTC) or None on mismatch.
    */
  def parse(layout: String, value: String, defaultYear: Int,
      zone: java.time.ZoneId = ZoneOffset.UTC): Option[Long] = {
    var li = 0
    var vi = 0
    var year = 0; var hasYear = false
    var month = 1; var day = 1
    var hour = 0; var min = 0; var sec = 0; var nanos = 0
    var hour12 = -1
    var pm = -1 // 0=AM 1=PM
    var offsetSec = 0
    var hasZone = false
    var zoneName: String = null // abbreviation consumed by an MST layout

    def num(maxDigits: Int, fixed: Boolean, spacePad: Boolean): Option[Int] = {
      var s = 0
      var n = 0
      if (spacePad && vi < value.length && value(vi) == ' ') vi += 1
      val start = vi
      while (vi < value.length && n < maxDigits &&
        value(vi) >= '0' && value(vi) <= '9') {
        s = s * 10 + (value(vi) - '0'); vi += 1; n += 1
      }
      if (n == 0 || (fixed && n != maxDigits && !spacePad)) None else Some(s)
    }

    def lit(text: String): Boolean = {
      if (value.startsWith(text, vi)) { vi += text.length; true } else false
    }

    val monthsAbbr = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
      "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
    val monthsLong = Seq("January", "February", "March", "April", "May",
      "June", "July", "August", "September", "October", "November",
      "December")
    val daysAbbr = Seq("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
    val daysLong = Seq("Monday", "Tuesday", "Wednesday", "Thursday",
      "Friday", "Saturday", "Sunday")

    def matchName(names: Seq[String]): Option[Int] = {
      val i = names.indexWhere(n => value.startsWith(n, vi))
      if (i >= 0) { vi += names(i).length; Some(i) } else None
    }

    def fraction(digits: Int, optional: Boolean): Boolean = {
      // layout ".000" requires the fraction; ".999" takes it if present
      if (vi < value.length && value(vi) == '.') {
        val start = vi + 1
        var e = start
        while (e < value.length && value(e) >= '0' && value(e) <= '9') e += 1
        if (e == start) return optional
        val frac = value.substring(start, math.min(e, start + 9))
        nanos = (frac + "0" * (9 - frac.length)).toInt
        vi = e
        true
      } else optional
    }

    while (li < layout.length) {
      val rest = layout.substring(li)
      def adv(n: Int): Unit = li += n
      var ok = true
      if (rest.startsWith("2006")) {
        adv(4); hasYear = true
        ok = num(4, fixed = true, spacePad = false) match {
          case Some(y) => year = y; true; case None => false
        }
      } else if (rest.startsWith("06")) {
        adv(2); hasYear = true
        ok = num(2, fixed = true, spacePad = false) match {
          case Some(y) =>
            year = if (y >= 69) 1900 + y else 2000 + y; true
          case None => false
        }
      } else if (rest.startsWith("January")) {
        adv(7)
        ok = matchName(monthsLong) match {
          case Some(m) => month = m + 1; true; case None => false
        }
      } else if (rest.startsWith("Jan")) {
        adv(3)
        ok = matchName(monthsAbbr) match {
          case Some(m) => month = m + 1; true; case None => false
        }
      } else if (rest.startsWith("Monday")) {
        adv(6); ok = matchName(daysLong).isDefined
      } else if (rest.startsWith("Mon")) {
        adv(3); ok = matchName(daysAbbr).isDefined
      } else if (rest.startsWith("15")) {
        adv(2)
        ok = num(2, fixed = false, spacePad = false) match {
          case Some(h) if h <= 23 => hour = h; true; case _ => false
        }
      } else if (rest.startsWith("01")) {
        adv(2)
        ok = num(2, fixed = true, spacePad = false) match {
          case Some(m) if m >= 1 && m <= 12 => month = m; true
          case _ => false
        }
      } else if (rest.startsWith("02")) {
        adv(2)
        ok = num(2, fixed = true, spacePad = false) match {
          case Some(d) if d >= 1 && d <= 31 => day = d; true; case _ => false
        }
      } else if (rest.startsWith("_2")) {
        adv(2)
        ok = num(2, fixed = false, spacePad = true) match {
          case Some(d) if d >= 1 && d <= 31 => day = d; true; case _ => false
        }
      } else if (rest.startsWith("03")) {
        adv(2)
        ok = num(2, fixed = true, spacePad = false) match {
          case Some(h) if h <= 12 => hour12 = h; true; case _ => false
        }
      } else if (rest.startsWith("04")) {
        adv(2)
        ok = num(2, fixed = true, spacePad = false) match {
          case Some(m) if m <= 59 => min = m; true; case _ => false
        }
      } else if (rest.startsWith("05")) {
        adv(2)
        // Go's time.Parse rejects seconds >= 60 ("second out of range")
        ok = num(2, fixed = true, spacePad = false) match {
          case Some(s) if s <= 59 => sec = s; true; case _ => false
        }
      } else if (rest.startsWith("PM")) {
        adv(2)
        ok = if (lit("PM")) { pm = 1; true }
        else if (lit("AM")) { pm = 0; true } else false
      } else if (rest.startsWith("pm")) {
        adv(2)
        ok = if (lit("pm")) { pm = 1; true }
        else if (lit("am")) { pm = 0; true } else false
      } else if (rest.startsWith("-07:00") || rest.startsWith("Z07:00")) {
        val zform = rest.take(6); adv(6)
        ok = parseOffset(value, vi, colon = true,
          zulu = zform.startsWith("Z")) match {
          case Some((off, nvi)) =>
            offsetSec = off; hasZone = true; vi = nvi; true
          case None => false
        }
      } else if (rest.startsWith("-0700") || rest.startsWith("Z0700")) {
        val zform = rest.take(5); adv(5)
        ok = parseOffset(value, vi, colon = false,
          zulu = zform.startsWith("Z")) match {
          case Some((off, nvi)) =>
            offsetSec = off; hasZone = true; vi = nvi; true
          case None => false
        }
      } else if (rest.startsWith("-07")) {
        adv(3)
        ok = parseOffset(value, vi, colon = false, zulu = false,
          hourOnly = true) match {
          case Some((off, nvi)) =>
            offsetSec = off; hasZone = true; vi = nvi; true
          case None => false
        }
      } else if (rest.startsWith("MST")) {
        adv(3)
        // consume a run of zone-name chars; UTC/GMT → 0, others → 0 too
        // (Go's behaviour when the abbreviation isn't the local zone)
        val start = vi
        while (vi < value.length &&
          (value(vi).isLetter || value(vi) == '+' || value(vi) == '-' ||
            (vi > start && value(vi).isDigit))) vi += 1
        ok = vi > start
        if (ok) { hasZone = true; zoneName = value.substring(start, vi) }
      } else if (rest.startsWith(".000") || rest.startsWith(".999")) {
        var e = li + 1
        val c = layout(li + 1)
        while (e < layout.length && layout(e) == c) e += 1
        val optional = c == '9'
        adv(e - li)
        ok = fraction(e - li - 1, optional)
      } else if (rest.startsWith("1")) {
        adv(1)
        ok = num(2, fixed = false, spacePad = false) match {
          case Some(m) if m >= 1 && m <= 12 => month = m; true
          case _ => false
        }
      } else if (rest.startsWith("2")) {
        adv(1)
        ok = num(2, fixed = false, spacePad = false) match {
          case Some(d) if d >= 1 && d <= 31 => day = d; true; case _ => false
        }
      } else if (rest.startsWith("3")) {
        adv(1)
        ok = num(2, fixed = false, spacePad = false) match {
          case Some(h) if h <= 12 => hour12 = h; true; case _ => false
        }
      } else if (rest.startsWith("4")) {
        adv(1)
        ok = num(2, fixed = false, spacePad = false) match {
          case Some(m) if m <= 59 => min = m; true; case _ => false
        }
      } else if (rest.startsWith("5")) {
        adv(1)
        // Go's time.Parse rejects seconds >= 60 ("second out of range")
        ok = num(2, fixed = false, spacePad = false) match {
          case Some(s) if s <= 59 => sec = s; true; case _ => false
        }
      } else if (layout(li) == ' ') {
        // Go's skip(): a run of spaces in the layout matches one-or-more
        // spaces in the value (mysql's "060102  3:04:05" layout vs a
        // single-space value)
        while (li < layout.length && layout(li) == ' ') li += 1
        ok = vi < value.length && value(vi) == ' '
        while (vi < value.length && value(vi) == ' ') vi += 1
      } else {
        val c = layout(li); adv(1)
        ok = vi < value.length && value(vi) == c
        if (ok) vi += 1
      }
      if (!ok) return None
    }
    if (vi != value.length) return None // trailing garbage, like Go

    if (hour12 >= 0) {
      hour = hour12
      if (pm == 1 && hour < 12) hour += 12
      else if (pm == 0 && hour == 12) hour = 0
    }
    val effYear = if (hasYear) year else defaultYear
    try {
      val ldt = LocalDateTime.of(effYear, month, day, hour, min, sec,
        nanos)
      // no zone indicator in the layout → ParseInLocation semantics:
      // interpret the wall-clock time in the override zone (DST-aware
      // via the zone rules); a parsed numeric offset always wins; a
      // zone ABBREVIATION known to the override location resolves to
      // that location's offset (Go's lookupName inside
      // ParseInLocation) and otherwise stays 0 like plain time.Parse
      val epochSec =
        if (hasZone) {
          val abbrevOffset = Option(zoneName)
            .filter(n => n != "UTC" && n != "GMT")
            .flatMap(abbrevOffsetIn(_, zone, ldt))
          abbrevOffset match {
            case Some(off) => ldt.toEpochSecond(
              ZoneOffset.ofTotalSeconds(off))
            case None =>
              ldt.toEpochSecond(ZoneOffset.ofTotalSeconds(offsetSec))
          }
        } else ldt.atZone(zone).toEpochSecond
      Some(epochSec * 1000000L + nanos / 1000L)
    } catch {
      case _: Exception => None
    }
  }

  /** offset seconds for a zone ABBREVIATION if the override location
    * uses it (its standard or daylight short name) — the Go
    * `Location.lookupName` step of ParseInLocation; None for names the
    * location doesn't use (Go then keeps offset 0 with the name).
    */
  private def abbrevOffsetIn(name: String, zone: java.time.ZoneId,
      ldt: java.time.LocalDateTime): Option[Int] = {
    if (zone == ZoneOffset.UTC) return None
    val tz = java.util.TimeZone.getTimeZone(zone)
    // short names pinned to Locale.US — the JVM default locale may
    // localize them ("GMT-08:00" instead of "PST"); the standard
    // offset comes from the zone RULES at the parsed wall-clock date,
    // not the present-day rawOffset, so historical offset changes
    // resolve like Go's transition-table lookupName. Two-step fixed
    // point: the wall clock read as UTC is up to ±14h off the true
    // instant, which can straddle an offset transition, so re-query at
    // the instant implied by the first guess. (DST savings still use
    // the zone's present-day value — eras with nonstandard savings,
    // e.g. double summer time, are out of scope like in the pre-rules
    // code.)
    val rules = zone.getRules
    val guess = rules.getStandardOffset(ldt.toInstant(ZoneOffset.UTC))
    val stdSec = rules
      .getStandardOffset(ldt.toInstant(guess)).getTotalSeconds
    if (name == tz.getDisplayName(false, java.util.TimeZone.SHORT,
      java.util.Locale.US))
      Some(stdSec)
    else if (tz.useDaylightTime &&
      name == tz.getDisplayName(true, java.util.TimeZone.SHORT,
        java.util.Locale.US))
      Some(stdSec + tz.getDSTSavings / 1000)
    else None
  }

  private def parseOffset(value: String, vi0: Int, colon: Boolean,
      zulu: Boolean, hourOnly: Boolean = false): Option[(Int, Int)] = {
    var vi = vi0
    if (vi >= value.length) return None
    if (zulu && value(vi) == 'Z') return Some((0, vi + 1))
    val sign = value(vi) match {
      case '+' => 1
      case '-' => -1
      case _ => return None
    }
    vi += 1
    def two(): Option[Int] = {
      if (vi + 1 < value.length && value(vi).isDigit &&
        value(vi + 1).isDigit) {
        val v = (value(vi) - '0') * 10 + (value(vi + 1) - '0')
        vi += 2
        Some(v)
      } else None
    }
    for {
      h <- two()
      m <- if (hourOnly) Some(0)
      else {
        if (colon) {
          if (vi < value.length && value(vi) == ':') { vi += 1; two() }
          else None
        } else two()
      }
    } yield (sign * (h * 3600 + m * 60), vi)
  }
}
