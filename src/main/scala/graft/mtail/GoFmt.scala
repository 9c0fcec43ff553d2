package graft.mtail

/** Go-exact float-to-string rendering.
  *
  * The reference formats float64 values as Go's shortest-round-trip
  * `%g` everywhere a float becomes a string:
  *   - the `F2s` conversion opcode (`internal/runtime/vm/vm.go:889-896`
  *     via `fmt.Sprintf("%g", f)`), emitted for explicit `string()`
  *     calls, implicit string unification in `+`, and metric label
  *     keys (`internal/runtime/compiler/codegen/codegen.go:273-280,602`);
  *   - exporter values (`internal/metrics/datum/float.go:21-23`
  *     `ValueString` = `%g`) used by the varz/graphite/statsd/collectd
  *     sinks under `internal/exporter/`;
  *   - histogram bucket bounds
  *     (`internal/metrics/datum/buckets.go:97` `FormatFloat('g',-1,64)`,
  *     `internal/exporter/graphite.go:66` `%v`).
  * The JSON store dump instead goes through `encoding/json`, whose
  * float encoder uses plain decimal unless |x| < 1e-6 or >= 1e21
  * (then scientific with the exponent's leading zero trimmed).
  *
  * Java's `Double.toString` ("1000000.0", "1.0E7") matches neither, so
  * both formats are reimplemented here from the published Go semantics:
  * shortest decimal digits that round-trip, scientific form iff the
  * decimal exponent is < -4 or >= 6 (strconv/ftoa.go's shortest-`%g`
  * rule — `200000` stays decimal, `2000000` becomes `2e+06`).
  */
object GoFmt {

  /** `fmt.Sprintf("%g", x)` / `strconv.FormatFloat(x, 'g', -1, 64)`. */
  def g(x: Double): String = g(x, upper = false)

  /** `upper = true` is `FormatFloat(x, 'G', -1, 64)` — the runtime
    * PopString coercion (vm.go:177) used when a raw float reaches a
    * string-popping opcode WITHOUT a checker-inserted conversion:
    * assignment to a text metric (Sset), whose rhs the checker never
    * wraps (checker.go:505-520 has no ConvExpr arm). "2E+06", not
    * "2e+06".
    */
  def g(x: Double, upper: Boolean): String = {
    if (java.lang.Double.isNaN(x)) return "NaN"
    if (x == Double.PositiveInfinity) return "+Inf"
    if (x == Double.NegativeInfinity) return "-Inf"
    val neg = x < 0.0 || (x == 0.0 && 1.0 / x < 0.0)
    val sign = if (neg) "-" else ""
    val ax = math.abs(x)
    if (ax == 0.0) return sign + "0"
    val (digits, exp) = shortest(ax)
    if (exp < -4 || exp >= 6) {
      val s = sci(digits, exp)
      sign + (if (upper) s.replace('e', 'E') else s)
    } else sign + dec(digits, exp)
  }

  /** `encoding/json`'s float64 encoding: decimal unless the magnitude
    * forces scientific (|x| < 1e-6 or >= 1e21), whose exponent then
    * drops a leading zero ("1e-07" → "1e-7"). NaN/Inf make
    * `json.Marshal` error in Go; render them Go-`%v`-style instead of
    * failing the whole dump.
    */
  def jsonNumber(x: Double): String = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      return g(x)
    val neg = x < 0.0 || (x == 0.0 && 1.0 / x < 0.0)
    val sign = if (neg) "-" else ""
    val ax = math.abs(x)
    if (ax == 0.0) return sign + "0"
    val (digits, exp) = shortest(ax)
    if (ax < 1e-6 || ax >= 1e21) {
      val s = sci(digits, exp)
      // strip the exponent's leading zero like jsonEncoder's fixup
      val i = s.indexOf('e')
      if (s.length - i == 4 && s.charAt(i + 2) == '0')
        sign + s.substring(0, i + 2) + s.charAt(i + 3)
      else sign + s
    } else sign + dec(digits, exp)
  }

  /** Shortest decimal digit string (no trailing zeros) and decimal
    * exponent of the FIRST digit, for a finite positive double: the
    * fewest significant digits whose correctly-rounded decimal reads
    * back as exactly `x`. Found by widening `%.pe` until the render
    * round-trips — correct by construction (each candidate is verified
    * by reparsing), independent of the formatter's rounding mode.
    */
  private def shortest(x: Double): (String, Int) = {
    var p = 0
    while (p < 17) {
      val s = String.format(java.util.Locale.ROOT, "%." + p + "e",
        java.lang.Double.valueOf(x))
      if (java.lang.Double.parseDouble(s) == x) return parseSci(s)
      p += 1
    }
    parseSci(String.format(java.util.Locale.ROOT, "%.16e",
      java.lang.Double.valueOf(x)))
  }

  private def parseSci(s: String): (String, Int) = {
    val e = s.indexOf('e')
    val exp = Integer.parseInt(s.substring(e + 1))
    var digits = s.substring(0, e).replace(".", "")
    // minimal-p candidates never need trailing zeros to round-trip,
    // but strip defensively so dec()/sci() can assume none
    while (digits.length > 1 && digits.endsWith("0"))
      digits = digits.substring(0, digits.length - 1)
    (digits, exp)
  }

  /** d.ddde±XX with a two-digit-minimum exponent, like Go's ftoa. */
  private def sci(digits: String, exp: Int): String = {
    val m =
      if (digits.length == 1) digits
      else digits.substring(0, 1) + "." + digits.substring(1)
    val ea = math.abs(exp).toString
    m + "e" + (if (exp < 0) "-" else "+") +
      (if (ea.length < 2) "0" + ea else ea)
  }

  /** Plain decimal: point inserted after `exp`+1 digits, zero-padded
    * on whichever side runs out.
    */
  private def dec(digits: String, exp: Int): String =
    if (exp >= 0) {
      if (digits.length <= exp + 1) digits + "0" * (exp + 1 - digits.length)
      else digits.substring(0, exp + 1) + "." + digits.substring(exp + 1)
    } else "0." + "0" * (-exp - 1) + digits
}
