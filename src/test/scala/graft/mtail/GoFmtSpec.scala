package graft.mtail

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[GoFmt]] to Go's published formatting behavior — the `%g`
  * vectors are from strconv's ftoa tests and the documented
  * shortest-`%g` rule (scientific iff decimal exponent < -4 or >= 6);
  * the json vectors follow encoding/json's float encoder (plain decimal
  * inside [1e-6, 1e21), trimmed two-digit negative exponents outside).
  */
class GoFmtSpec extends AnyFunSuite {

  test("%g integral-valued floats below 1e6 stay decimal") {
    assert(GoFmt.g(0.0) == "0")
    assert(GoFmt.g(-0.0) == "-0")
    assert(GoFmt.g(1.0) == "1")
    assert(GoFmt.g(42.0) == "42")
    assert(GoFmt.g(100000.0) == "100000")
    assert(GoFmt.g(200000.0) == "200000")
    assert(GoFmt.g(999999.0) == "999999")
  }

  test("%g switches to scientific at 1e6 (strconv's shortest-g rule)") {
    assert(GoFmt.g(1e6) == "1e+06")
    assert(GoFmt.g(2e6) == "2e+06")
    assert(GoFmt.g(1234567.0) == "1.234567e+06")
    assert(GoFmt.g(2500000.5) == "2.5000005e+06")
    assert(GoFmt.g(1e23) == "1e+23")
    assert(GoFmt.g(100000000000000016384.0) == "1.0000000000000002e+20")
  }

  test("%g small magnitudes: decimal down to 1e-4, then scientific") {
    assert(GoFmt.g(0.1) == "0.1")
    assert(GoFmt.g(0.0001) == "0.0001")
    assert(GoFmt.g(0.000125) == "0.000125")
    assert(GoFmt.g(0.00001) == "1e-05")
    assert(GoFmt.g(5e-8) == "5e-08")
  }

  test("%g fractional and full-precision values") {
    assert(GoFmt.g(1.5) == "1.5")
    assert(GoFmt.g(-2.5) == "-2.5")
    assert(GoFmt.g(123456.789) == "123456.789")
    assert(GoFmt.g(1.0 / 3.0) == "0.3333333333333333")
    assert(GoFmt.g(math.Pi) == "3.141592653589793")
  }

  test("%g extremes and specials") {
    assert(GoFmt.g(1.5e300) == "1.5e+300")
    assert(GoFmt.g(java.lang.Double.MIN_VALUE) == "5e-324")
    assert(GoFmt.g(java.lang.Double.MAX_VALUE) == "1.7976931348623157e+308")
    assert(GoFmt.g(Double.NaN) == "NaN")
    assert(GoFmt.g(Double.PositiveInfinity) == "+Inf")
    assert(GoFmt.g(Double.NegativeInfinity) == "-Inf")
  }

  test("every %g render round-trips to the same double") {
    val rnd = new scala.util.Random(13)
    (1 to 2000).foreach { _ =>
      val x = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!x.isNaN) {
        val s = GoFmt.g(x)
        val back = java.lang.Double.parseDouble(
          s.replace("+Inf", "Infinity").replace("-Inf", "-Infinity"))
        assert(back == x || (back == 0.0 && x == 0.0), s"$x -> $s")
      }
    }
  }

  test("'G' variant uppercases the exponent (PopString coercion, " +
      "vm.go:177)") {
    assert(GoFmt.g(2e9, upper = true) == "2E+09")
    assert(GoFmt.g(1e-5, upper = true) == "1E-05")
    assert(GoFmt.g(123456.789, upper = true) == "123456.789")
    assert(GoFmt.g(Double.NaN, upper = true) == "NaN")
  }

  test("json numbers stay decimal inside [1e-6, 1e21)") {
    assert(GoFmt.jsonNumber(1e6) == "1000000")
    assert(GoFmt.jsonNumber(2000000.5) == "2000000.5")
    assert(GoFmt.jsonNumber(1e20) == "100000000000000000000")
    assert(GoFmt.jsonNumber(0.000001) == "0.000001")
    assert(GoFmt.jsonNumber(123456789.123) == "123456789.123")
    assert(GoFmt.jsonNumber(0.0) == "0")
  }

  test("json numbers outside: scientific with trimmed 2-digit negative exponent") {
    assert(GoFmt.jsonNumber(1e21) == "1e+21")
    assert(GoFmt.jsonNumber(1e-7) == "1e-7")
    assert(GoFmt.jsonNumber(-1e-7) == "-1e-7")
    assert(GoFmt.jsonNumber(1.5e-9) == "1.5e-9")
    assert(GoFmt.jsonNumber(1e-10) == "1e-10")
    assert(GoFmt.jsonNumber(2.5e22) == "2.5e+22")
  }
}
