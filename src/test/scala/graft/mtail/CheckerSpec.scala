package graft.mtail

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference checker's program corpus
  * (`internal/runtime/compiler/checker/checker_test.go`): every invalid
  * program there must be a compile error here (same failure class, not
  * a plan-time crash or a silent acceptance), and every valid program
  * must still parse.
  */
class CheckerSpec extends AnyFunSuite {

  private def reject(src: String, fragment: String): Unit = {
    val e = intercept[IllegalArgumentException] {
      Frontend.parse(src, "chk")
    }
    assert(e.getMessage.contains(fragment),
      s"expected '$fragment' in: ${e.getMessage}")
  }

  private def accept(src: String): Unit = {
    val _ = Frontend.parse(src, "chk")
  }

  // ---------- invalid programs (checker_test.go:26-366) ----------

  test("undefined named capture group") {
    reject("counter c\n/blurgh/ { c += $undef }\n",
      "Capture group `$undef' was not defined")
  }

  test("out of bounds capref") {
    reject("counter c\n/(blyurg)/ { c += $2 }\n",
      "Capture group `$2' was not defined")
  }

  test("undefined identifier") {
    reject("/x/ { x++ }\n", "Identifier `x' not declared.")
  }

  test("duplicate declaration") {
    reject("counter foo\ncounter foo\n/a/ { foo++ }\n",
      "Redeclaration of metric `foo'")
  }

  test("index taken on unindexable expression") {
    reject("counter n\n/(\\d+)/ { n[$1]++ }\n",
      "Index taken on unindexable expression")
  }

  test("not enough keys") {
    reject("counter foo by a, b\n/(\\d+)/ { foo[$1]++ }\n",
      "Not enough keys for indexed expression: expecting 2, received 1")
  }

  test("too many keys") {
    reject("counter quux by a\n/(\\d+)/ { quux[$1][0]++ }\n",
      "Too many keys for indexed expression: expecting 1, received 2.")
  }

  test("not enough keys in del") {
    reject("gauge t by x, y\n/.*/ {\n  del t[\"x\"]\n  " +
      "t[\"x\"][\"y\"]++\n}\n",
      "Not enough keys for indexed expression: expecting 2, received 1")
  }

  test("builtin arity mismatch") {
    reject("/\\d+/ { strptime() }\n", "call to `strptime'")
    reject("counter c\n/a/ { c += len() }\n", "call to `len'")
    reject("counter c\n/a/ { c = timestamp(1) }\n",
      "call to `timestamp'")
  }

  test("bad strptime format string is a compile error") {
    reject("counter c\n/a/ { strptime(\"x\", " +
      "\"2017-10-16 06:50:25\")\nc++ }\n",
      "invalid time format string")
  }

  test("unused metric declaration") {
    reject("counter foo\ncounter bar\n/a/ { foo++ }\n",
      "Declaration of variable `bar' here is never used.")
  }

  test("unused decorator and pattern constant") {
    reject("def x{next}\n", "Declaration of decorator `x' here is " +
      "never used.")
    reject("const ID /[0-9]+/\ncounter c\n/a/ { c++ }\n",
      "Declaration of named pattern constant `ID' here is never used.")
  }

  test("def without next") {
    reject("def x{}\n@x {\n}\n", "No symbols found in decorator `@x'")
  }

  test("def with two nexts") {
    reject("def x{\n /a/ { next }\n /b/ { next }\n}\n@x {\n}\n",
      "Can't use `next' statement twice in a decorator.")
  }

  test("next outside of a decorator") {
    reject("def x{\nnext\n}\n@x {\nnext\n}\n",
      "Can't use `next' outside of a decorator.")
  }

  test("counter with buckets") {
    reject("counter foo buckets 1, 2, 3\n/(\\d)/ {\nfoo = $1\n}\n",
      "Can't specify buckets for non-histogram metric `foo'.")
  }

  test("keyless delete") {
    reject("histogram m buckets 1, 2\n/a/ {\ndel m\nm = 1\n}\n",
      "Cannot delete this.")
    reject("counter m\n/a/ {\ndel m\nm++\n}\n", "Cannot delete this.")
  }

  test("int as bool condition") {
    reject("counter c\n1 {c++}\n",
      "Can't interpret Int as a boolean expression here.")
  }

  test("strptime with non-string format argument") {
    reject("strptime(\"\",8)\n",
      "Expecting a format string for argument 2 of strptime(), not Int.")
  }

  test("increment of a text metric") {
    reject("text l\n/a/ { l++ }\n",
      "type mismatch: expecting an Int for INC, not String.")
  }

  test("increment of a histogram") {
    reject("histogram h buckets 1\n/a/ { h++ }\n",
      "type mismatch: expecting an Int for INC, not Buckets.")
  }

  test("tolower of an Int") {
    reject("text t\n/a/ { t = tolower(2) }\n",
      "Expecting a String for argument 1 of tolower(), not Int.")
  }

  test("comparison against None") {
    reject("counter c\n/a/ { strptime(\"2006\",\"2006\")<5 {c++} }\n",
      "None")
  }

  test("bitwise-not of None") {
    reject("counter c\n~strptime(\"2006\", \"2006\") {c++}\n",
      "type mismatch; expected Int received None for `~' operator.")
  }

  test("int() of a float is a missing conversion (codegen.go:585-611)") {
    reject("gauge g\n/(?P<f>\\d+\\.\\d+)/ { g = int($f) }\n",
      "can't convert Float to Int")
  }

  test("pattern fragment plus a non-pattern") {
    reject("gauge e\ncounter c\n/x/ { c = e }\n// + e {\n}\n",
      "pattern")
  }

  test("string operands reject non-PLUS arithmetic (codegen.go:373-398" +
      " has no String arm outside Cat)") {
    reject("gauge g\n/(?P<s>[a-z]+)/ { g = $s - 1 }\n",
      "no opcode for type String in op `-'")
    reject("gauge g\n/(?P<s>[a-z]+)/ { g = $s * 2 }\n",
      "no opcode for type String in op `*'")
    // bitwise DOES accept strings — the VM's PopInt parses at runtime
    accept("gauge g\n/(?P<s>[a-z0-9]+)/ { g = $s & 7 }\n")
  }

  // ---------- valid programs (checker_test.go:390-520) ----------

  test("valid corpus still compiles") {
    // checker_test.go lists these two as CHECKER-valid, but the full
    // compile rejects them downstream: `(.*)`'s capref types String,
    // ADD_ASSIGN pins foo:=String (checker.go:505-532), and codegen's
    // scalar-counter zero-init has no String arm ("Can't initialize
    // to zero", codegen.go:109-126). Frontend.parse models the full
    // chain, so they reject here (round 18, order-sensitive typing).
    reject("counter foo\n/(.*)/ {\n  foo += $1\n}\n",
      "Can't initialize to zero")
    reject("counter foo\n/(.*)/ {\n  foo += $1\n  /bar(\\d+)/ {\n" +
      "   foo += $1\n  }\n}\n", "Can't initialize to zero")
    accept("counter foo by a, b\n/(\\d)/ {\n  foo[1,$1] = 3\n}")
    accept("counter foo by a,b,c\n/(\\d) (\\d)/ {\n" +
      "  foo[$1,$2][0]++\n}\n")
    accept("counter foo\n/$/ {\n  foo++\n}")
    accept("len(\"foo\") > 0 {}")
    accept("counter i\ncounter f\n/(.*)/ {\n  i = int($1)\n" +
      "  f = float($1)\n}\n")
    accept("0 || 1 {\n}\n1 && 0 {\n}\n")
    accept("1 != 0 && 0 == 1 {\n}\n")
    accept("(0) || (1 && 3) {\n}")
    accept("strptime(\"2006-01-02 15:04:05\", " +
      "\"2006-01-02 15:04:05\")\n")
    accept("counter f by s\n/(.*), (.*)/ {\n  f[$1 + $2]++\n}\n")
    accept("counter test\n/(?P<test>.*)/ {\n    test++\n}\n")
    accept("/(?P<foo>.*)/ {\n  $foo =~ /bar/ {\n  }\n}")
    accept("/(?P<x>\\d+)/ && $x > 0 {\n}")
    accept("gauge var\n/(?P<x>\\d+) (\\d+\\.\\d+)/ {\n" +
      "  var = $x + $2\n}")
    accept("const X /foo/\n/bar/ + X {\n}")
  }

  test("parser-level invalid corpus rejects (parser_test.go:495-585)") {
    // exact messages differ (graft's parser reports its own shapes);
    // the contract is REJECTION with a typed error, not acceptance
    Seq(
      "?\n", "/foo\n", " \"foo }\n", "const X /(?P<foo>",
      "/foo/ {\n", "/foo/ { } else {\n", "otherwise {\n",
      "counter foo\n/x/ {\nfoo++[$1]++\n}", "/x/ {\n0[$1]++\n}",
      "/foo/[0]\n", "/(\\d)foo/ {\n timestamp() - $1\n}",
      "/(?P<a>.)/\n", "counter foo by a limit 10, b\n"
    ).foreach { src =>
      intercept[IllegalArgumentException](Frontend.parse(src, "chk"))
    }
  }

  test("decorator machinery still works end to end") {
    accept("def d {\n/(?P<x>\\d+)/ {\nnext\n}\n}\ncounter c\n" +
      "@d {\nc += $x\n}\n")
  }
}
