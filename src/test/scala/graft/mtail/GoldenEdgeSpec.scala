package graft.mtail

import org.scalatest.funsuite.AnyFunSuite

/** Escape edge-cases of the golden-file label syntax
  * (`{k=v,k2=v2}`, golden/reader.go:20-47) — the round-17 verdict
  * asked for the diff between reader.go and [[Snapshot.readGolden]]
  * on label values containing `=`, `,`, or newline.
  *
  * The format itself cannot represent a `,` (the pair split eats it:
  * reader.go panics on the tail fragment's missing `=`, our reader
  * yields a phantom empty-valued key) or a newline (line-based
  * scanner). A value containing `=` IS representable and the two
  * readers genuinely differ: `strings.Split(pair, "=")[1]` TRUNCATES
  * `a=b=c` to `b` (reader.go:41-47) while our `split("=", 2)` keeps
  * `b=c` — the value any writer of such a file would have meant.
  *
  * The corpus guard below proves the divergent shapes are UNREACHABLE
  * in the reference's golden corpus (so golden parity cannot hinge on
  * them); the directed pins freeze our reader's deliberate behavior
  * on each shape so a future refactor can't drift silently. If the
  * guard ever fails (a new golden file with a `=`-carrying or
  * `""`-valued label), re-adjudicate against reader.go before
  * trusting that file's parity run.
  */
class GoldenEdgeSpec extends AnyFunSuite {

  private val testdata = new java.io.File(
    "/root/reference/internal/mtail/testdata")

  test("corpus guard: no golden label body contains the shapes the " +
      "two readers parse differently") {
    val goldens = Option(testdata.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".golden"))
    assert(goldens.nonEmpty, "golden corpus missing")
    val labelBody = """\{([^}]+)\}""".r
    goldens.foreach { f =>
      val src = scala.io.Source.fromFile(f)
      try src.getLines().foreach { line =>
        labelBody.findFirstMatchIn(line).foreach { m =>
          m.group(1).split(",", -1).foreach { pair =>
            assert(pair.count(_ == '=') == 1,
              s"${f.getName}: pair `$pair' has ${pair.count(_ == '=')} " +
                "'=' — reader.go and Snapshot.readGolden diverge here")
            assert(!pair.endsWith("=\"\"") || pair.count(_ == '"') == 2,
              s"${f.getName}: malformed quoted-empty `$pair'")
          }
        }
      } finally src.close()
    }
  }

  test("directed pins: our reader's behavior on each edge shape") {
    def cells(line: String) = Snapshot.readGolden(Iterator(line))
    // `=` in a value: we keep the full value (reader.go would
    // truncate `b=c` to `b`) — corpus-unreachable, see guard above
    assert(cells("gauge g {k=b=c} 1").head.labels == Map("k" -> "b=c"))
    // `""` means the empty string on both readers (reader.go:43-47)
    assert(cells("gauge g {k=\"\"} 1").head.labels == Map("k" -> ""))
    // a pair with no `=` at all: reader.go panics (never-written
    // shape); we read an empty value — lenient, not load-bearing
    assert(cells("gauge g {k} 1").head.labels == Map("k" -> ""))
    // a `,` inside a value is NOT representable: the pair split eats
    // it and the tail becomes a phantom key — pinned so nobody
    // "fixes" the reader into pretending the format can round-trip it
    assert(cells("gauge g {k=a,b} 1").head.labels ==
      Map("k" -> "a", "b" -> ""))
  }
}
