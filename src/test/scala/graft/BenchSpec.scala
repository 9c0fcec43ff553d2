package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the bench harness's self-checks (no Spark). */
class BenchSpec extends AnyFunSuite {

  test("wall self-check: a run past the driver's capture window is " +
      "flagged, a fast run is not") {
    // a forced-slow case: 241 s against the 240 s limit
    assert(Bench.wallOverrun(241.0))
    assert(Bench.wallOverrun(10.0, limit = 5.0))
    assert(!Bench.wallOverrun(101.2)) // round-10's wall: still inside
    assert(!Bench.wallOverrun(Bench.WallLimitSecs)) // boundary: not over
  }

  test("scale evidence: headline kvs extracted from SCALE.json when " +
      "present, silently absent when not") {
    val f = java.nio.file.Files.createTempFile("scale", ".json")
    java.nio.file.Files.write(f,
      """{"sf_dir":".scale/sf1","factor":10,
        |"battery_total_secs":123.456,"replay_lines":10000000,
        |"replay_klines_per_sec":987.6}""".stripMargin
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (kvs, raw) = Bench.scaleEvidence(Some(f.toString))
    assert(raw.nonEmpty)
    assert(kvs.exists(_.contains("\"scale_factor\":10")))
    assert(kvs.exists(
      _.contains("\"scale_battery_total_secs\":123.456")))
    assert(kvs.exists(_.contains("\"scale_replay_lines\":10000000")))
    assert(kvs.exists(
      _.contains("\"scale_replay_klines_per_sec\":987.6")))
    java.nio.file.Files.delete(f)
    // absent file → no kvs, no raw, no throw
    val (none, noRaw) =
      Bench.scaleEvidence(Some("/nonexistent/scale.json"))
    assert(none.isEmpty && noRaw.isEmpty)
  }
}
