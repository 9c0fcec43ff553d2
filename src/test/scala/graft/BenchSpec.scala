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

  test("final headline fits the driver's tail capture with a " +
      "full-size query battery and every extra attached") {
    // a worst-case fixture: every SparkEntry query (52 as of round
    // 13) with the real (long) names plus
    // room for growth, every replay extra, SCALE.json attachment,
    // driver-clocked scale replay AND streaming kvs, and a non-empty
    // failed list. BENCH_r11/r12 both lost the leading
    // {"metric":"total",… because the previous 2 200-byte threshold
    // exceeded the ~2 000-byte capture window.
    val qNames = SparkEntry.queries.keys.toSeq.sorted :+
      "mtail_replay_1m_lines"
    val all = qNames.zipWithIndex.map { case (n, i) =>
      n -> (100.0 + i + 0.123)  // wide values: 3 int digits + frac
    }
    def extraKv(p: Double => String, lean: Int): Seq[String] =
      ((if (lean >= 3) Seq.empty else Seq(
        s""""replay_lines":1000000""")) ++
      Seq(
        s""""replay_klines_per_sec":${p(1277.456)}""",
        // survives every rung, mirroring Bench.main's replayKv
        s""""replay_warm_steal_cpu_secs_sum":${p(52.81)}""") ++
      (if (lean >= 2) Seq.empty else Seq(
        s""""replay_warm_secs_median":${p(3.849)}""")) ++
      (if (lean >= 1) Seq.empty else Seq(
        s""""battery_steal_cpu_secs_sum":${p(9.43)}""",
        s""""replay_warm_secs_min":${p(1.867)}""",
        s""""replay_warm_secs_max":${p(7.426)}""",
        s""""replay_warm_runs":5""",
        s""""replay_cold_secs":${p(5.729)}""",
        s""""replay_cold_klines_per_sec":${p(174.565)}"""))) ++
      {
        val kvs = Seq(
          """"scale_factor":10""",
          """"scale_battery_total_secs":48.227""",
          """"scale_replay_lines":10000000""",
          """"scale_replay_klines_per_sec":4797.68""",
          """"scale_replay_lines_driver":10000000""",
          """"scale_replay_secs_driver":8.123""",
          """"scale_replay_klines_per_sec_driver":1231.046""",
          """"streaming_klines_per_sec":412.345""",
          """"streaming_trigger_ms":250""")
        // the PRODUCTION lean filter — not a spec-side mirror that
        // could drift from what Bench.main actually emits
        Bench.evidenceLeanFilter(kvs, lean)
      }
    val line = Bench.renderHeadline(all, "/root/testdata/sf0.1",
      Seq("bench_wall_overrun"), 176.111, extraKv, None)
    val headline = line.linesIterator.toSeq.last
    assert(headline.startsWith("{\"metric\":\"total\",\"value\":"),
      "the LAST line must lead with the battery total")
    assert(line.length <= Bench.HeadlineMaxBytes,
      s"output is ${line.length} bytes > ${Bench.HeadlineMaxBytes}; " +
        "the driver's tail capture would cut its head")
    // per-query values keep one decimal — if the single-line rungs no
    // longer fit, the map moves to its own per_query line (slowest
    // first, explicit per_query_n count) rather than rounding to
    // whole seconds (the BENCH_r13 regression). The slowest query of
    // this fixture is 161.123 s → ":161.1" must appear somewhere
    assert(line.contains(":161.1"),
      "per-query one-decimal precision was shed")
    if (line.contains("\n")) {
      val pq = line.linesIterator.next()
      assert(pq.startsWith("{\"per_query"), pq)
      // most of the battery must make the line, not a token few
      assert("\"mt_|\"agg_|\"ann_|\"dedup_|\"pipeline_|\"text_|\"mtail_"
        .r.findAllIn(pq).length >= all.size / 2,
        s"too few per-query entries survived: $pq")
    }
    // the evidence kvs NO lean rung may drop (scale_* kvs are allowed
    // to fall off at the last rung: they are duplicated in the
    // committed SCALE.json and the run's scale_detail line)
    for (k <- Seq("replay_klines_per_sec",
        "streaming_klines_per_sec", "bench_wall_secs"))
      assert(headline.contains("\"" + k + "\""), s"missing $k")
    // the steal audit must survive at the rung this full-size fixture
    // lands on — if battery growth ever pushes it off the headline,
    // this tripwire forces a conscious re-budget, not a silent loss
    assert(headline.contains("\"replay_warm_steal_cpu_secs_sum\""),
      "steal audit fell off the headline")
    // a small battery stays on the full-precision full-extras rung
    val small = Bench.renderHeadline(all.take(3), "/x", Nil, 10.0,
      extraKv, Some("battery"))
    assert(small.contains("\"replay_cold_secs\":5.729"))
    assert(small.contains("\"bench_wall_limit_secs\":240"))
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
    // pretty-printed JSON (spaces after colons — an indenting
    // serializer rewrote SCALE.json mid-round-13 and the no-space
    // pattern silently dropped every scale kv from the headline)
    val g = java.nio.file.Files.createTempFile("scale2", ".json")
    java.nio.file.Files.write(g,
      """{
        | "factor": 10,
        | "battery_total_secs": 30.4,
        | "replay_klines_per_sec": 517.6
        |}""".stripMargin
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (kvs2, raw2) = Bench.scaleEvidence(Some(g.toString))
    assert(raw2.nonEmpty)
    assert(kvs2.exists(_.contains("\"scale_factor\":10")))
    assert(kvs2.exists(
      _.contains("\"scale_battery_total_secs\":30.4")))
    assert(kvs2.exists(
      _.contains("\"scale_replay_klines_per_sec\":517.6")))
    java.nio.file.Files.delete(g)
    // absent file → no kvs, no raw, no throw
    val (none, noRaw) =
      Bench.scaleEvidence(Some("/nonexistent/scale.json"))
    assert(none.isEmpty && noRaw.isEmpty)
  }
}
