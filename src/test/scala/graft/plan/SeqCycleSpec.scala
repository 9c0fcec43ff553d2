package graft.plan

import graft.SparkSpec
import graft.mtail.{Frontend, LogLines, Snapshot}
import graft.mtail.Snapshot.{VInt, VStr}
import graft.streaming.StreamRunner

/** Directed pins for the EXACT sequential bottom of genuinely cyclic
  * keyless reads ([[SeqCycleEval]]): NON-absorbing self-reference —
  * where the one-level-unroll provisional deviated from the VM —
  * must now produce the strictly sequential VM value, across bucket
  * boundaries and across batch splits (seeded automaton). Expected
  * values are hand-simulated against the reference VM semantics
  * (vm.go:962-989 per-line fetch-execute, same-line statement order).
  */
class SeqCycleSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def run(src: String, lines: Seq[String], ordStep: Long)
      : Map[(String, Map[String, String]), Snapshot.Value] = {
    val prog = Frontend.parse(src, "seqcyc")
    val df = LogLines.fromLines(
      lines.zipWithIndex.toDF("line", "i")
        .withColumn("__ord", col("i").cast("long") * ordStep)
        .select("line", "__ord"),
      "line", ordCol = Some(col("__ord")))
    Snapshot.collect(new PlanBuilder(prog, df, 0).snapshot())
      .map(c => (c.name, c.labels) -> c.value).toMap
  }

  private val bucket = 1L << 18

  test("non-absorbing inc guard `n < 3 { n++ }` saturates exactly " +
      "like the VM, across bucket boundaries") {
    // whether n++ fires depends on n's own full firing history — a
    // sequential automaton. VM: n = min(3, #lines) = 3.
    val src =
      """counter n
        |counter seen
        |/^t$/ {
        |  seen++
        |  n < 3 { n++ }
        |}
        |""".stripMargin
    val data = Seq.fill(5)("t")
    val spread = run(src, data, bucket)
    assert(spread(("n", Map.empty)) == VInt(3), spread)
    assert(spread(("seen", Map.empty)) == VInt(5), spread)
    assert(run(src, data, 1L) == spread)
  }

  test("self-conditioned reset through a later ++ site counts every " +
      "armed cycle (the VmSemanticsSpec shape, bucket-spread)") {
    val src =
      """hidden gauge h
        |counter c
        |/^a$/ {
        |  h == 1 {
        |    h = 0
        |    c++
        |  }
        |}
        |/^b$/ { h++ }
        |""".stripMargin
    // a(h=0: no) b(h=1) a(reset, c=1) b(h=1) a(reset, c=2)
    val data = Seq("a", "b", "a", "b", "a")
    val spread = run(src, data, bucket)
    assert(spread(("c", Map.empty)) == VInt(2), spread)
    assert(run(src, data, 1L) == spread)
  }

  test("mutual ping-pong automaton: otherwise-paired conds flip a " +
      "shared turn metric with VM statement-order semantics") {
    // the otherwise rewrite references the SIBLING cond's read at the
    // sibling's site index — the VM's matched-flag: once the first
    // block fires and sets turn=1, the otherwise must NOT re-evaluate
    // against the updated value on the same line
    val src =
      """hidden gauge turn
        |counter pings
        |counter pongs
        |/^t$/ {
        |  turn == 0 {
        |    pings++
        |    turn = 1
        |  }
        |  otherwise {
        |    pongs++
        |    turn = 0
        |  }
        |}
        |""".stripMargin
    // t: ping(turn=1) t: pong(turn=0) t: ping t: pong t: ping
    val data = Seq.fill(5)("t")
    val spread = run(src, data, bucket)
    assert(spread(("pings", Map.empty)) == VInt(3), spread)
    assert(spread(("pongs", Map.empty)) == VInt(2), spread)
    assert(run(src, data, 1L) == spread)
  }

  test("length-bounded text accumulation: cond reads the concat " +
      "metric it gates") {
    val src =
      """hidden text acc
        |gauge l
        |/^(?P<s>[a-z]+)$/ {
        |  len(acc) < 4 { acc += $s }
        |  l = len(acc)
        |}
        |""".stripMargin
    // ab(acc=ab) cd(acc=abcd) ef(len 4, no append) → l = 4
    val data = Seq("ab", "cd", "ef")
    val spread = run(src, data, bucket)
    assert(spread(("l", Map.empty)) == VInt(4), spread)
    assert(run(src, data, 1L) == spread)
  }

  test("the automaton state seeds across batch splits: any cut of " +
      "the line stream equals the one-shot run") {
    val src =
      """counter n
        |hidden gauge h
        |/^a$/ {
        |  h == 1 {
        |    h = 0
        |    n++
        |  }
        |}
        |/^b$/ { h++ }
        |""".stripMargin
    val lines = Seq("b", "a", "a", "b", "b", "a", "b", "a", "a")
    // VM: b(h=1) a(n=1,h=0) a(no) b(h=1) b(h=2) a(h==1? no — h=2)
    //     b(h=3) a(no) a(no) → n = 1
    val prog = Frontend.parse(src, "seqcyc.split")
    val oneShot = Snapshot.collect(new PlanBuilder(prog,
      LogLines.fromLines(lines.toDF("line"), "line"), 0).snapshot())
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(oneShot(("n", Map.empty)) == VInt(1), oneShot)
    for (cut <- 1 until lines.length) {
      val runner = new StreamRunner(prog, spark, 0)
      runner.processBatch(lines.take(cut).toDF("line"), 0)
      runner.processBatch(lines.drop(cut).toDF("line"), 1)
      val split = runner.store.snapshot()
        .map(c => (c.name, c.labels) -> c.value).toMap
      assert(split(("n", Map.empty)) == VInt(1),
        s"cut=$cut: $split")
    }
  }

  test("non-absorbing seeded saturation across a split: the carried " +
      "count resumes exactly") {
    val src =
      """counter n
        |/^t$/ {
        |  n < 3 { n++ }
        |}
        |""".stripMargin
    val lines = Seq.fill(5)("t")
    val prog = Frontend.parse(src, "seqcyc.sat")
    for (cut <- 1 until lines.length) {
      val runner = new StreamRunner(prog, spark, 0)
      runner.processBatch(lines.take(cut).toDF("line"), 0)
      runner.processBatch(lines.drop(cut).toDF("line"), 1)
      val split = runner.store.snapshot()
        .map(c => (c.name, c.labels) -> c.value).toMap
      assert(split(("n", Map.empty)) == VInt(3), s"cut=$cut: $split")
    }
  }

  test("KEYED self-conditioned reset (the per-session partial idiom) " +
      "is exact — r15 crashed at plan build on this shape") {
    // the keyed reset's cond reads the metric through a DIFFERENT
    // regex frame than the write, so the read lowers to an as-of
    // whose write leg references the read itself. Pre-r16 the
    // provisional substitution spliced the pass-1 impl — itself the
    // same as-of name — into the spec, and the flush threw "circular
    // materialization". The sequential state machine resolves it
    // per key tuple, VM-exact.
    val src =
      """counter resets by u
        |hidden gauge p by u
        |/^p (?P<s>\w+)$/ { p[$s] = 1 }
        |/^c (?P<s>\w+)$/ {
        |  p[$s] == 1 {
        |    p[$s] = 0
        |    resets[$s]++
        |  }
        |}
        |""".stripMargin
    val data = Seq("p a", "c a", "c a", "p b", "c b", "p a", "c a")
    val spread = run(src, data, bucket)
    assert(spread(("resets", Map("u" -> "a"))) == VInt(2), spread)
    assert(spread(("resets", Map("u" -> "b"))) == VInt(1), spread)
    assert(run(src, data, 1L) == spread)
  }

  test("KEYED non-absorbing saturation per key, seeded across any " +
      "batch split") {
    // n[$s] < 2 { n[$s]++ }: a per-key automaton; the carried state
    // must seed each key's count through the broadcast keyed-seed
    // join so every cut equals the one-shot run
    val src =
      """counter n by u
        |/^t (?P<s>\w+)$/ {
        |  n[$s] < 2 { n[$s]++ }
        |}
        |""".stripMargin
    val lines = Seq("t a", "t b", "t a", "t a", "t b", "t b", "t a")
    val prog = Frontend.parse(src, "seqcyc.keyed")
    val oneShot = Snapshot.collect(new PlanBuilder(prog,
      LogLines.fromLines(lines.toDF("line"), "line"), 0).snapshot())
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(oneShot(("n", Map("u" -> "a"))) == VInt(2), oneShot)
    assert(oneShot(("n", Map("u" -> "b"))) == VInt(2), oneShot)
    for (cut <- 1 until lines.length) {
      val runner = new StreamRunner(prog, spark, 0)
      runner.processBatch(lines.take(cut).toDF("line"), 0)
      runner.processBatch(lines.drop(cut).toDF("line"), 1)
      val split = runner.store.snapshot()
        .map(c => (c.name, c.labels) -> c.value).toMap
      assert(split == oneShot, s"cut=$cut: $split")
    }
  }

  test("STATE-DEPENDENT key expression: a cyclic metric keyed by " +
      "another cycle read is exact, seeded across any batch split") {
    // slots[k] where k itself is a cyclic read: the per-key seed-join
    // form could not pre-join this shape (the key is only known
    // mid-walk); the collected-map seeding makes it exact. turn
    // alternates 0/1 via self-reference; slots counts per turn value
    // with a saturation guard that makes slots itself cyclic.
    val src =
      """hidden gauge turn
        |counter slots by t
        |/^t$/ {
        |  slots[string(turn)] < 2 { slots[string(turn)]++ }
        |  turn == 0 {
        |    turn = 1
        |  }
        |  otherwise {
        |    turn = 0
        |  }
        |}
        |""".stripMargin
    // t1: slots[0]=1 turn=1; t2: slots[1]=1 turn=0; t3: slots[0]=2
    // turn=1; t4: slots[1]=2 turn=0; t5: slots[0] at cap (2), no inc,
    // turn=1; t6: slots[1] at cap — slots = {0: 2, 1: 2}
    val lines = Seq.fill(6)("t")
    val spread = run(src, lines, bucket)
    assert(spread(("slots", Map("t" -> "0"))) == VInt(2), spread)
    assert(spread(("slots", Map("t" -> "1"))) == VInt(2), spread)
    assert(run(src, lines, 1L) == spread)
    val prog = Frontend.parse(src, "seqcyc.dynkey")
    for (cut <- 1 until lines.length) {
      val runner = new StreamRunner(prog, spark, 0)
      runner.processBatch(lines.take(cut).toDF("line"), 0)
      runner.processBatch(lines.drop(cut).toDF("line"), 1)
      val split = runner.store.snapshot()
        .map(c => (c.name, c.labels) -> c.value).toMap
      assert(split(("slots", Map("t" -> "0"))) == VInt(2),
        s"cut=$cut: $split")
      assert(split(("slots", Map("t" -> "1"))) == VInt(2),
        s"cut=$cut: $split")
    }
  }

  test("downstream reads of the cyclic metric flow through the " +
      "normal as-of machinery and see the exact values") {
    val src =
      """hidden counter n
        |gauge out
        |text trail
        |/^t$/ {
        |  n < 2 { n++ }
        |  out = n
        |  trail += string(n)
        |}
        |""".stripMargin
    // t: n=1 out=1 trail=1; t: n=2 out=2 trail=12; t: no inc,
    // out=2 trail=122
    val data = Seq("t", "t", "t")
    val spread = run(src, data, bucket)
    assert(spread(("out", Map.empty)) == VInt(2), spread)
    assert(spread(("trail", Map.empty)) == VStr("122"), spread)
    assert(run(src, data, 1L) == spread)
  }

  test("machinery-level deadlock (fuzz seed 5816): as-of relations " +
      "mutually tangled through abort-guard terms resolve via the " +
      "last-resort exact replay instead of crashing") {
    // The conservative line-abort guard conjoined into compiled site
    // conds makes sites READ metrics their IR never mentions; with
    // enough interleaved blocks the spliced pass-1 provisionals leave
    // two keyed as-of relations referencing each other AND themselves
    // — no provisional can bottom a machinery name, so pre-fix the
    // flush loop threw "circular materialization" on this legal
    // program. The pin: it plans, runs, and any batch split equals
    // the one-shot store (the exact-replay path is batch-seeded).
    val src =
      """counter c0
        |counter c1 by a
        |gauge g0
        |gauge g1 by a, b
        |text t0
        |histogram h0 buckets 1, 4, 16
        |hidden gauge hid1 by p, q
        |hidden counter hidc
        |hidden counter hidc1 by a
        |text t1 by a
        |/(?P<s>[a-z]+): (?P<x>\d+)/ {
        |/(?P<x>\d+) (?P<s>\w+)/ {
        |$x % 2 == 0 {
        |hidc1[$s]++
        |t0 += $s
        |hidc1[string(hidc % 2)] < 2 { hidc1[string(hidc % 2)]++ }
        |}
        |}
        |/val=(?P<x>\d+) tag=(?P<s>\w+).*/ {
        |t0 = tolower($s)
        |} else {
        |c0++
        |}
        |/val=(?P<x>\d+) tag=(?P<s>\w+).*/ {
        |hidc++
        |t1[$s] += $s
        |}
        |} else {
        |c0++
        |}
        |/(?P<x>\d+) (?P<s>\w+)/ {
        |/val=(?P<x>\d+) tag=(?P<s>\w+).*/ {
        |hidc1[$s] < 2 { hidc1[$s]++ }
        |g1[$s][$x] = hidc1[$s] + 1
        |}
        |/val=(?P<x>\d+) tag=(?P<s>\w+).*/ {
        |$x % 2 == 0 {
        |c1[$s]++
        |c1[$s] = $x
        |}
        |otherwise {
        |c0++
        |}
        |}
        |/(?P<x>\d+) (?P<s>\w+)/ {
        |hidc1[$s] = $x
        |hidc1[$s] = $x
        |} else {
        |c0++
        |}
        |}
        |/(?P<x>\d+) (?P<s>\w+)/ {
        |/(?P<s>[a-z]+): (?P<x>\d+)/ {
        |$x > 3 {
        |h0 = $x
        |t0 = "v=" + $x / 2.0
        |g0 = len(t1[$s])
        |}
        |otherwise {
        |c0++
        |}
        |}
        |/(?P<s>[a-z]+): (?P<x>\d+)/ {
        |g0 = float($x)
        |hidc > 2 { c0++ }
        |}
        |} else {
        |c0++
        |}
        |/(?P<s>[a-z]+): (?P<x>\d+)/ {
        |$s =~ /a/ {
        |/^reset$/ {
        |del c1["alpha"]
        |del g1["beta"]["7"]
        |}
        |/val=(?P<x>\d+) tag=(?P<s>\w+).*/ {
        |stop
        |hid1[$s]["7"] = 1
        |}
        |}
        |}
        |""".stripMargin
    val lines = Seq("12 alpha", "val=14 tag=beta", "beta: 16",
      "18 gamma", "val=21 tag=alpha")
    val prog = Frontend.parse(src, "tangle.mtail")
    val oneShot = Snapshot.collect(new PlanBuilder(prog,
      LogLines.fromLines(lines.toDF("line"), "line"), 2020)
      .snapshot()).map(c => (c.name, c.labels) -> c.value).toMap
    assert(oneShot.nonEmpty)
    val runner = new StreamRunner(prog, spark, 2020)
    runner.processBatch(lines.take(2).toDF("line"), 0)
    runner.processBatch(lines.drop(2).toDF("line"), 1)
    val streamed = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(streamed == oneShot,
      s"one-shot only: ${oneShot.toSet -- streamed.toSet}\n" +
        s"streamed only: ${streamed.toSet -- oneShot.toSet}")
  }

  test("directly self-conditioned KEYED gauge whose other reads " +
      "already materialized (fuzz seed 6006): the lenient last " +
      "resort reclaims the premixed reads and replays the group " +
      "instead of crashing") {
    // hid1's write cond reads hid1 (`hid1[$s]["7"] == 1 { ... = 0 }`)
    // but hid1 is ALSO read at earlier value sites that resolve
    // through the distributed machinery before the cycle stalls — the
    // strict every-read-pending feasibility then refused the automaton
    // on BOTH paths and the self-referencing as-of threw `circular
    // materialization`. The lenient last resort replays the group;
    // premixed reads that nothing materialized consumed are RECLAIMED
    // into the automaton (r19 third pass) rather than keeping their
    // distributed columns. The pin: plans, runs, batch-split ≡
    // one-shot.
    val src =
      """        |counter c0
        |counter c1 by a
        |gauge g0
        |gauge g1 by a, b
        |histogram h0 buckets 1, 4, 16
        |hidden gauge hid0
        |hidden gauge hid1 by p, q
        |hidden counter hidc
        |hidden counter hidc1 by a
        |/(?P<x>\d+) (?P<s>\w+)/ {
        |/(?P<s>[a-z]+): (?P<x>\d+)/ {
        |hid1[$s][$x] = $x
        |settime($x)
        |c0++
        |h0 = $x
        |}
        |/^reset$/ {
        |del c1["alpha"]
        |del g1["beta"]["7"]
        |}
        |}
        |/(?P<s>[a-z]+): (?P<x>\d+)/ {
        |/(?P<s>[a-z]+): (?P<x>\d+)/ {
        |$x % 2 == 0 {
        |hidc1[string(hidc % 2)] < 2 { hidc1[string(hidc % 2)]++ }
        |g1[$s][$x] = hid1[$s][$x] + 1
        |}
        |}
        |/val=(?P<x>\d+) tag=(?P<s>\w+).*/ {
        |g1[$s][$x] = hid1[$s][$x] + 1
        |hidc++
        |}
        |/val=(?P<x>\d+) tag=(?P<s>\w+).*/ {
        |stop
        |g0++
        |stop
        |} else {
        |c0++
        |}
        |}
        |/(?P<s>[a-z]+): (?P<x>\d+)/ {
        |$x > 3 {
        |/(?P<x>\d+) (?P<s>\w+)/ {
        |hidc % 2 == 0 { g1[$s][$x] = hidc }
        |} else {
        |c0++
        |}
        |/(?P<x>\d+) (?P<s>\w+)/ {
        |$x % 2 == 0 {
        |hid0 = $x
        |del c1[$s]
        |}
        |otherwise {
        |c0++
        |}
        |}
        |}
        |otherwise {
        |c0++
        |}
        |}
        |/val=(?P<x>\d+) tag=(?P<s>\w+).*/ {
        |/val=(?P<x>\d+) tag=(?P<s>\w+).*/ {
        |hidc > 2 { c0++ }
        |h0 = $x
        |} else {
        |c0++
        |}
        |/(?P<s>[a-z]+): (?P<x>\d+)/ {
        |hid1[$s]["7"] == 1 {
        |hid1[$s]["7"] = 0
        |c0++
        |}
        |}
        |} else {
        |c0++
        |}
        |""".stripMargin
    val lines = Seq("12 alpha", "val=14 tag=beta", "beta: 16",
      "18 gamma", "val=21 tag=alpha")
    val prog = Frontend.parse(src, "selfcond.mtail")
    val oneShot = Snapshot.collect(new PlanBuilder(prog,
      LogLines.fromLines(lines.toDF("line"), "line"), 2020)
      .snapshot()).map(c => (c.name, c.labels) -> c.value).toMap
    assert(oneShot.nonEmpty)
    val runner = new StreamRunner(prog, spark, 2020)
    runner.processBatch(lines.take(3).toDF("line"), 0)
    runner.processBatch(lines.drop(3).toDF("line"), 1)
    val streamed = runner.store.snapshot()
      .map(c => (c.name, c.labels) -> c.value).toMap
    assert(streamed == oneShot,
      s"one-shot only: ${oneShot.toSet -- streamed.toSet}\n" +
        s"streamed only: ${streamed.toSet -- oneShot.toSet}")
  }
}
